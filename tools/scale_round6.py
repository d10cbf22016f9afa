"""Third-decade (100×) probe for the heavier round-6 additions the
round-6 verdict flagged (q106 containment, q108 tf-idf cosine pairs,
q128 bootstrap CI, q133 substring-span dedup) — same protocol as
tools/scale_pair_family.py: wall seconds + output rows per query, one
JSON line each, flushed so a killed run keeps its rows.

Usage: python tools/scale_round6.py /tmp/scale_sf10 [q106 q108 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nahuatl_data_pipeline_spark import registry
from nahuatl_data_pipeline_spark.operators import fuzzy_dedup
from nahuatl_data_pipeline_spark.session import get_spark

DEFAULT = [
    "q106_containment_pairs",
    "q108_tfidf_cosine_pairs",
    "q128_bootstrap_mean_ci",
    "q133_substring_dedup",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    wanted = sys.argv[2:] or None
    spark = get_spark(app_name="nahuatl-scale-round6")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [
        n
        for n in qs
        if (wanted and any(n.startswith(w) for w in wanted))
        or (not wanted and n in DEFAULT)
    ]
    for name in names:
        fuzzy_dedup.LAST_STATS.clear()
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        rec = {
            "q": name,
            "wall_sec": round(time.perf_counter() - t0, 1),
            "out_rows": n,
            "sf_dir": sf_dir,
        }
        rec.update(fuzzy_dedup.LAST_STATS)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
