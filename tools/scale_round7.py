"""Third-decade probe for the round-7 additions (q138-q145): wall
seconds + output rows per query, one JSON line each, flushed so a
killed run keeps its rows. Same protocol as tools/scale_round6.py.

q145 repeats q58's pair machinery; on the CLONE replica its clusters
are 100-wide by construction (the q58 100x record already covers that
regime), so probe it on the unique-text corpus (/tmp/scale_sf10u) where
cluster sizes match production — pass it separately:

Usage:
  python tools/scale_round7.py /tmp/scale_sf10 q138 q139 q140 q141 q142 q143 q144
  python tools/scale_round7.py /tmp/scale_sf10u q145
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
    "q138_dsir_importance",
    "q139_margin_topk",
    "q140_semantic_dedup",
    "q141_perplexity_buckets",
    "q142_tokenizer_fertility",
    "q143_nation_trade_pagerank",
    "q144_zipf_alpha",
    "q146_token_window_chunks",
    "q147_water_fill_budget",
    "q148_length_matched_resample",
    "q149_embedding_covariance",
    "q150_vocab_oov_audit",
    "q151_embedding_outliers",
    "q152_span_corruption",
    "q153_boilerplate_prefix",
    "q154_code_switching",
    "q155_sharded_covariance_merge",
    "q156_join_key_skew",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    wanted = sys.argv[2:] or None
    spark = get_spark(app_name="nahuatl-scale-round7")
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
