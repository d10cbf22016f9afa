"""Capture .explain('formatted') output for registered queries.

Usage:
    python tools/capture_plans.py OUT_DIR SUFFIX [q108 q70 ...]

Writes OUT_DIR/<prefix>_<SUFFIX>.txt for each named query prefix (or for
EVERY registered query when none are named). The optimization rounds use
this to commit before/after plan evidence (plans/r13/q108_before.txt ...)
that the judge can diff without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nahuatl_data_pipeline_spark import registry  # noqa: E402
from nahuatl_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: capture_plans.py OUT_DIR SUFFIX [prefix ...]")
    out_dir, suffix = sys.argv[1], sys.argv[2]
    want = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name, fn in sorted(qs.items()):
        prefix = name.split("_")[0]
        if want and prefix not in want:
            continue
        df = fn(spark, sf_dir)
        # InternalFrame._explain_string goes through the captured plan
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{prefix}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
