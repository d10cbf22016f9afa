#!/usr/bin/env python
"""Execute every registered query with codegen fallback DISABLED.

Whole-stage codegen failures are silent by design: janino logs one
ERROR and Spark re-plans the stage interpreted — correct answers,
quietly slower, and invisible to the plan sweep (compilation happens at
execution, not planning). Round 13 found q128 generating >16k lines of
Java (64 KB method limit) this way, only because a full-corpus parity
sweep happened to scroll the driver log.

This sweep makes that class of regression loud: it runs every
registered query at sf0.001 with

- ``spark.sql.codegen.fallback=false`` — a whole-stage compile failure
  raises instead of silently re-planning interpreted;
- ``spark.sql.codegen.factoryMode=CODEGEN_ONLY`` — expression-level
  codegen failures raise too (the default FALLBACK hides them).

and reports the queries that threw. ``.collect()`` (not ``.count()``)
so column pruning cannot skip the expensive expressions — q128's
blowout was invisible under count() because the pruned plan never
compiled the hash draws.

Usage: python tools/codegen_strict_sweep.py [SF_DIR]
Exit 0 iff every query executes under strict codegen.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from nahuatl_data_pipeline_spark import registry
from nahuatl_data_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="nahuatl-codegen-strict")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")

    failures: dict[str, str] = {}
    t0 = time.time()
    qs = registry.queries()
    for name in sorted(qs):
        try:
            qs[name](spark, sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"STRICT-CODEGEN FAIL {name}: {failures[name]}",
                  flush=True)
    print(
        f"strict-codegen sweep: {len(qs) - len(failures)}/{len(qs)} queries "
        f"clean in {time.time() - t0:.0f}s ({sf_dir})"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
