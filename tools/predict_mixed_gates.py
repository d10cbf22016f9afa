"""Predict the mixed-replica curation-gate counts from a ONE-replica
probe (round-10 verdict #2: the scale run must have per-gate drop
counts that match planted ground truth — this computes that ground
truth, independently of the scale run itself).

Why one replica suffices (see make_scale_data.py's mixed-mode
docstring): every per-doc gate outcome is replica-invariant by
construction, the two flavors share no shingle (so the pair graph
never crosses flavors and the pipeline is exactly additive over flavor
subsets), cross-replica pairs exist ONLY inside clone families, and
``duplicate_clusters``' canonical is the min-id member — which in the
mixed corpus is always the replica-0 copy of the probe component's
min-id doc, i.e. a doc with the probe canonical's exact flags.

Per-gate predictions at factor f, from probe-subset pipeline stats
(u = unique flavor, c = clone flavor, both run against the HELD-OUT
evalset with the same "." append bench.py --pipeline uses):

    input       = f·(n_u + n_c)
    failed_c4   = f·(c4_u + c4_c)          (per-doc, replica-invariant)
    failed_rep  = f·(rep_u + rep_c)
    contaminated= f·(ct_u + ct_c)          (eval overlap is 1x-internal)
    near_dups   = f·nd_u + f·n_c − (n_c − nd_c)
                  [unique: per-replica graphs are isomorphic to the
                   probe's; clone: each probe component becomes ONE
                   f·size family — drops = f·n_c − comp_c]
    output      = f·out_u + out_c          (clone families collapse to
                   one canonical TOTAL, not one per replica)

Usage:
    python tools/predict_mixed_gates.py SRC_SF01 FACTOR
prints one JSON line {"factor": f, "probe": {...}, "predicted": {...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from make_scale_data import (
    CLONE_MOD,
    OFFSET,
    mixed_doc_select,
    mixed_eval_select,
)


def main(src: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        run_curation_pipeline,
    )
    from nahuatl_data_pipeline_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="mixed_probe_")
    con = duckdb.connect()
    # probe replica i=1: any single replica has the same gate outcomes
    con.sql(
        f"COPY ({mixed_doc_select(src, 1)}) "
        f"TO '{tmp}/probe.parquet' (FORMAT parquet)"
    )
    con.sql(
        f"COPY ({mixed_eval_select(src)}) "
        f"TO '{tmp}/evalset.parquet' (FORMAT parquet)"
    )

    spark = get_spark(app_name="nahuatl-predict-mixed")
    spark.sparkContext.setLogLevel("ERROR")
    dot = lambda df: df.select(
        "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
    )
    probe = dot(spark.read.parquet(f"{tmp}/probe.parquet"))
    evalset = dot(spark.read.parquet(f"{tmp}/evalset.parquet"))
    # flavor split survives the id shift: OFFSET % CLONE_MOD == 0
    assert OFFSET % CLONE_MOD == 0
    is_clone = F.col("doc_id") % CLONE_MOD == 0

    stats = {}
    for flavor, subset in (
        ("u", probe.filter(~is_clone)),
        ("c", probe.filter(is_clone)),
    ):
        out_dir = os.path.join(tmp, f"gold_{flavor}")
        stats[flavor] = run_curation_pipeline(
            spark, subset, out_dir, evalset=evalset
        )
    shutil.rmtree(tmp, ignore_errors=True)

    u, c = stats["u"], stats["c"]
    f_ = factor
    predicted = {
        "input": f_ * (u["input"] + c["input"]),
        "failed_c4": f_ * (u["failed_c4"] + c["failed_c4"]),
        "failed_repetition": f_
        * (u["failed_repetition"] + c["failed_repetition"]),
        "contaminated": f_ * (u["contaminated"] + c["contaminated"]),
        "near_dups": f_ * u["near_dups"]
        + f_ * c["input"]
        - (c["input"] - c["near_dups"]),
        "output": f_ * u["output"] + c["output"],
    }
    print(
        json.dumps(
            {"factor": f_, "probe": stats, "predicted": predicted},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
    )
