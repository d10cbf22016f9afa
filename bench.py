"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing = full plan execution to a count-style action (results are
materialized but not shipped to the driver — we measure engine throughput,
not toPandas serialization). Caveat: under count() Catalyst may legally
eliminate row-preserving operators (q32/q163's unique-key left join + vote
aggregate collapse to the id scan) — fair for a count, but SCALE.md decade
rows for such ops use sum-forcing probes so the real compute is measured.

``python bench.py --pipeline`` instead times the end-to-end curation
pipeline (redact → C4/Gopher gates → cluster near-dup dedup →
decontaminate → gold parquet write) on the same documents table and
reports rows/s — comparable to the reference's marquee "50k records
LSH-deduped in 80 s" ≈ 625 rows/s single-node number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nahuatl_data_pipeline_spark import registry
from nahuatl_data_pipeline_spark.session import get_spark


def _md5_burn(seconds: float) -> tuple[int, float]:
    """Chained md5 of a 64-byte payload for ~``seconds``; returns
    (hashes, elapsed). Chaining (digest feeds the next hash) defeats any
    caching so the loop measures raw per-core hash throughput — the same
    workload SCALE.md round 11 used to quantify the co-tenant swing
    (36 vs 52 Mhash/s aggregate on identical work)."""
    import hashlib

    payload = b"calibration-probe-payload-64-bytes-of-deterministic-filler!!!!!"
    n = 0
    t0 = time.perf_counter()
    deadline = t0 + seconds
    while True:
        for _ in range(2048):
            payload = hashlib.md5(payload).digest() * 4
            n += 1
        now = time.perf_counter()
        if now >= deadline:
            return n, now - t0


def _calibration_probe(
    seconds: float | None = None, workers: int | None = None
) -> dict:
    """Host-throughput calibration (~2 s): single-thread + all-core md5
    Mhash/s, stamped into bench output so cross-round wall-clock
    comparisons can separate co-tenant host drift from engine
    regressions ARITHMETICALLY (three straight rounds lost forensic
    time to phantom regressions the guest cannot control but can
    measure — SCALE.md rounds 9-11). Disable with
    SPARK_GRAFT_CALIBRATE=0; duration via SPARK_GRAFT_CALIBRATE_SEC."""
    import multiprocessing as mp

    if seconds is None:
        seconds = float(os.environ.get("SPARK_GRAFT_CALIBRATE_SEC", "0.4"))
    if workers is None:
        workers = mp.cpu_count()
    n1, e1 = _md5_burn(seconds)
    # fork (linux default) keeps spawn cost out of the measured burst;
    # each worker times itself, so pool startup skew cannot deflate rates
    with mp.get_context("fork").Pool(workers) as pool:
        parts = pool.map(_md5_burn, [seconds] * workers)
    return {
        "mhash_1t": round(n1 / e1 / 1e6, 1),
        "mhash_allw": round(sum(n / e for n, e in parts) / 1e6, 1),
        "workers": workers,
    }


def _calibration_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_CALIBRATE", "1") != "0"


def _co_tenants() -> int:
    """Count OTHER engine-workload processes live on this guest (another
    bench.py, a pytest run, or a Spark JVM not belonging to this
    process). The md5 calibration bracket measures HOST-level drift but
    can miss a bursty guest-side co-tenant that happens to idle during
    the ~2 s probe windows — exactly what produced round 13's discarded
    2.5×-deviation bench (a stray concurrent bench on the same guest;
    SCALE.md round 13). A nonzero stamp says: discard this artifact and
    re-run quiet, no forensics needed.

    Own-process exclusions: this pid's /proc subtree (our SparkSession
    JVM, its pyspark.daemon workers) plus its individual ancestors (a
    `sh -c "python bench.py"` wrapper contains 'bench.py' in its
    cmdline). Siblings under a shared supervisor and reparented orphans
    stay visible — those ARE the strays."""
    return len(_co_tenant_pids())


def _proc_snapshot() -> tuple[dict[int, int], dict[int, str]]:
    """(pid→ppid, pid→cmdline) for every live process."""
    parent: dict[int, int] = {}
    cmds: dict[int, str] = {}
    try:
        pids = [int(d) for d in os.listdir("/proc") if d.isdigit()]
    except OSError:
        return parent, cmds
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as f:
                stat = f.read()
            parent[pid] = int(stat.rsplit(")", 1)[1].split()[1])
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmds[pid] = (
                    f.read().replace(b"\0", b" ").decode("utf-8", "replace")
                )
        except (OSError, ValueError, IndexError):
            continue
    return parent, cmds


def _co_tenant_pids(
    snapshot: tuple[dict[int, int], dict[int, str]] | None = None,
    me: int | None = None,
) -> set[int]:
    parent, cmds = _proc_snapshot() if snapshot is None else snapshot
    if me is None:
        me = os.getpid()
    # descendants of THIS process only: JVM, pyspark daemons, their
    # workers. Expanding from the ancestor set instead would absorb
    # every SIBLING subtree (another bench left running in a different
    # pane of the same tmux/shell supervisor — the exact stray this
    # probe exists to catch; self-review r13).
    own = {me}
    grew = True
    while grew:
        grew = False
        for pid, ppid in parent.items():
            if ppid in own and pid not in own:
                own.add(pid)
                grew = True
    # ancestors excluded individually (a `sh -c "python bench.py"`
    # wrapper matches the pattern), stopping before init so reparented
    # orphans stay visible
    p = parent.get(me)
    while p and p > 1 and p not in own and p in parent:
        own.add(p)
        p = parent.get(p)
    hits: set[int] = set()
    for pid, cmd in cmds.items():
        if pid in own or not cmd.strip():
            continue
        low = cmd.lower()
        if (
            "bench.py" in cmd
            or "pytest" in cmd
            or "pyspark.daemon" in cmd  # orphaned worker trees of a
            # dead foreign driver still burn cores
            or ("java" in low and "spark" in low)
        ):
            hits.add(pid)
    return hits


def _merge_calibration(start: dict | None, end: dict | None) -> dict | None:
    """{"mhash_1t": [start, end], "mhash_allw": [start, end], ...} — the
    bracket makes intra-run drift visible (a busy half-hour mid-sweep
    shows up as a start/end gap)."""
    if start is None and end is None:
        return None
    s, e = start or end, end or start
    return {
        "mhash_1t": [s["mhash_1t"], e["mhash_1t"]],
        "mhash_allw": [s["mhash_allw"], e["mhash_allw"]],
        "workers": s["workers"],
    }


def _load_bench(path: str) -> tuple[dict, float | None]:
    """(queries_map, mean all-core Mhash/s) from a bench artifact in ANY
    of its shapes: the full stdout JSON ({"queries": ..., "cal": [...]
    or "calibration": {...}}), or the driver's BENCH_rN.json wrapper,
    which keeps only the LAST 2000 chars of the stdout line as "tail" —
    query entries and the trailing "cal" stamp are regex-recovered from
    the fragment (head-truncated entries are simply absent)."""
    import re

    with open(path) as f:
        d = json.load(f)
    if "tail" in d and "queries" not in d:
        frag = d["tail"]
        queries = {
            k: float(v)
            for k, v in re.findall(r'"(q\d+)":([0-9]+(?:\.[0-9]+)?)', frag)
        }
        m = re.search(r'"cal":\[([0-9.,\-eE ]+)\]', frag)
        cal_vals = (
            [float(x) for x in m.group(1).split(",")] if m else None
        )
        mco = re.search(r'"co":\[(\d+),(\d+)\]', frag)
        co = [int(mco.group(1)), int(mco.group(2))] if mco else None
    else:
        queries = d.get("queries", {})
        cal_vals = d.get("cal")
        co = d.get("co")
    if co and any(co):
        print(
            f"WARNING: {path} recorded co-tenant engine processes "
            f"{co} — its walls are contaminated, prefer a quiet re-run",
            file=sys.stderr,
        )
    if cal_vals is not None and len(cal_vals) >= 4:
        mhash = (cal_vals[2] + cal_vals[3]) / 2
    elif isinstance(d.get("calibration"), dict):
        aw = d["calibration"]["mhash_allw"]
        mhash = sum(aw) / len(aw)
    else:
        mhash = None
    return queries, mhash


def _compare_benches(path_a: str, path_b: str) -> dict:
    """--compare PRIOR CURRENT: drift-normalized common-set ratio.

    raw_ratio   = Σ walls_B / Σ walls_A over common query keys;
    host_ratio  = B's md5 throughput / A's (mean of the all-core
                  start/end bracket) — < 1 means B ran on a slower
                  effective host;
    normalized_ratio = raw_ratio × host_ratio — the engine-attributable
    movement (equal engines on a 1.44×-slower host: raw 1.44 ×
    host 0.69 = 1.0). Requires calibration stamps in BOTH files for the
    normalized figure; otherwise only the raw ratio is reported."""
    qa, ma = _load_bench(path_a)
    qb, mb = _load_bench(path_b)
    common = sorted(
        k
        for k in qa
        if k in qb
        and isinstance(qa[k], (int, float))
        and isinstance(qb[k], (int, float))
        and qa[k] > 0
    )
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    out: dict = {
        "common_queries": len(common),
        "total_a": round(ta, 2),
        "total_b": round(tb, 2),
        "raw_ratio": round(tb / ta, 3) if ta else None,
        "top_deviations": {
            k: round(qb[k] / qa[k], 2)
            for k in sorted(
                common, key=lambda k: qb[k] / qa[k], reverse=True
            )[:5]
        },
    }
    if ma is not None and mb is not None and ta:
        out["host_ratio"] = round(mb / ma, 3)
        out["normalized_ratio"] = round((tb / ta) * (mb / ma), 3)
    return out


def _warm_ml_classes(spark) -> None:
    """One-time pyspark.ml class loading (MinHashLSH / BRP-LSH JARs +
    codegen), ~2-3 s of session setup that would otherwise land inside
    whichever LSH query happens to run first. Uses throwaway params
    (numFeatures=8) so operator-level model caches stay untouched —
    this warms the JVM, never the measured plans."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "id long, v array<double>"
    ).select("id", array_to_vector("v").alias("f"))
    for lsh in (
        MinHashLSH(inputCol="f", outputCol="h", numHashTables=1, seed=1),
        BucketedRandomProjectionLSH(
            inputCol="f", outputCol="h", bucketLength=1.0, numHashTables=1,
            seed=1,
        ),
    ):
        m = lsh.fit(tiny.withColumn("f", F.col("f")))
        m.approxSimilarityJoin(tiny, tiny, 10.0, distCol="d").count()


def pipeline_main() -> None:
    """Time run_curation_pipeline end-to-end on $SPARK_GRAFT_SF_DIR's
    documents table (eval split = doc_id % 97 == 0, the q61 convention)
    and print one JSON line with wall seconds + rows/s."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        run_curation_pipeline,
    )
    from nahuatl_data_pipeline_spark.schemas import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    cal_start = _calibration_probe() if _calibration_enabled() else None
    co_start = _co_tenants()
    spark = get_spark(app_name="nahuatl-bench-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # The synthetic documents lack terminal punctuation, so raw text
    # would fail C4's sentence rule for every row and the gold write
    # would be empty. Append a period (q62's planting convention) so the
    # bench exercises the realistic mixed keep/drop path end to end.
    base = load_table(spark, sf_dir, "documents")
    url_stages = os.environ.get("SPARK_GRAFT_PIPELINE_URL_STAGES") == "1"
    native_url = url_stages and "url" in base.columns
    keep_cols = [
        F.col("doc_id"),
        F.concat(F.col("text"), F.lit(".")).alias("text"),
    ] + ([F.col("url")] if native_url else [])
    docs = base.select(*keep_cols)
    # A mixed-realism replica (make_scale_data.py --mixed) carries its
    # own HELD-OUT evalset.parquet — eval disjoint from train by
    # construction, so decontamination measures real overlap instead of
    # marking the whole corpus contaminated (the clone-replica collapse,
    # SCALE.md round 10). Without one, fall back to the id-sliced split.
    eval_path = os.path.join(sf_dir, "evalset.parquet")
    if os.path.exists(eval_path):
        evalset = spark.read.parquet(eval_path).select(
            "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
        )
        train = docs
    else:
        evalset = docs.filter(F.col("doc_id") % 97 == 0)
        train = docs.filter(F.col("doc_id") % 97 != 0)

    # SPARK_GRAFT_PIPELINE_URL_STAGES=1 additionally exercises the
    # opt-in crawl head stages (encoding repair, URL dedup, per-domain
    # cap). A mixed replica built by make_scale_data.py --mixed carries
    # its own NATIVE url column (re-crawl clone families share canonical
    # URLs; unique docs get per-host pages with tracking/fragment
    # variants) — used as-is, with tools/predict_mixed_gates.py
    # --url-stages as the full-stack exact ground truth. Replicas
    # without one fall back to the legacy deterministic synthetic attach
    # (doc_id % 100 == 1 shares ONE canonical URL; everyone else a
    # unique page on host ex{doc_id % 499}.com), mirrored set-exactly by
    # tools/predict_url_stages.py. Cap 100 docs/domain either way.
    cfg = None
    if url_stages:
        from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
            CurationConfig,
        )

        if not native_url:
            d = F.col("doc_id")
            train = train.withColumn(
                "url",
                F.when(
                    d % 100 == 1, F.lit("https://dupsite.com/shared")
                ).otherwise(
                    F.concat(
                        F.lit("https://ex"),
                        (d % 499).cast("string"),
                        F.lit(".com/p/"),
                        d.cast("string"),
                    )
                ),
            )
        # SPARK_GRAFT_PIPELINE_PSL_FILE switches the per-domain cap key
        # from the literal-tuple url_domain to full-PSL url_domain_psl
        # (round-12 verdict #4); ground truth via
        # tools/predict_mixed_gates.py --url-stages --psl-file PATH.
        psl_file = os.environ.get("SPARK_GRAFT_PIPELINE_PSL_FILE")
        psl_rules = None
        if psl_file:
            from nahuatl_data_pipeline_spark.functions.url import (
                load_public_suffix_list,
            )

            psl_rules = load_public_suffix_list(psl_file)
        cfg = CurationConfig(
            fix_encoding=True, url_col="url", max_docs_per_domain=100,
            psl_rules=psl_rules,
        )
    n_input = train.count()  # also warms JVM + parquet footers

    out = tempfile.mkdtemp(prefix="bench_curation_")
    try:
        t0 = time.perf_counter()
        stats = run_curation_pipeline(
            spark, train, out, evalset=evalset, cfg=cfg
        )
        wall = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(out, ignore_errors=True)

    out = {
        "metric": "curation_pipeline_rows_per_sec",
        "value": round(n_input / wall, 1),
        "unit": "rows/sec",
        "wall_sec": wall,
        "input_rows": n_input,
        "stats": stats,
        "url_stages": url_stages,
        # from the EXECUTED config, not the env var: without
        # url_stages the PSL file is never read and no PSL cap ran,
        # so an env-only stamp would mislabel the artifact
        # (self-review r13)
        "psl": bool(cfg is not None and cfg.psl_rules is not None),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    co_end = _co_tenants()
    if co_start or co_end:
        out["co"] = [co_start, co_end]  # contaminated run — see main()
    cal = _merge_calibration(
        cal_start, _calibration_probe() if _calibration_enabled() else None
    )
    if cal is not None:
        out["calibration"] = cal
    # compact separators like main(): the driver keeps only the line's
    # last 2000 chars, and _load_bench's tail-regexes for "co"/"cal"
    # match the compact form only
    print(json.dumps(out, separators=(",", ":")))


# Query groups that each get a FRESH JVM (subprocess) in --isolate
# mode. Measured at the 100× decade (SCALE.md round 9): after ~2,100
# stages of prior work the shared local JVM OOMs spill read-ahead
# threads inside the pair family (and q31's pyspark.ml LSH UDF outright)
# even following a full cache release — while every member passes at
# the same 8 GiB heap in a fresh session. A subprocess per FAMILY GROUP
# is the honest local model of how a cluster runs these: one Spark
# application per job, each with its own executor heaps — and grouping
# keeps the build-once pair-table sharing (q38→q97, q58→q145) inside
# each JVM, so the measured sharing win is preserved. The optional env
# map is per-job resource sizing (what a cluster scheduler does); the
# env value never LOWERS an explicitly-set SPARK_DRIVER_MEMORY.
# q31's round-9 16 GiB sizing was removed in round 10: pruning the LSH
# cache to (id, features) — text and the shingle array never reach the
# cache — restored the 8 GiB posture on BOTH 100× replica flavors
# (unique 211.7 s / clone 432.4 s at a fresh 8 GiB heap, zero OOM —
# SCALE.md round 10).
_FRESH_JVM_GROUPS = [
    (["q38", "q97"], {}),
    # q58's dense-clone pair graph (~23M pairs) is marginal at 8 GiB —
    # passes standalone, OOMs under sweep-adjacent page-cache pressure
    # (measured both ways, round 9)
    (["q58", "q145"], {"SPARK_DRIVER_MEMORY": "16g"}),
    (["q25"], {}),
    (["q157"], {}),
    (["q106"], {}),
    (["q108"], {}),
    (["q31"], {}),
]


# The exact-dedup-first contract (SCALE.md round 8): a ~90 %-duplicate
# corpus (the dense 100×-clone replica) runs exact dedup BEFORE the
# quadratic-in-duplicates pair family — these queries' 100×-clone cells
# are measured on the deduped corpus, everything else on the original.
_DEDUP_FIRST_KEYS = {"q106", "q108"}


def _prepare_dedup(sf_dir: str, out_dir: str) -> None:
    """--prepare-dedup <out_dir>: materialize the exact-dedup-first
    corpus — q10's keep-best window dedup (normalized-text key, longest
    text wins, doc_id tiebreak) over ``documents``, written as parquet
    to ``out_dir``; every other table is symlinked from ``sf_dir`` so
    the result is a drop-in SPARK_GRAFT_SF_DIR. Runs in its own
    subprocess JVM under --isolate --dedup-first (a cluster schedules
    the dedup job and the pair jobs as separate applications). Prints
    one JSON line {"dedup_prepare": wall, "rows_in": n, "rows_out": m}.
    """
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.functions.normalize import dedup_key
    from nahuatl_data_pipeline_spark.operators.dedup import exact_dedup
    from nahuatl_data_pipeline_spark.schemas import TESTDATA_TABLES, load_table

    spark = get_spark(app_name="nahuatl-bench-dedup-prepare")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    n_in = docs.count()
    deduped = exact_dedup(
        docs,
        [dedup_key("text")],
        order_by=[F.desc("n_chars")],
        tiebreak=["doc_id"],
    )
    dst = os.path.join(out_dir, "documents.parquet")
    deduped.write.mode("overwrite").parquet(dst)
    n_out = spark.read.parquet(dst).count()
    wall = round(time.perf_counter() - t0, 2)
    for t in TESTDATA_TABLES:
        if t == "documents":
            continue
        link = os.path.join(out_dir, f"{t}.parquet")
        src = os.path.realpath(os.path.join(sf_dir, f"{t}.parquet"))
        if not os.path.exists(link):
            os.symlink(src, link)
    print(
        json.dumps(
            {"dedup_prepare": wall, "rows_in": n_in, "rows_out": n_out}
        ),
        flush=True,
    )


def _median(walls: list[float]) -> float:
    """Median of the observed walls (lower-middle for even N — the
    damped estimate should not average in an outlier)."""
    s = sorted(walls)
    return s[(len(s) - 1) // 2]


def _time_query_walls(fn, spark, sf_dir: str, repeat: int) -> list[float]:
    """Wall seconds of ``repeat`` full plan executions (build + count
    each time)."""
    walls = []
    for _ in range(max(1, repeat)):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()  # force full plan; 0 rows is legal
        walls.append(time.perf_counter() - t0)
    return walls


def _time_query(fn, spark, sf_dir: str, repeat: int) -> float:
    """Wall seconds for one query, median of ``repeat`` full plan
    executions. Medians damp the cold-plan / machine-load drift that
    made round-over-round driver benches compare compilation luck
    instead of plans (BENCH_r08→r09 showed a uniform ~1.2× phantom
    shift that solo re-runs disproved)."""
    return round(_median(_time_query_walls(fn, spark, sf_dir, repeat)), 2)


def _parse_timings_map(stdout: str):
    """Extract the timings JSON map from a --single subprocess's stdout.
    The map may not be the LAST line (JVM gc warnings also reach
    stdout), and stray parseable tokens (a bare number, 'null') must
    not shadow it — only a non-empty dict counts."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and parsed:
            return parsed
    return None


def _run_single(spec: str, sf_dir: str, repeat: int = 1) -> None:
    """--single <prefix>[,<prefix>...]: run the named queries in order
    in this (fresh) process and print one JSON timing map. Used by
    --isolate via subprocess; order within the group preserves the
    pair-table build→reuse sequence. With repeat > 1, a ``__bands__``
    entry carries each query's [min, max] wall so decade rows get a
    variance band by construction (the q108 ±40% lesson — single-shot
    decade numbers read as points when they are bands); the main map
    values stay the medians, schema-unchanged."""
    cal_start = _calibration_probe() if _calibration_enabled() else None
    spark = get_spark(app_name=f"nahuatl-bench-{spec}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    by_prefix = {n.split("_")[0]: n for n in qs}
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    _warm_ml_classes(spark)
    timings = {}
    bands = {}
    for key in spec.split(","):
        walls = _time_query_walls(qs[by_prefix[key]], spark, sf_dir, repeat)
        timings[key] = round(_median(walls), 2)
        if repeat > 1:
            bands[key] = [round(min(walls), 2), round(max(walls), 2)]
    if bands:
        timings["__bands__"] = bands
    cal = _merge_calibration(
        cal_start, _calibration_probe() if _calibration_enabled() else None
    )
    if cal is not None:
        timings["__calibration__"] = cal  # per-group host bracket
    print(json.dumps(timings), flush=True)


def _release_all_state(spark) -> None:
    """Drop every cross-query cache so the next family starts from a
    cold JVM (the local-mode stand-in for per-job executor heaps on a
    real cluster): module-level persisted frames (pair tables, tf-idf
    postings, similarity/linkage indexes), the SQL cache, Python refs
    (so ContextCleaner can collect localCheckpoint RDDs), and any
    still-persisted orphan RDDs."""
    import gc

    from nahuatl_data_pipeline_spark.operators import (
        fuzzy_dedup,
        linkage,
        similarity,
        tfidf,
    )

    fuzzy_dedup.release_pair_tables()
    fuzzy_dedup.release_fuzzy_caches()
    tfidf.release_tfidf_caches()
    similarity.release_similarity_caches()
    linkage.release_linkage_caches()
    spark.catalog.clearCache()
    gc.collect()  # drop py4j refs → ContextCleaner may now unpersist
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in jmap.values().toArray():
            rdd.unpersist()
    except Exception:
        pass  # JVM-API shape drift must never fail a bench run


def _spawn_group(
    spec: str, group_env: dict[str, str], sf_dir: str, repeat: int = 1
):
    """Run one fresh-JVM isolate group (``--single`` subprocess) and
    return ``(timings_map | None, error_string | None)``. The env
    override (per-job heap sizing) never LOWERS an explicitly-set
    SPARK_DRIVER_MEMORY. Factored out of main() so the pytest smoke
    exercises the exact env-merge / rc / stdout-parse plumbing the
    100× sweeps rely on."""
    import subprocess

    env = dict(os.environ)
    env.update({k: v for k, v in group_env.items() if k not in os.environ})
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    res = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--single", spec, "--repeat", str(repeat),
        ],
        env=env,
        capture_output=True,
        text=True,
    )
    parsed = _parse_timings_map(res.stdout)
    if parsed is not None:
        return parsed, None
    tail = res.stderr.strip().splitlines()[-3:]
    return None, (f"subprocess rc={res.returncode}: " + " | ".join(tail))[:400]


def _int_after(argv: list[str], flag: str, default: int) -> int:
    """Value of ``flag N`` in argv, clamped ≥ 1 — with a usage message
    instead of a bare IndexError/ValueError traceback when the value is
    missing or not an integer (an expensive decade sweep should die
    with a diagnosis, not an argv stack trace)."""
    if flag not in argv:
        return default
    i = argv.index(flag)
    if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
        raise SystemExit(f"usage: {flag} N (got: {argv[i + 1:i + 2] or 'nothing'})")
    return max(1, int(argv[i + 1]))


def _repeat_arg(argv: list[str], default: int) -> int:
    """--repeat N (or SPARK_GRAFT_REPEAT) → per-query executions; the
    reported wall is the median. Default 3 for the plain sf0.1 sweep
    the driver records (damped round-over-round comparisons), 1 in
    isolate mode (the 100× decade is too expensive to triple)."""
    if "--repeat" in argv:
        return _int_after(argv, "--repeat", default)
    env = os.environ.get("SPARK_GRAFT_REPEAT", "")
    return max(1, int(env)) if env.isdigit() else default


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    cal_start = _calibration_probe() if _calibration_enabled() else None
    co_start = _co_tenants()
    isolate = "--isolate" in sys.argv[1:]
    repeat = _repeat_arg(sys.argv[1:], default=1 if isolate else 3)
    # --repeat-heavy N: repeats for the fresh-JVM family groups only
    # (isolate mode's expensive decades). Default = --repeat, so plain
    # runs are unchanged; N=2 buys a [min,max] band per heavy query for
    # one extra execution — SCALE.md decade rows are bands, not points.
    argv = sys.argv[1:]
    repeat_heavy = _int_after(argv, "--repeat-heavy", repeat)
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_SKIP", "").split(",") if s
    }
    spark = get_spark(app_name="nahuatl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    _warm_ml_classes(spark)

    order = sorted(qs)
    fresh = (
        {k for g, _ in _FRESH_JVM_GROUPS for k in g} if isolate else set()
    )
    if isolate:
        order = [n for n in order if n.split("_")[0] not in fresh]
    skipped = []
    errors: dict[str, str] = {}
    bands: dict[str, list[float]] = {}
    cal_groups: dict[str, dict] = {}
    for name in order:
        key = name.split("_")[0]
        if key in skip:
            skipped.append(key)
            continue
        fn = qs[name]
        try:
            # Key by the qNN prefix and round to 2 decimals:
            # BENCH_r05.json proved the driver keeps only the TAIL of
            # this line, so the whole map must fit — ~1 KB with short
            # keys vs ~3 KB with full names. Registry names are
            # `qNN_<slug>`, so the prefix is a unique, stable key.
            timings[key] = _time_query(fn, spark, sf_dir, repeat)
        except Exception as exc:  # noqa: BLE001
            if not isolate:
                raise  # default mode keeps fail-fast driver semantics
            errors[key] = type(exc).__name__
            continue

    dedup_first = "--dedup-first" in sys.argv[1:]
    dedup_stats = None
    if isolate:
        # Drop the light phase's cross-query caches BEFORE spawning the
        # heavy-family JVMs: the parent otherwise sits on a full 8 GiB
        # heap of pair tables / persisted frames while 16 GiB subprocess
        # JVMs run beside it — the page-cache-pressure mode SCALE.md
        # round 9 measured for q58.
        _release_all_state(spark)

        dedup_dir = None
        if dedup_first:
            # Execute the exact-dedup-first contract instead of merely
            # excluding its queries: one fresh JVM runs q10's keep-best
            # dedup and materializes the corpus, then the pair-family
            # groups in _DEDUP_FIRST_KEYS run against it.
            import subprocess

            out_dir = f"/tmp/{os.path.basename(sf_dir.rstrip('/'))}_dedup"
            env = dict(os.environ)
            env["SPARK_GRAFT_SF_DIR"] = sf_dir
            res = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--prepare-dedup", out_dir,
                ],
                env=env,
                capture_output=True,
                text=True,
            )
            dedup_stats = _parse_timings_map(res.stdout)
            if dedup_stats is not None:
                timings["dedup_prepare"] = dedup_stats["dedup_prepare"]
                dedup_dir = out_dir
            else:
                tail = res.stderr.strip().splitlines()[-3:]
                errors["dedup_prepare"] = (
                    f"subprocess rc={res.returncode}: " + " | ".join(tail)
                )[:400]

        for group, group_env in _FRESH_JVM_GROUPS:
            members = [k for k in group if k not in skip]
            skipped += [k for k in group if k in skip]
            if not members:
                continue
            spec = ",".join(members)
            group_dir = sf_dir
            if dedup_first and set(members) <= _DEDUP_FIRST_KEYS:
                if dedup_dir is None:
                    errors[spec] = "dedup_prepare failed; contract group skipped"
                    continue
                group_dir = dedup_dir
            parsed, err = _spawn_group(
                spec, group_env, group_dir, repeat_heavy
            )
            if parsed is not None:
                bands.update(parsed.pop("__bands__", {}))
                group_cal = parsed.pop("__calibration__", None)
                if group_cal is not None:
                    cal_groups[spec] = group_cal
                timings.update(parsed)
            else:
                errors[spec] = err

    total = round(sum(timings.values()), 3)
    out = {
        "queries": timings,
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if repeat > 1:
        out["repeat"] = repeat  # per-query walls are medians of N runs
    if isolate:
        out["mode"] = "isolate"
    if dedup_stats is not None:
        out["dedup_first"] = dedup_stats  # contract stage: wall + rows in/out
    if bands:
        out["bands"] = bands  # [min, max] walls for --repeat-heavy queries
    if cal_groups:
        out["cal_groups"] = cal_groups  # per-fresh-JVM-group host brackets
    if skipped:
        out["skipped"] = skipped
    if errors:
        out["errors"] = errors
    co_end = _co_tenants()
    if co_start or co_end:
        # nonzero ⇒ another bench/pytest/Spark JVM shared the guest
        # during this run: the walls are contaminated, re-run quiet
        # (sits just before "cal" so the driver's 2000-char tail keeps
        # both stamps)
        out["co"] = [co_start, co_end]
    cal = _merge_calibration(
        cal_start, _calibration_probe() if _calibration_enabled() else None
    )
    if cal is not None:
        # COMPACT form, and the LAST key on purpose — the driver records
        # only the LAST 2000 chars of this line, so the ~35-char stamp
        # must sit at the tail or isolate-mode bands/cal_groups push it
        # out of the record (self-review r12):
        # [mhash_1t_start, mhash_1t_end, mhash_allw_start, mhash_allw_end,
        #  workers], md5 Mhash/s (see _calibration_probe)
        out["cal"] = [
            cal["mhash_1t"][0],
            cal["mhash_1t"][1],
            cal["mhash_allw"][0],
            cal["mhash_allw"][1],
            cal["workers"],
        ]
    print(json.dumps(out, separators=(",", ":")))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--compare" in argv:
        i = argv.index("--compare")
        try:
            prior, current = argv[i + 1], argv[i + 2]
        except IndexError:
            raise SystemExit("usage: bench.py --compare PRIOR.json CURRENT.json")
        print(json.dumps(_compare_benches(prior, current), separators=(",", ":")))
    elif "--pipeline" in argv:
        pipeline_main()
    elif "--prepare-dedup" in argv:
        _prepare_dedup(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            argv[argv.index("--prepare-dedup") + 1],
        )
    elif "--single" in argv:
        _run_single(
            argv[argv.index("--single") + 1],
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            repeat=_repeat_arg(argv, default=1),
        )
    else:
        main()
