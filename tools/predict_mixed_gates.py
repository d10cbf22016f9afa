"""EXACT ground truth for the mixed-replica curation-gate counts
(round-10 verdict #2, upgraded per round-11 verdict #2: every cell is
now exact — including near_dups and output, whose banded-minhash
collisions are deterministic md5 functions of the replica bytes and are
ENUMERATED here instead of modeled with the 1−(1−J²)³ recall curve).

Two independent ingredients, composed in plain Python:

1. **Per-source-doc gate flags** (replica-invariant by construction —
   the unique flavor's ``x{i}`` token suffix preserves word counts and
   within-doc token/bigram relative frequencies exactly; the clone
   flavor is byte-identical): one Spark run of the three gate operators
   (``c4_rule_flags``, ``repetition_signals``, ``contamination_flags``
   at the pipeline's config) over probe replica 1, collected per doc
   (≈5k bounded rows).

2. **The exact near-dup pair graph of the FULL factor-f corpus**,
   enumerated by DuckDB through ``banded_pairs_oracle_sql`` — the ONE
   definition of the banded candidate scheme (CLAUDE.md rule; the same
   CTE chain the q25/q38/q58 oracles hash-certify against the engine's
   ``ngram_jaccard_pairs``) at the pipeline's parameters (shingle_n=3,
   6 hashes × 2-per-band, threshold 0.8), then union-find + min-id
   canonicals in Python (``duplicate_clusters``' contract). Cross-
   replica/cross-flavor band-key coincidences are harmless: their
   exact-Jaccard verify is 0 < 0.8; byte-identical clone copies collide
   with probability 1 (equal signatures), which is exactly the family
   gluing the pipeline performs.

PII-redaction preamble: the pipeline shingles REDACTED text, but the
mixed corpus provably contains no redactable span (emails need ``@``,
phones need ``+``, IPv4 needs dotted quads; texts are lowercase word
tokens + ``x{i}`` suffixes + one trailing ``.``) — asserted below over
the full corpus, so raw text feeds the pair enumeration.

Usage:
    python tools/predict_mixed_gates.py SRC_SF01 FACTOR [--url-stages]
        [--psl-file PATH]
prints one JSON line {"factor": f, "exact": true, "predicted": {...}};
every ``predicted`` value is exact, no bands. ``--url-stages`` predicts
the SPARK_GRAFT_PIPELINE_URL_STAGES=1 configuration: the URL-dedup +
domain-cap survivor set is enumerated first (the replica's NATIVE url
column) and every content gate is predicted over it. ``--psl-file``
(with --url-stages) predicts the SPARK_GRAFT_PIPELINE_PSL_FILE
configuration — the per-domain cap keyed by ``url_domain_psl`` instead
of the literal tuple — after verifying the file satisfies
``assert_psl_closed_form`` (round-12 verdict #4).
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

from make_scale_data import CLONE_MOD, OFFSET, mixed_doc_select, mixed_eval_select

# The pipeline's CurationConfig defaults (plans/curation_pipeline.py) —
# restated here because the predictor must pin the config it predicts.
MIN_WORDS = 20
MAX_TOP_BIGRAM_FRAC = 0.18
MAX_TOP_TOKEN_FRAC = 0.30
JACCARD_THRESHOLD = 0.8
NUM_HASHES = 6
BAND_SIZE = 2
DECONTAM_N = 13

_PII_PATTERNS = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}(?:[ -][0-9]{2,4})?",
    r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b",
)


def _mixed_corpus_sql(src: str, factor: int, with_url: bool = False) -> str:
    """(doc_id, text[, url]) of the full factor-f mixed corpus with the
    same '.' append bench.py --pipeline applies before curating."""
    u = ", url" if with_url else ""
    union = " UNION ALL ".join(
        f"SELECT doc_id, text{u} FROM ({mixed_doc_select(src, i)})"
        for i in range(factor)
    )
    return f"SELECT doc_id, text || '.' AS text{u} FROM ({union})"


def assert_psl_closed_form(rules: dict[str, list[str]]) -> None:
    """Precondition for using ``mixed_domain_sql(psl=True)`` as the
    exact domain formula under an ARBITRARY ``--psl-file``: the file
    must resolve the three planted host families exactly as the closed
    form says — ``com`` and ``blogspot.co.uk`` present as exact rules,
    and no other rule that could match a planted host and change its
    suffix (a ``*.com``/``*.blogspot.co.uk`` wildcard, or an exact/
    exception rule naming a planted host). Anything else in the file is
    irrelevant to these hosts by the longest-match algorithm. The real
    publicsuffix.org file and the committed snapshot both pass."""
    import re

    exact = set(rules.get("exact", []))
    wild = set(rules.get("wildcard", []))
    exc = set(rules.get("exception", []))
    assert "com" in exact, "psl file lacks the 'com' rule"
    assert "blogspot.co.uk" in exact, (
        "psl file lacks the 'blogspot.co.uk' private-domain rule"
    )
    assert "com" not in wild and "blogspot.co.uk" not in wild, (
        "a *.com / *.blogspot.co.uk wildcard would change planted suffixes"
    )
    # An EXCEPTION rule on any parent suffix of a planted host re-
    # resolves it (exception wins outright; suffix becomes the rule
    # minus its leftmost label): '!com' makes every *.com host's
    # registrable domain 'com', '!blogspot.co.uk' folds all blogs into
    # one 'blogspot.co.uk' domain, '!co.uk'/'!uk' likewise
    # (self-review r13 — previously only host-shaped exceptions were
    # rejected). Equal-length wildcards like '*.co.uk' are fine: they
    # resolve to the same suffix as the exact rule they tie with.
    bad_exc = exc & {"com", "uk", "co.uk", "blogspot.co.uk"}
    assert not bad_exc, (
        f"psl exception rules on planted parent suffixes: {sorted(bad_exc)}"
    )
    host_pat = re.compile(
        r"(clone[0-9]+\.com|ex[0-9]+\.com|blog[0-9]+\.blogspot\.co\.uk)$"
    )
    bad = [r for r in exact | wild | exc if host_pat.fullmatch(r)]
    assert not bad, f"psl rules name planted hosts: {bad[:5]}"


def validated_psl_rules(psl_file: str) -> dict[str, list[str]]:
    """Load + closed-form-validate a PSL file — the ONE definition both
    predictor CLIs (this module and predict_url_stages.py) go through
    before trusting the closed-form domain formula."""
    from nahuatl_data_pipeline_spark.functions.url import (
        load_public_suffix_list,
    )

    rules = load_public_suffix_list(psl_file)
    assert_psl_closed_form(rules)
    return rules


def pop_psl_arg(argv: list[str]) -> tuple[list[str], str | None]:
    """Split ``--psl-file PATH`` out of an argv list (shared by both
    predictor CLIs)."""
    if "--psl-file" not in argv:
        return list(argv), None
    i = argv.index("--psl-file")
    if i + 1 >= len(argv):
        raise SystemExit("--psl-file requires a PATH argument")
    return argv[:i] + argv[i + 2:], argv[i + 1]


def _url_stage_survivors(
    con: duckdb.DuckDBPyConnection, src: str, factor: int, cap: int,
    psl: bool = False,
) -> tuple[set[int], int, int]:
    """(survivor doc_ids, url_dups, domain_capped) of the URL head
    stages, enumerated exactly as the pipeline's two windows compute
    them: URL-dedup keeps rank 1 per canonical ordered by (raw url ASC,
    doc_id ASC); the per-domain cap keeps the first ``cap`` survivors
    per registered domain ordered by (md5('42:' || url) ASC, url ASC,
    doc_id ASC) — ``seeded_md5``'s exact expression. Canonical/domain
    come from the shared mixed_canonical_sql/mixed_domain_sql formulas
    (engine-asserted in test_make_scale_data.py)."""
    from make_scale_data import mixed_canonical_sql, mixed_domain_sql

    base = _mixed_corpus_sql(src, factor, with_url=True)
    rows = con.sql(
        f"""
        WITH c AS (
          SELECT doc_id, url,
                 {mixed_canonical_sql()} AS canon,
                 {mixed_domain_sql(psl=psl)} AS dom
          FROM ({base})
        ),
        d AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY canon ORDER BY url ASC, doc_id ASC) AS rn
          FROM c
        ),
        s AS (SELECT doc_id, url, dom FROM d WHERE rn = 1),
        e AS (
          SELECT doc_id, ROW_NUMBER() OVER (
            PARTITION BY dom
            ORDER BY MD5('42:' || url) ASC, url ASC, doc_id ASC) AS rn2
          FROM s
        )
        SELECT (SELECT COUNT(*) FROM c),
               (SELECT COUNT(*) FROM s),
               (SELECT LIST(doc_id) FROM e WHERE rn2 <= {cap})
        """
    ).fetchone()
    total, after_dedup, survivor_list = rows
    survivors = set(survivor_list or [])
    return survivors, int(total - after_dedup), int(after_dedup - len(survivors))


def _exact_dup_sets(
    con: duckdb.DuckDBPyConnection,
    src: str,
    factor: int,
    survivors: set[int] | None = None,
) -> tuple[set[int], set[int]]:
    """(non_canonical_doc_ids, all_clustered_doc_ids) of the mixed
    corpus (restricted to the URL-stage ``survivors`` when given —
    the pipeline runs content dedup AFTER the head stages) — DuckDB
    enumerates the banded pairs, Python union-find assigns min-id
    canonicals (duplicate_clusters' contract)."""
    from nahuatl_data_pipeline_spark.registry import banded_pairs_oracle_sql

    base = _mixed_corpus_sql(src, factor)
    if survivors is not None:
        import pyarrow as pa

        con.sql("DROP TABLE IF EXISTS __survivors")
        con.register(
            "__surv_arrow",
            pa.table({"doc_id": pa.array(sorted(survivors), pa.int64())}),
        )
        con.sql(
            "CREATE TEMP TABLE __survivors AS SELECT * FROM __surv_arrow"
        )
        base = (
            f"SELECT t.doc_id, t.text FROM ({base}) t "
            f"JOIN __survivors USING (doc_id)"
        )
    # Identity asserts (module docstring): the pipeline shingles
    # REDACTED text, and the predicted configurations run
    # fix_encoding=True — both transforms must be identity here.
    # Redaction: zero redactable spans. Encoding repair + invisible
    # strip: every trigger (mojibake markers, invisible codepoints,
    # NBSP) is non-ASCII, so pure-ASCII text is untouched by
    # construction.
    pii_or = " OR ".join(
        f"REGEXP_MATCHES(text, '{p}')" for p in _PII_PATTERNS
    )
    n_pii, n_nonascii = con.sql(
        f"SELECT COUNT(*) FILTER ({pii_or}), "
        f"COUNT(*) FILTER (REGEXP_MATCHES(text, '[^\\x00-\\x7F]')) "
        f"FROM ({base})"
    ).fetchone()
    assert n_pii == 0, (
        f"{n_pii} docs carry redactable spans; pair enumeration must run "
        "on redacted text — pipe the corpus through redact_pii first"
    )
    assert n_nonascii == 0, (
        f"{n_nonascii} docs carry non-ASCII chars; fix_encoding may not "
        "be identity — pipe the corpus through fix_mojibake + "
        "clean_invisible first"
    )
    pairs_sql = banded_pairs_oracle_sql(
        base,
        threshold=JACCARD_THRESHOLD,
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
    )
    tbl = con.sql(f"SELECT id_a, id_b FROM ({pairs_sql})").fetchnumpy()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    nodes: set[int] = set()
    for a, b in zip(tbl["id_a"].tolist(), tbl["id_b"].tolist()):
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller: every root is its
            # component's min id by induction, so the canonical IS the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    non_canonical = {x for x in nodes if find(x) != x}
    return non_canonical, nodes


def _probe_flags(src: str, tmp: str) -> dict[int, dict[str, bool]]:
    """Per-SOURCE-doc gate flags from probe replica 1 (replica-invariant
    by the mixed construction). Keys are source doc_ids."""
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.curation import (
        c4_rule_flags,
        contamination_flags,
        repetition_signals,
    )
    from nahuatl_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="nahuatl-predict-mixed")
    spark.sparkContext.setLogLevel("ERROR")
    dot = lambda df: df.select(
        "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
    )
    probe = dot(spark.read.parquet(f"{tmp}/probe.parquet"))
    evalset = dot(spark.read.parquet(f"{tmp}/evalset.parquet"))

    flags: dict[int, dict[str, bool]] = {}
    for r in probe.select("doc_id").collect():
        flags[int(r["doc_id"]) % OFFSET] = {
            "c4": False,  # c4/rep default-fail: absent row = gate fails
            "rep": False,
            "contam": False,
        }
    c4 = c4_rule_flags(probe, min_words=MIN_WORDS).select(
        "doc_id", "keep_doc"
    )
    for r in c4.collect():
        flags[int(r["doc_id"]) % OFFSET]["c4"] = bool(r["keep_doc"])
    rep = repetition_signals(
        probe,
        max_top_bigram_frac=MAX_TOP_BIGRAM_FRAC,
        max_top_token_frac=MAX_TOP_TOKEN_FRAC,
    ).select("doc_id", "keep_doc")
    for r in rep.collect():
        flags[int(r["doc_id"]) % OFFSET]["rep"] = bool(r["keep_doc"])
    contam = contamination_flags(probe, evalset, n=DECONTAM_N)
    for r in contam.select("doc_id").collect():
        flags[int(r["doc_id"]) % OFFSET]["contam"] = True
    return flags


def predict(
    src: str, factor: int, url_stages: bool = False, cap: int = 100,
    psl_file: str | None = None,
) -> dict:
    """Exact predicted stats for ``bench.py --pipeline`` on the factor-f
    mixed replica; with ``url_stages`` (the SPARK_GRAFT_PIPELINE_URL_
    STAGES=1 configuration) the URL-dedup/domain-cap survivor set is
    enumerated FIRST and every content gate is predicted over it —
    the full-stack ground truth (round-11 verdict #3). ``psl_file``
    (the SPARK_GRAFT_PIPELINE_PSL_FILE configuration, round-12 verdict
    #4) switches the cap-key formula to the PSL closed form after
    verifying the file satisfies ``assert_psl_closed_form``."""
    psl = psl_file is not None
    if psl and not url_stages:
        raise ValueError("--psl-file only affects the --url-stages cap key")
    if psl:
        validated_psl_rules(psl_file)
    con = duckdb.connect()
    tmp = tempfile.mkdtemp(prefix="mixed_probe_")
    con.sql(
        f"COPY ({mixed_doc_select(src, 1)}) "
        f"TO '{tmp}/probe.parquet' (FORMAT parquet)"
    )
    con.sql(
        f"COPY ({mixed_eval_select(src)}) "
        f"TO '{tmp}/evalset.parquet' (FORMAT parquet)"
    )

    flags = _probe_flags(src, tmp)
    survivors = url_dups = domain_capped = None
    if url_stages:
        survivors, url_dups, domain_capped = _url_stage_survivors(
            con, src, factor, cap, psl=psl
        )
    non_canonical, clustered = _exact_dup_sets(
        con, src, factor, survivors=survivors
    )

    # enumerate every doc of the factor-f corpus: src id s in replica i
    # has doc_id = s + i*OFFSET; flavor split survives the shift because
    # OFFSET % CLONE_MOD == 0. The pipeline's `input` is the
    # head-of-pipeline count (URL-dropped rows are added back), so
    # input counts every doc while the content gates count only docs
    # that reach the main Observation (the URL-stage survivors).
    assert OFFSET % CLONE_MOD == 0
    counts = {
        "input": 0,
        "failed_c4": 0,
        "failed_repetition": 0,
        "near_dups": 0,
        "contaminated": 0,
        "output": 0,
    }
    for s, fl in flags.items():
        for i in range(factor):
            doc = s + i * OFFSET
            counts["input"] += 1
            if survivors is not None and doc not in survivors:
                continue
            counts["failed_c4"] += not fl["c4"]
            counts["failed_repetition"] += not fl["rep"]
            counts["contaminated"] += fl["contam"]
            is_dup = doc in non_canonical
            counts["near_dups"] += is_dup
            counts["output"] += (
                fl["c4"] and fl["rep"] and not fl["contam"] and not is_dup
            )
    if url_stages:
        counts["url_dups"] = url_dups
        counts["domain_capped"] = domain_capped

    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "factor": factor,
        "exact": True,
        "url_stages": url_stages,
        "psl": psl,
        "clustered_docs": len(clustered),
        "predicted": counts,
    }


if __name__ == "__main__":
    argv, psl_file = pop_psl_arg(sys.argv[1:])
    args = [a for a in argv if a != "--url-stages"]
    print(
        json.dumps(
            predict(
                args[0] if args else "/root/testdata/sf0.1",
                int(args[1]) if len(args) > 1 else 30,
                url_stages="--url-stages" in argv,
                psl_file=psl_file,
            ),
            separators=(",", ":"),
        )
    )
