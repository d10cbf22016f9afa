"""Command-line entry points (reference ``src/pipeline/cli.py``:
``python -m src.pipeline.cli run`` → here ``python -m
nahuatl_data_pipeline_spark <cmd>``).

Commands:
- ``run``     — full corpus pipeline over layer dirs → gold splits
- ``stats``   — one-pass corpus report on a parquet/jsonl table
- ``quality`` — expectation suite; exit code 1 on failed checks
              (run_quality_check.py:343-449 exit-code contract)
- ``query``   — execute one registered engine query by name
- ``curate``  — documents curation pipeline → gold parquet + drop stats
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nahuatl_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def _layer_kv(value: str) -> tuple[str, str]:
        if "=" not in value:
            raise argparse.ArgumentTypeError(
                f"expected NAME=DIR, got {value!r}"
            )
        name, d = value.split("=", 1)
        return name, d

    run = sub.add_parser("run", help="full corpus pipeline → gold splits")
    run.add_argument("--layer", action="append", required=True,
                     type=_layer_kv, metavar="NAME=DIR",
                     help="layer dir, e.g. silver=/data/s")
    run.add_argument("--out", required=True)
    run.add_argument("--seed", type=int, default=42)
    run.add_argument("--keep", default="best",
                     choices=["first", "last", "best", "longest-target"])
    run.add_argument("--metadata-dir", default=None)
    run.add_argument(
        "--url-col", default=None,
        help="enable crawl URL head stages on this column (e.g. url): "
        "canonical-URL dedup before any content stage",
    )
    run.add_argument(
        "--max-docs-per-domain", type=int, default=None,
        help="cap docs per registered domain after URL dedup "
        "(requires --url-col)",
    )
    run.add_argument(
        "--psl-file", default=None,
        help="publicsuffix.org data file: the domain-cap key uses full "
        "PSL semantics instead of the built-in two-label suffix tuple",
    )

    stats = sub.add_parser("stats", help="one-pass corpus stats report")
    stats.add_argument("--input", required=True, help="parquet path")
    stats.add_argument("--text-col", default="text")
    stats.add_argument("--group-by", default=None)

    quality = sub.add_parser("quality", help="expectation suite gate")
    quality.add_argument("--input", required=True, help="parquet path")
    quality.add_argument("--min-rows", type=float, default=1.0)
    quality.add_argument("--report", default=None,
                         help="write per-expectation JSON report here")
    quality.add_argument("--html", default=None,
                         help="write a human-readable HTML data-docs page "
                              "here (run_quality_check.py:343-449 parity)")
    quality.add_argument("--suite-name", default="corpus_suite")

    audit = sub.add_parser(
        "audit",
        help="gold-standard SFT audit report (analyze_gold_standard.py)",
    )
    audit.add_argument("--input", required=True, help="parquet path")
    audit.add_argument("--report", default=None,
                       help="write the markdown report here "
                            "(gold_standard_report.md parity)")
    audit.add_argument("--min-rows", type=int, default=10_000)

    drift = sub.add_parser(
        "drift", help="token-distribution drift between two corpora"
    )
    drift.add_argument("--base", required=True, help="baseline parquet")
    drift.add_argument("--batch", required=True, help="new-batch parquet")
    drift.add_argument("--id-col", default="doc_id",
                       help="accepted for compatibility; drift is id-free")
    drift.add_argument("--text-col", default="text")

    anomalies = sub.add_parser(
        "anomalies", help="per-group z-score outliers in a metric column"
    )
    anomalies.add_argument("--input", required=True, help="parquet path")
    anomalies.add_argument("--group-by", required=True)
    anomalies.add_argument("--value-col", required=True)
    anomalies.add_argument("--threshold", type=float, default=3.0)
    anomalies.add_argument("--limit", type=int, default=50)

    query = sub.add_parser("query", help="run a registered engine query")
    query.add_argument("name")
    query.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    query.add_argument("--limit", type=int, default=20)

    curate = sub.add_parser(
        "curate",
        help="documents curation pipeline: PII redact + C4/repetition "
        "gates + cluster dedup + decontamination → gold parquet",
    )
    curate.add_argument("--input", required=True, help="documents parquet")
    curate.add_argument("--out", required=True)
    curate.add_argument("--evalset", default=None,
                        help="benchmark parquet for decontamination")
    curate.add_argument("--min-words", type=int, default=20)
    curate.add_argument("--jaccard", type=float, default=0.8)
    curate.add_argument("--id-col", default="doc_id")
    curate.add_argument("--text-col", default="text")
    curate.add_argument(
        "--fix-encoding", action="store_true",
        help="repair mojibake + strip invisible chars before the gates",
    )
    curate.add_argument(
        "--url-col", default=None,
        help="enable URL canonicalize+dedup pre-filter on this column",
    )
    curate.add_argument(
        "--max-docs-per-domain", type=int, default=None,
        help="cap docs per registered domain after URL dedup "
        "(requires --url-col)",
    )
    curate.add_argument(
        "--psl-file", default=None,
        help="publicsuffix.org data file: the domain-cap key uses full "
        "PSL semantics instead of the built-in two-label suffix tuple",
    )

    layout = sub.add_parser(
        "layout",
        help="rewrite parquet in a data-skipping layout: range-sorted "
        "(one cluster column) or z-ordered (2+ columns)",
    )
    layout.add_argument("--input", required=True, help="parquet path")
    layout.add_argument("--out", required=True)
    layout.add_argument(
        "--by", required=True,
        help="comma-separated cluster columns; 1 → range sort, 2+ → z-order",
    )
    layout.add_argument("--num-files", type=int, default=8)
    convert = sub.add_parser(
        "convert",
        help="bulk JSONL→Parquet conversion "
        "(the reference's convert_to_parquet.py, distributed)",
    )
    convert.add_argument(
        "--input", required=True, help="JSONL path or glob"
    )
    convert.add_argument("--out", required=True, help="parquet output dir")
    convert.add_argument(
        "--schema",
        choices=["legacy", "infer"],
        default="legacy",
        help="'legacy' pins the reference's corpus schema (one scan); "
        "'infer' samples the input first (two scans — dev only)",
    )
    return p


def _load_psl(path: str | None) -> dict | None:
    """Parsed PSL rule groups from ``--psl-file`` (None passthrough)."""
    if path is None:
        return None
    from nahuatl_data_pipeline_spark.functions.url import (
        load_public_suffix_list,
    )

    return load_public_suffix_list(path)


def main(argv: list[str] | None = None) -> int:
    from nahuatl_data_pipeline_spark.session import get_spark

    args = _build_parser().parse_args(argv)
    spark = get_spark(app_name=f"nahuatl-cli-{args.cmd}")

    if args.cmd == "run":
        from nahuatl_data_pipeline_spark.pipeline import (
            PipelineConfig,
            run_corpus_pipeline,
        )
        from nahuatl_data_pipeline_spark.plans.metadata import MetadataStore

        layer_dirs = dict(args.layer)
        store = (
            MetadataStore(spark, args.metadata_dir) if args.metadata_dir else None
        )
        stats = run_corpus_pipeline(
            spark,
            layer_dirs,
            args.out,
            PipelineConfig(
                seed=args.seed,
                keep=args.keep,
                url_col=args.url_col,
                max_docs_per_domain=args.max_docs_per_domain,
                psl_rules=_load_psl(args.psl_file),
            ),
            metadata_store=store,
        )
        print(json.dumps(stats))
        return 0

    if args.cmd == "stats":
        from nahuatl_data_pipeline_spark.operators.aggregates import length_stats

        if args.input.endswith((".jsonl", ".json")):
            from nahuatl_data_pipeline_spark.sources.readers import (
                read_corpus_jsonl,
            )

            df = read_corpus_jsonl(spark, args.input, keep_invalid=True)
        else:
            df = spark.read.parquet(args.input)
        out = length_stats(df, args.text_col, group_by=args.group_by)
        for row in out.collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    if args.cmd == "audit":
        # exit-code contract mirrors the reference's verdict tiers:
        # 0 = PASS (score ≥ 80), 1 = reservations/FAIL
        from nahuatl_data_pipeline_spark.operators.audit import (
            audit_gold_standard,
            render_audit_markdown,
        )

        result = audit_gold_standard(
            spark.read.parquet(args.input), min_rows=args.min_rows
        )
        md = render_audit_markdown(result, source_path=args.input)
        if args.report:
            with open(args.report, "w", encoding="utf-8") as f:
                f.write(md)
        print(
            json.dumps(
                {
                    "score": result.score,
                    "verdict": result.verdict,
                    "metrics": result.metrics,
                }
            )
        )
        return 0 if result.verdict == "PASS" else 1

    if args.cmd == "quality":
        # exit-code contract of run_quality_check.py:343-449:
        # 0 = all expectations pass, 1 = some fail, 2 = couldn't run
        from nahuatl_data_pipeline_spark.operators.quality import (
            Check,
            not_null_ratio,
            row_count,
            run_checks,
            write_validation_report,
        )

        try:
            df = spark.read.parquet(args.input)
            checks = [
                Check("rows", row_count(), ">=", args.min_rows),
                *[
                    Check(f"{c}_not_null", not_null_ratio(c), ">", 0.0)
                    for c in df.columns
                ],
            ]
            results = run_checks(df, checks).collect()
        except Exception as exc:
            print(f"quality check could not run: {exc}", file=sys.stderr)
            err_report = {"suite": args.suite_name, "success": False,
                          "exception_info": str(exc), "results": []}
            if args.report:
                with open(args.report, "w", encoding="utf-8") as f:
                    json.dump(err_report, f)
            if args.html:
                from nahuatl_data_pipeline_spark.operators.quality import (
                    write_validation_html,
                )

                write_validation_html(args.html, err_report)
            return 2
        for r in results:
            print(json.dumps(r.asDict()))
        if args.report:
            report = write_validation_report(args.report, results, args.suite_name)
        else:
            from nahuatl_data_pipeline_spark.operators.quality import (
                validation_report,
            )

            report = validation_report(results, args.suite_name)
        if args.html:
            from nahuatl_data_pipeline_spark.operators.quality import (
                write_validation_html,
            )

            write_validation_html(args.html, report)
        return 0 if report["success"] else 1

    if args.cmd == "drift":
        from nahuatl_data_pipeline_spark.operators.drift import token_drift

        report = token_drift(
            spark.read.parquet(args.base),
            spark.read.parquet(args.batch),
            text_col=args.text_col,
        ).first()
        print(json.dumps(report.asDict()))
        return 0

    if args.cmd == "anomalies":
        from pyspark.sql import functions as F

        from nahuatl_data_pipeline_spark.operators.anomaly import (
            zscore_outliers,
        )

        flagged = zscore_outliers(
            spark.read.parquet(args.input),
            [args.group_by],
            args.value_col,
            threshold=args.threshold,
        ).filter(F.col("is_outlier"))
        # most-severe-first with a total order: when outliers exceed
        # --limit, the printed subset is the worst N and reproducible
        worst_first = flagged.orderBy(
            F.abs(F.col("zscore")).desc(),
            F.col(args.group_by).asc_nulls_last(),
            F.col(args.value_col).asc(),
        )
        for row in worst_first.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    if args.cmd == "curate":
        from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
            CurationConfig,
            run_curation_pipeline,
        )

        docs = spark.read.parquet(args.input)
        evalset = spark.read.parquet(args.evalset) if args.evalset else None
        stats = run_curation_pipeline(
            spark,
            docs,
            args.out,
            evalset=evalset,
            cfg=CurationConfig(
                min_words=args.min_words,
                jaccard_threshold=args.jaccard,
                fix_encoding=args.fix_encoding,
                url_col=args.url_col,
                max_docs_per_domain=args.max_docs_per_domain,
                psl_rules=_load_psl(args.psl_file),
            ),
            id_col=args.id_col,
            text_col=args.text_col,
        )
        print(json.dumps(stats))
        return 0

    if args.cmd == "convert":
        from nahuatl_data_pipeline_spark.sources.writers import (
            convert_jsonl_to_parquet,
        )

        if args.schema == "legacy":
            convert_jsonl_to_parquet(spark, args.input, args.out)
        else:
            spark.read.json(args.input).write.mode("overwrite").parquet(
                args.out
            )
        print(json.dumps({
            "out": args.out,
            "rows": spark.read.parquet(args.out).count(),
        }))
        return 0

    if args.cmd == "layout":
        from nahuatl_data_pipeline_spark.sources.writers import (
            write_range_sorted,
            write_zordered,
        )

        cols = [c.strip() for c in args.by.split(",") if c.strip()]
        if not cols:
            print("layout: --by needs at least one column", file=sys.stderr)
            return 2
        df = spark.read.parquet(args.input)
        if len(cols) == 1:
            write_range_sorted(df, args.out, cols[0], num_files=args.num_files)
        else:
            write_zordered(df, args.out, cols, num_files=args.num_files)
        print(json.dumps({
            "out": args.out,
            "layout": "range_sorted" if len(cols) == 1 else "zorder",
            "cluster_cols": cols,
            "rows": spark.read.parquet(args.out).count(),
        }))
        return 0

    if args.cmd == "query":
        from nahuatl_data_pipeline_spark import registry

        qs = registry.queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; available: {sorted(qs)}",
                  file=sys.stderr)
            return 2
        df = qs[args.name](spark, args.sf_dir)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
