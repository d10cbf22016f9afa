"""Analytical plans over the metadata store (SURVEY.md §1.3, §3.3)."""

from nahuatl_data_pipeline_spark.plans.metadata import (  # noqa: F401
    MetadataStore,
    data_lineage_summary,
    latest_quality_metrics,
    pipeline_performance,
    quality_trends,
    register_metadata_views,
)
