"""DataFrame→DataFrame operators (SURVEY.md §2).

Each operator is declarative — it appends to the logical plan and lets
Catalyst choose the physical strategy (pushdown, broadcast, AQE). Nothing
in here collects to the driver.
"""

from nahuatl_data_pipeline_spark.operators.filters import (  # noqa: F401
    length_bounds_filter,
    pending_sources,
    translation_pair_filter,
    watermark_filter,
)
from nahuatl_data_pipeline_spark.operators.dedup import (  # noqa: F401
    deduplicate,
    duplicate_stats,
    exact_dedup,
)
from nahuatl_data_pipeline_spark.operators.split import (  # noqa: F401
    seeded_split,
    split_leakage_count,
)
from nahuatl_data_pipeline_spark.operators.aggregates import (  # noqa: F401
    daily_rollup,
    language_counts,
    length_stats,
    null_stats,
    top_k,
    type_token_ratio,
)
