"""Sources & sinks (SURVEY.md §2.1).

Readers return DataFrames with the corpus schema; all legacy-format
tolerance (key coalescing, corrupt-line skipping, nested dumps) is
expressed as column projections over schema-pinned scans — never
driver-side row loops.
"""

from nahuatl_data_pipeline_spark.sources.readers import (  # noqa: F401
    legacy_coalesce,
    read_corpus_jsonl,
    read_json_dump,
    read_layer_dir,
)
from nahuatl_data_pipeline_spark.sources.writers import (  # noqa: F401
    convert_jsonl_to_parquet,
    write_jsonl,
    write_parquet,
    write_splits,
)
from nahuatl_data_pipeline_spark.sources.registry import (  # noqa: F401
    load_source_registry,
    mark_sources_done,
    pending_source_rows,
)
