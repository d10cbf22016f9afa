"""Single-pass table profiler: long-format (column, metric) summary.

The reference prints pandas ``describe()``-style stats in its notebooks
(benchmark/generate_stats.py) — driver-side, whole-table-in-memory. Here
the profile is ONE distributed aggregate producing every column's stats
in a single scan, then a constant-size unpivot: at 100 TB the cost is
the scan plus one 1-row shuffle, independent of column count.

``n_distinct`` uses exact ``count_distinct`` (oracle-checkable; Spark
plans multi-distinct via one Expand). For 100 TB profiling swap
``approx=True`` — approx_count_distinct folds into the same single
aggregate with no Expand, the standard trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per profiled column: ``column, n_rows, n_nulls,
    n_distinct, min_val, max_val, mean_val`` (min/max as strings so one
    schema covers every type; mean only for numeric columns, else
    null). Column order of the output follows ``cols``.
    """
    cols = cols or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    distinct = F.approx_count_distinct if approx else F.count_distinct
    # metric aliases are INDEX-based: an alias derived from the column
    # name would be re-resolved through F.col later, where a dot parses
    # as struct-field access (profiling a table with 'a.b' columns —
    # exactly what a generic profiler gets pointed at — would throw)
    aggs = [F.count(F.lit(1)).alias("__n")]
    def _src(c: str):
        # backtick-quote the SOURCE reference: both F.col and df[...]
        # parse an unquoted dot as struct-field access, so a column
        # literally named 'a.b' needs `a.b` (with embedded backticks
        # doubled, the Spark escaping rule)
        return F.col("`" + c.replace("`", "``") + "`")

    for i, c in enumerate(cols):
        aggs += [
            F.count(_src(c)).alias(f"__cnt_{i}"),
            distinct(_src(c)).alias(f"__nd_{i}"),
            F.min(_src(c)).cast("string").alias(f"__min_{i}"),
            F.max(_src(c)).cast("string").alias(f"__max_{i}"),
            (
                # cast: avg over DECIMAL columns yields DECIMAL, and
                # stack() requires every mean slot to share one type
                F.avg(_src(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__mean_{i}"),
        ]
    one = df.agg(*aggs)
    # constant-size unpivot of the 1-row aggregate via stack
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"__cnt_{i}"),
            F.col(f"__nd_{i}"),
            F.col(f"__min_{i}"),
            F.col(f"__max_{i}"),
            F.round(F.col(f"__mean_{i}"), 6),
        ]
    return one.select(
        "__n",
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("column", "__cnt", "n_distinct", "min_val", "max_val",
                "mean_val"),
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__cnt")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
        "mean_val",
    )
