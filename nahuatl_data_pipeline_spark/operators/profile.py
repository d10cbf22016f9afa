"""Single-pass table profiler: long-format (column, metric) summary.

The reference prints pandas ``describe()``-style stats in its notebooks
(benchmark/generate_stats.py) — driver-side, whole-table-in-memory. Here
the profile is TWO distributed aggregates over column-pruned scans (one
hash aggregate for the exact distincts, one grouping-less fold for
count/min/max/mean), crossJoined as 1-row frames, then a constant-size
unpivot — at 100 TB the cost is the scans plus 1-row exchanges,
independent of column count. (A single combined aggregate planned as
Expand×(cols+1) + SortAggregate — string min/max buffers disqualify
hash aggregation — and SORTED the expanded row set: measured 2.2 s vs
0.2 s at sf0.1, r13; the sort's spill dwarfs a pruned re-read at any
scale.)

``n_distinct`` uses exact ``count_distinct`` (oracle-checkable; Spark
plans multi-distinct via one Expand). For 100 TB profiling swap
``approx=True`` — approx_count_distinct has a fixed-size buffer and
folds into the min/max aggregate, restoring the one-scan shape.
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

    dis_aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(_src(c)).alias(f"__cnt_{i}"),
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
        dis_aggs.append(distinct(_src(c)).alias(f"__nd_{i}"))
    if approx:
        # approx_count_distinct folds into the same single aggregate
        # with no Expand — keep the one-scan shape
        one = df.agg(*aggs, *dis_aggs)
    else:
        # EXACT distincts ride their own aggregate, joined back as a
        # 1-row broadcast. Mixing multi-column count_distinct (Expand
        # ×(cols+1)) with string min/max buffers (HashAggregate-
        # ineligible) forced ONE SortAggregate that sorted the whole
        # expanded row set by (gid, value...) — measured 2.2 s at sf0.1
        # vs 0.2 s for the split (r13). Separated, the distinct
        # aggregate is a hash aggregate over narrow rows and the
        # min/max aggregate is a grouping-less fold with no sort; the
        # second column-pruned scan is far cheaper than sorting
        # (cols+1)x the table — at any scale the sort's spill alone
        # dwarfs a re-read.
        one = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*dis_aggs)))
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


def power_law_alpha(
    counts: DataFrame,
    count_col: str,
    xmin: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Power-law (Zipf) exponent of a frequency table by the Clauset–
    Shalizi–Newman discrete MLE approximation (SIAM Review 51(4), 2009,
    eq. 3.7): over items with frequency ``x ≥ xmin``,

        α ≈ 1 + n · [ Σ ln( x_i / (xmin − ½) ) ]⁻¹

    Corpus-health diagnostic for training data: natural text keeps its
    type/shingle frequencies near Zipfian (α ≈ 2); boilerplate floods,
    template spam, or aggressive dedup show up as α drifting away long
    before eyeballing samples would catch it — a one-row monitor per
    snapshot next to q83/q113's drift checks.

    Input is any (item, count) table — term counts, shingle document
    frequencies, domain sizes — so the expensive tokenize/aggregate
    stays in the caller's hands and is not replayed per diagnostic.
    Output: one row ``(n_types, xmin, alpha)`` from a single map-side-
    combined aggregate over the counts table; no sort, no collect.
    """
    if xmin < 2:
        # xmin=1 puts ln(x/(xmin-0.5)) at ln(2x) > 0 for ALL x, but the
        # continuous approximation is known-biased there; refuse the
        # degenerate divide-by-zero region rather than guess.
        raise ValueError(f"xmin must be >= 2, got {xmin}")
    x = F.col(count_col).cast("double")
    s = counts.where(x >= float(xmin)).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.log(x / (xmin - 0.5))).alias("__sl"),
    )
    return s.select(
        F.col("n_types").cast("long").alias("n_types"),
        F.lit(xmin).cast("long").alias("xmin"),
        F.round(
            F.lit(1.0) + F.col("n_types") / F.col("__sl"), round_to
        ).alias("alpha"),
    )
