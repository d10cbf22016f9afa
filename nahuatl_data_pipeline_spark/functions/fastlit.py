"""Fast injection of driver-side constant vectors/matrices into plans.

``F.lit`` / ``F.array`` build ONE py4j-bridged expression node per
element; a 16×64 centroid matrix inlined that way costs ~1,000
Python→JVM round-trips (~0.45 s measured) PER REFERENCE before Spark
even sees the query, and the analyzer then walks a 1,000-node
``CreateArray`` tree. These helpers render the same values as a single
SQL array literal and hand it to ``F.expr`` — one py4j call, one parse,
and Catalyst's ConstantFolding collapses the all-literal tree to a
single ``Literal`` during optimization (so the executed plan is
identical to the old one after folding; measured q169 build 1.8 s →
~0.1 s).

Exactness: elements are rendered with ``repr(float(x))``, Python's
shortest round-trip representation, suffixed ``D`` so Spark parses them
as DOUBLE (never DECIMAL). Shortest-repr parse returns the identical
IEEE-754 double, so the injected values are bit-identical to the
``F.lit`` path — pinned by ``tests/test_fastlit.py`` against ``F.lit``
element-wise, including exponent forms and negative zero. Non-finite
values are rejected: SQL has no inf/nan double literal, and no caller
legitimately inlines them.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(x: float) -> str:
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal {v!r} cannot be inlined as SQL")
    return repr(v) + "D"


def double_array_sql(vals) -> str:
    """SQL text for an ``array<double>`` literal."""
    return "array(" + ",".join(_render(v) for v in vals) + ")"


def double_array_lit(vals) -> Column:
    """``array<double>`` constant column from one parsed expression."""
    return F.expr(double_array_sql(vals))


def double_matrix_lit(mat) -> Column:
    """``array<array<double>>`` constant column (row-major) from one
    parsed expression — the centroid/hyperplane injection path."""
    return F.expr(
        "array(" + ",".join(double_array_sql(row) for row in mat) + ")"
    )
