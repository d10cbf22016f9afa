"""Schema contract over the driver-generated testdata.

Round 3 was lost to a silent physical-layout drift (events.ts changed
parquet type between testdata generations). ``load_table`` now fails
loudly for events; this test extends early drift detection to every
table the oracles depend on — it pins the SEMANTIC type family each
query family relies on (integral keys, numeric measures, datetime-ish
date columns), not exact physical types, so a benign re-generation
passes while a breaking one fails here in pytest rather than at the
driver's correctness gate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegralType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from nahuatl_data_pipeline_spark.schemas import load_table
from tests.conftest import SF_SMOKE

_DATETIMEY = (DateType, TimestampType, TimestampNTZType)
_NUMERIC = (DoubleType, FloatType, IntegralType)

# table -> {column: family}; families: int / num / str / datetime / vec
_CONTRACT = {
    "region": {"r_regionkey": "int", "r_name": "str"},
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "customer": {"c_custkey": "int", "c_acctbal": "num", "c_mktsegment": "str"},
    "supplier": {"s_suppkey": "int", "s_nationkey": "int", "s_acctbal": "num"},
    "part": {"p_partkey": "int", "p_size": "int", "p_retailprice": "num"},
    "orders": {
        "o_orderkey": "int",
        "o_custkey": "int",
        "o_totalprice": "num",
        "o_orderdate": "datetime",
    },
    "lineitem": {
        "l_orderkey": "int",
        "l_partkey": "int",
        "l_suppkey": "int",
        "l_quantity": "num",
        "l_extendedprice": "num",
        "l_discount": "num",
        "l_tax": "num",
        "l_returnflag": "str",
        "l_shipdate": "datetime",
    },
    "events": {
        "event_id": "int",
        "user_id": "int",
        "event_type": "str",
        "value": "num",
        "props": "str",
    },
    "documents": {
        "doc_id": "int",
        "text": "str",
        "lang": "str",
        "source": "str",
        "n_chars": "int",
    },
    "embeddings": {"vec_id": "int", "embedding": "vec", "label": "int"},
}


def _ok(dt, family) -> bool:
    if family == "int":
        return isinstance(dt, IntegralType)
    if family == "num":
        return isinstance(dt, _NUMERIC)
    if family == "str":
        return isinstance(dt, StringType)
    if family == "datetime":
        return isinstance(dt, _DATETIMEY)
    if family == "vec":
        return isinstance(dt, ArrayType) and isinstance(
            dt.elementType, (FloatType, DoubleType)
        )
    raise AssertionError(family)


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
@pytest.mark.parametrize("table", sorted(_CONTRACT))
def test_table_schema_contract(spark, table):
    df = load_table(spark, SF_SMOKE, table)
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = set(_CONTRACT[table]) - set(fields)
    assert not missing, f"{table}: columns vanished from testdata: {missing}"
    bad = {
        c: fields[c].simpleString()
        for c, fam in _CONTRACT[table].items()
        if not _ok(fields[c], fam)
    }
    assert not bad, (
        f"{table}: physical layout drift — {bad}; update the consuming "
        "queries/oracles (and load_table if normalization is needed)"
    )


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
def test_events_ts_is_canonical_timestamp(spark):
    """events.ts must come out of load_table as session-tz TimestampType
    whatever the parquet layout (the round-3 regression class)."""
    df = load_table(spark, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
