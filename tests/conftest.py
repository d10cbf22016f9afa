"""Shared fixtures: one session-scoped SparkSession + oracle helpers."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nahuatl_data_pipeline_spark.schemas import TESTDATA_TABLES
from nahuatl_data_pipeline_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nahuatl-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.exists(path):
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con

    return connect


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver's order-insensitive compare: sort columns by name,
    normalize dtypes, sort rows by all columns."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and all(
            isinstance(v, int) for v in s.dropna().head(5)
        ):
            try:
                pdf[c] = s.astype("Int64")
            except (TypeError, OverflowError, ValueError):
                pass
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True, kind="mergesort")
    return pdf


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} != oracle {len(b)}"
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != oracle {list(b.columns)}"
    )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            import numpy as np

            both_nan = av.isna() & bv.isna()
            eq = both_nan | np.isclose(
                av.fillna(0), bv.fillna(0), rtol=0, atol=0, equal_nan=True
            )
            exact = both_nan | (av.fillna(0) == bv.fillna(0))
            assert eq.all() and exact.all(), (
                f"{name}.{c}: value mismatch\n"
                f"{pd.DataFrame({'spark': av[~exact], 'oracle': bv[~exact]}).head(10)}"
            )
        else:
            eq = (av.isna() & bv.isna()) | (av == bv)
            assert eq.all(), (
                f"{name}.{c}: value mismatch\n"
                f"{pd.DataFrame({'spark': av[~eq], 'oracle': bv[~eq]}).head(10)}"
            )
