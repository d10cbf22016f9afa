"""compression_ratio invariants (no SQL oracle possible — zlib): repeated
text compresses far better than high-entropy text, prose sits between,
nulls/empties undefined, deterministic across partitionings."""

from __future__ import annotations

import os
import random
import string

import pytest

from tests.conftest import SF_ORACLE

from nahuatl_data_pipeline_spark.functions.text_analysis import (
    compression_ratio,
)


def _ratios(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [
        r["r"] for r in df.select(compression_ratio("t").alias("r")).collect()
    ]


def test_signal_orders_boilerplate_prose_noise(spark):
    rng = random.Random(7)
    boiler = "lorem ipsum " * 200
    words = (
        "tlahtolli tonalli altepetl tlacah cualli huei atl calli xochitl "
        "yolotl metztli citlalli tepetl milli ocelotl cuauhtli mazatl "
        "quiyahuitl ehecatl necuhtli tlaxcalli"
    ).split()
    prose = " ".join(
        f"In {words[i % 20]} oquittac in {words[(i * 7 + 3) % 20]} ihuan "
        f"in {words[(i * 13 + 5) % 20]} ipan {i}."
        for i in range(40)
    )
    noise = "".join(rng.choice(string.printable) for _ in range(2000))
    b, p, n = _ratios(spark, [boiler, prose, noise])
    assert b < p < n
    assert b < 0.1          # pure repetition collapses
    assert 0.1 < p < 0.7    # natural prose
    assert n > 0.7          # random bytes barely compress


def test_null_and_empty_undefined(spark):
    df = spark.createDataFrame([(None,), ("",), ("texto real aquí",)],
                               "t string")
    got = [r["r"] for r in df.select(compression_ratio("t").alias("r")).collect()]
    assert got[0] is None and got[1] is None and got[2] is not None


def test_deterministic_across_partitioning(spark):
    texts = [f"documento número {i} " * (i % 7 + 1) for i in range(40)]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    a = sorted(
        r["r"] for r in df.select(compression_ratio("t").alias("r")).collect()
    )
    b = sorted(
        r["r"]
        for r in df.repartition(11)
        .select(compression_ratio("t").alias("r"))
        .collect()
    )
    assert a == b


@pytest.mark.skipif(
    not os.path.isdir(SF_ORACLE), reason="driver-generated testdata absent"
)
def test_q56_exact_python_oracle(spark):
    """q56 has no DuckDB oracle (zlib), so pin it with an EXACT Python
    oracle instead of rows-only: recompute zlib ratio per document from
    the same parquet with the reference zlib library and require perfect
    per-doc equality — strictly stronger than the driver's rows-only
    check."""
    import zlib

    import pyarrow.parquet as pq

    import __spark_entry__ as e

    sf = SF_ORACLE
    got = {
        r["doc_id"]: (r["compression_ratio"], r["in_prose_band"])
        for r in e.queries()["q56_compression_quality"](spark, sf).collect()
    }
    pdf = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    assert len(got) == len(pdf)
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if text is None or text == "":
            expect = None
        else:
            raw = text.encode("utf-8")
            expect = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        ratio, band = got[doc_id]
        assert ratio == expect, (doc_id, ratio, expect)
        if expect is not None:
            assert band == (0.1 < expect < 0.9)


def test_char_entropy_known_values(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.functions.text_analysis import char_entropy

    df = spark.createDataFrame(
        [("aab",), ("aaaa",), ("ab",), (None,), ("",)], "t string"
    )
    got = [
        r["e"]
        for r in df.select(F.round(char_entropy("t"), 6).alias("e")).collect()
    ]
    # H({2/3,1/3}) = 0.918296 bits; uniform single char = 0; fair coin = 1
    assert got[0] == 0.918296
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[3] is None and got[4] is None
