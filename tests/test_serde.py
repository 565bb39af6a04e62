"""Serde round-trips: JSON and delimited-string identity, Avro gate."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources import serde
from tests.conftest import SF_DIR


def _orders(spark):
    # timestamps round-trip through json/csv with full precision only
    # as strings; serialize a string-typed view for exact identity.
    from pyspark.sql import functions as F

    return (
        load_table(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .limit(500)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_json_round_trip(spark):
    src = _orders(spark)
    back = serde.json_deserialize(serde.json_serialize(src), src.schema)
    assert _rows(back) == _rows(src)


def test_json_envelope_has_key(spark):
    env = serde.json_serialize(_orders(spark), key_col="o_orderkey")
    assert env.columns == ["key", "value"]
    r = env.first()
    assert r.key.isdigit() and r.value.startswith("{")


def test_string_round_trip(spark):
    src = _orders(spark)
    back = serde.string_deserialize(serde.string_serialize(src), src.schema)
    assert _rows(back) == _rows(src)


def test_avro_gate(spark):
    src = _orders(spark)
    if serde.avro_available(spark):
        out = serde.avro_serialize(src)
        assert out.columns == ["value"]
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            serde.avro_serialize(src)
