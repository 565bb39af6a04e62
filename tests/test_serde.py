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


# --------------------------------------------------------------------------
# pure-python Avro codec: spec wire format + container file
# --------------------------------------------------------------------------


def test_avro_codec_primitives_round_trip():
    from samza_hello_samza_spark.functions import avro_codec

    schema = {
        "type": "record",
        "name": "Everything",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "ok", "type": "boolean"},
            {"name": "maybe", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "long"}},
            {"name": "attrs", "type": {"type": "map", "values": "string"}},
        ],
    }
    rec = {
        "l": -(2**40), "i": 7, "d": 3.5, "f": 1.25, "s": "héllo",
        "b": b"\x00\xff", "ok": True, "maybe": None,
        "tags": [1, -2, 3], "attrs": {"k": "v", "x": "y"},
    }
    out = avro_codec.decode_record(schema, avro_codec.encode_record(schema, rec))
    assert out == rec
    rec2 = dict(rec, maybe="present", ok=False, tags=[])
    assert avro_codec.decode_record(schema, avro_codec.encode_record(schema, rec2)) == rec2


def test_avro_zigzag_varint_spec_vectors():
    """Known encodings from the Avro spec: 0→00, -1→01, 1→02, -64→7f, 64→80 01."""
    import io

    from samza_hello_samza_spark.functions import avro_codec

    for n, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        buf = io.BytesIO()
        avro_codec.write_long(buf, n)
        assert buf.getvalue() == enc, (n, buf.getvalue())
        assert avro_codec.read_long(io.BytesIO(enc)) == n


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_file_round_trip(codec):
    from samza_hello_samza_spark.functions import avro_codec

    schema = {
        "type": "record",
        "name": "PageView",
        "fields": [
            {"name": "pageId", "type": "string"},
            {"name": "userId", "type": "string"},
            {"name": "durationMs", "type": "long"},
        ],
    }
    recs = [
        {"pageId": f"p{i}", "userId": f"u{i % 3}", "durationMs": i * 17}
        for i in range(100)
    ]
    blob = avro_codec.write_container(schema, recs, codec=codec, sync=b"S" * 16)
    got_schema, got = avro_codec.read_container(blob)
    assert got_schema == schema and got == recs


def test_avro_spark_round_trip(spark):
    """events → Avro binary → events, Arrow-batched both ways."""
    from pyspark.sql import functions as F

    src = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", F.col("value").cast("double").alias("value"))
        .limit(1000)
    )
    encoded, avro_schema = serde.avro_encode(src)
    assert [f.name for f in encoded.schema.fields] == ["value"]
    back = serde.avro_decode(encoded, avro_schema, src.schema)
    assert _rows(back) == _rows(src)


def test_avro_schema_inference_nullable_unions(spark):
    src = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    schema = serde.avro_schema_for(src.schema)
    for f in schema["fields"]:
        assert f["type"][0] == "null" or isinstance(f["type"], str)


# -- property-based round-trip (hypothesis) ---------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _PROP_SCHEMA = {
        "type": "record",
        "name": "PropRec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "note", "type": ["null", "string"]},
            {"name": "blob", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
        ],
    }

    _record_st = st.fixed_dictionaries(
        {
            "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "name": st.text(max_size=40),
            "score": st.floats(allow_nan=False, width=64),
            "tags": st.lists(st.text(max_size=10), max_size=5),
            "props": st.dictionaries(
                st.text(max_size=8), st.integers(-(2**40), 2**40), max_size=5
            ),
            "note": st.one_of(st.none(), st.text(max_size=20)),
            "blob": st.binary(max_size=30),
            "flag": st.booleans(),
        }
    )

    @given(record=_record_st)
    @settings(max_examples=100, deadline=None)
    def test_avro_datum_property_round_trip(record):
        """decode∘encode is identity for arbitrary spec-typed records —
        the wire format holds for the whole value space, not just the
        hand-picked vectors."""
        from samza_hello_samza_spark.functions import avro_codec

        blob = avro_codec.encode_record(_PROP_SCHEMA, record)
        assert avro_codec.decode_record(_PROP_SCHEMA, blob) == record

    @given(records=st.lists(_record_st, max_size=6), deflate=st.booleans())
    @settings(max_examples=25, deadline=None)
    def test_avro_container_property_round_trip(records, deflate):
        from samza_hello_samza_spark.functions import avro_codec

        blob = avro_codec.write_container(
            _PROP_SCHEMA, records, codec="deflate" if deflate else "null"
        )
        schema, out = avro_codec.read_container(blob)
        assert schema == _PROP_SCHEMA
        assert out == records
