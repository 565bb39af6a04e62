"""Serdes: the reference's JSON / Avro / String serialization surface.

Samza configures per-stream serdes (JsonSerdeV2, AvroSerde,
StringSerde — see the reference's *.properties and
PageViewAvroRecord.java). Spark's equivalent is column-level
(de)serialization expressions, which stay inside codegen:

- JSON   : ``to_json``/``from_json`` (JsonSerdeV2 analog)
- String : ``to_csv``/``from_csv`` delimiter records (StringSerde +
           the wikipedia feed's line-format analog)
- Avro   : TWO paths. ``avro_serialize`` uses the external
           spark-avro module (jar-gated — cluster-only in this
           container, the gate raises a clear error instead of a
           py4j stack). ``avro_encode``/``avro_decode`` are a
           FUNCTIONAL in-container path: Arrow-batched mapInPandas
           over the pure-python spec codec in
           ``functions/avro_codec.py`` — the real Avro wire format
           (PageViewAvroRecord analog), interoperable with any Avro
           reader, tested round-trip.

Every serde is a pure DataFrame→DataFrame transform, so the same
round-trip runs identically in batch and foreachBatch/streaming.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import avro_codec


def json_serialize(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Rows → (key, value) JSON envelope (Kafka-shaped)."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def json_deserialize(df: DataFrame, schema: StructType) -> DataFrame:
    """(…, value: json string) → typed rows."""
    return df.select(F.from_json(F.col("value"), schema).alias("v")).select("v.*")


def string_serialize(df: DataFrame, sep: str = "\t") -> DataFrame:
    """Rows → one delimited string per row (StringSerde analog)."""
    return df.select(
        F.to_csv(
            F.struct(*[F.col(c) for c in df.columns]), {"sep": sep}
        ).alias("value")
    )


def string_deserialize(df: DataFrame, schema: StructType, sep: str = "\t") -> DataFrame:
    """Delimited strings → typed rows."""
    return df.select(
        F.from_csv(F.col("value"), schema.simpleString(), {"sep": sep}).alias("v")
    ).select("v.*")


def avro_available(spark) -> bool:
    """True when the spark-avro data source is actually loaded.

    The pyspark shim (``pyspark.sql.avro.functions``) always imports;
    whether the JVM side works only shows at expression analysis
    (AVRO_NOT_LOADED otherwise) — so probe with a real expression.
    """
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).schema
        return True
    except Exception:  # noqa: BLE001 - AVRO_NOT_LOADED or missing shim
        return False


#: Spark type → Avro primitive, for schema inference.
_AVRO_TYPES = {
    LongType: "long",
    IntegerType: "int",
    DoubleType: "double",
    FloatType: "float",
    StringType: "string",
    BooleanType: "boolean",
    BinaryType: "bytes",
}


def avro_schema_for(df_schema: StructType, name: str = "Record") -> dict[str, Any]:
    """Infer an Avro record schema from a flat Spark schema.

    Nullable fields become ``["null", T]`` unions, mirroring what
    spark-avro's ``to_avro`` derives for the same struct.
    """
    fields = []
    for f in df_schema.fields:
        t = _AVRO_TYPES.get(type(f.dataType))
        if t is None:
            raise ValueError(f"unsupported Avro field type {f.dataType} for {f.name}")
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_encode(df: DataFrame) -> tuple[DataFrame, dict[str, Any]]:
    """Rows → Avro-binary ``value`` column via the pure-python codec.

    Returns (encoded_df, avro_schema). Arrow-batched mapInPandas: each
    worker encodes a columnar batch of records to the spec wire format
    — the in-container PageViewAvroRecord path.
    """
    import pandas as pd

    schema = avro_schema_for(df.schema)
    cols = [f.name for f in df.schema.fields]

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            values = [
                avro_codec.encode_record(
                    schema,
                    {c: (None if pd.isna(rec[c]) else rec[c]) for c in cols},
                )
                for rec in pdf.to_dict("records")
            ]
            yield pd.DataFrame({"value": values})

    out = df.mapInPandas(enc, StructType([StructField("value", BinaryType())]))
    return out, schema


def avro_decode(df: DataFrame, avro_schema: dict[str, Any], spark_schema: StructType) -> DataFrame:
    """(value: binary) → typed rows, inverse of ``avro_encode``."""
    import pandas as pd

    cols = [f.name for f in spark_schema.fields]

    def dec(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = [avro_codec.decode_record(avro_schema, bytes(v)) for v in pdf["value"]]
            yield pd.DataFrame({c: [r[c] for r in recs] for c in cols})

    return df.mapInPandas(dec, spark_schema)


def avro_serialize(df: DataFrame) -> DataFrame:
    """Rows → Avro binary column (PageViewAvroRecord analog).

    Requires the spark-avro package on a real cluster
    (``--packages org.apache.spark:spark-avro_2.13:<version>``).
    """
    try:
        from pyspark.sql.avro.functions import to_avro

        return df.select(
            to_avro(F.struct(*[F.col(c) for c in df.columns])).alias("value")
        )
    except Exception as e:
        raise RuntimeError(
            "spark-avro jar not on classpath; add org.apache.spark:spark-avro "
            "via --packages (container is offline, so this is cluster-only)"
        ) from e
