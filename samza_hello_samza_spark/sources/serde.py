"""Serdes: the reference's JSON / Avro / String serialization surface.

Samza configures per-stream serdes (JsonSerdeV2, AvroSerde,
StringSerde — see the reference's *.properties and
PageViewAvroRecord.java). Spark's equivalent is column-level
(de)serialization expressions, which stay inside codegen:

- JSON   : ``to_json``/``from_json`` (JsonSerdeV2 analog)
- String : ``to_csv``/``from_csv`` delimiter records (StringSerde +
           the wikipedia feed's line-format analog)
- Avro   : ``to_avro``/``from_avro`` from the external avro module —
           gated, since the jar isn't in this container; the gate
           raises a clear error instead of a py4j stack.

Every serde is a pure DataFrame→DataFrame transform, so the same
round-trip runs identically in batch and foreachBatch/streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


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
