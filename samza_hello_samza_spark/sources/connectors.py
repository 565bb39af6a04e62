"""Connector builders: the reference's system descriptors, Spark-first.

Samza wires systems via descriptors (KafkaSystemDescriptor,
KinesisSystemDescriptor — reference src/main/config/*.properties and
KinesisHelloSamza.java / AzureApplication.java). Spark equivalents are
reader/writer configs; each builder returns a configured reader so job
code stays source-agnostic. Broker-backed ones (kafka/kinesis/
eventhubs) need their connector jars on a real cluster — builders
construct the exact options and raise a clear error only on .load()
in this offline container, which is the honest boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader
from pyspark.sql.types import StructType


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataStreamReader:
    """KafkaSystemDescriptor analog (kafka-*.properties in reference conf)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )


def kafka_json_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType,
) -> DataFrame:
    """Kafka topic → typed DataFrame via from_json (JsonSerdeV2 analog)."""
    from pyspark.sql import functions as F

    raw = kafka_reader(spark, bootstrap_servers, topic).load()
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("key", "v.*", "kafka_ts")


def kinesis_reader(
    spark: SparkSession, stream_name: str, region: str, endpoint: str | None = None
) -> DataStreamReader:
    """KinesisHelloSamza.java analog (requires the kinesis connector jar)."""
    r = (
        spark.readStream.format("kinesis")
        .option("streamName", stream_name)
        .option("region", region)
        .option("initialPosition", "earliest")
    )
    if endpoint:
        r = r.option("endpointUrl", endpoint)
    return r


def eventhubs_reader(spark: SparkSession, connection_string: str) -> DataStreamReader:
    """AzureApplication.java analog (requires azure-eventhubs-spark jar)."""
    return spark.readStream.format("eventhubs").option(
        "eventhubs.connectionString", connection_string
    )


def file_json_stream(
    spark: SparkSession, path: str, schema: StructType, max_files: int | None = None
) -> DataFrame:
    """Replayable JSON-lines directory stream (wikipedia-raw.json style)."""
    r = spark.readStream.schema(schema)
    if max_files:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.json(path)


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """OutputDescriptor analog: stream → Kafka topic as JSON values."""
    from pyspark.sql import functions as F

    payload = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
