"""SparkSession factory tuned for both local[*] testing and cluster scale.

Every knob here is chosen for the 100 TB target, then scaled down by
env for local runs:

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy switching replace hand-tuning.
- Arrow on: any Pandas-UDF operator (minhash, multimodal) moves
  columnar batches, not pickled rows.
- ``spark.sql.shuffle.partitions`` defaults to 2×cores locally; on a
  real cluster AQE coalesces from a deliberately high initial number.
- Broadcast threshold raised: TPC-H-style dims (region, nation,
  customer, supplier, part) must broadcast, never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All tables the driver materializes per scale factor.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "samza-hello-samza-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    cpus = cpus or default_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # local mode: one shuffle task per core (measured 2× faster
        # than 2×cores at sf0.1 — scheduling overhead dominates tiny
        # partitions). On a cluster, raise
        # spark.sql.adaptive.coalescePartitions.initialPartitionNum
        # instead and let AQE coalesce down.
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stdout clean: bench.py's final JSON line is machine-read
        # from a bounded stdout tail, so no progress bars may interleave.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata stores TIMESTAMP(NANOS); read as long and
        # convert in load_table (truncating to micros, matching what
        # DuckDB does when it reads the same files).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def cluster_conf(
    executors: int = 1000, cores_per_executor: int = 4
) -> dict[str, str]:
    """Recommended configs for the 100 TB / ~1000-executor deployment.

    The local factory above mirrors these where they apply; this dict
    is the documented delta for a real cluster (pass to
    ``SparkSession.builder.config(map=...)`` or spark-defaults):

    - shuffle partitions start HIGH (4 per core) and AQE coalesces
      down — undershooting means >2 GB partitions and spilled sorts;
      AQE can only merge, never split non-skew partitions.
    - advisory partition size bounds what AQE coalesces toward.
    - broadcast threshold stays modest: at 1000 executors an oversized
      broadcast is amplified 1000×; explicit `broadcast()` hints in
      the plans cover the known dims.
    - shuffle service + dynamic allocation let the fleet breathe
      between stages of very different widths.
    """
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(4 * total_cores),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024 * 1024),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(executors),
        "spark.shuffle.service.enabled": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.session.timeZone": "UTC",
    }


#: columns stored as TIMESTAMP(NANOS) in the driver parquet, per table.
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Convert an int64-nanos column to a µs timestamp, if needed.

    Driver testdata has shipped both encodings across rounds:
    TIMESTAMP(NANOS) (read as long under nanosAsLong) and plain
    TIMESTAMP(MICROS) (read as timestamp directly). Guarding on the
    actual dtype makes every consumer — batch loader, streaming file
    sources, tests — robust to either. The long path uses true integer
    division (`div`): int64 nanos (~1.8e18) exceed double's 2^53
    mantissa, so a float divide drifts ±1µs vs DuckDB's integer
    truncation of the same files.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(df.schema[col].dataType, LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    elif isinstance(df.schema[col].dataType, TimestampNTZType):
        # session timezone is pinned to UTC, so this cast reinterprets
        # the same wall-clock instant; LTZ is required by streaming
        # watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


#: Tables whose per-byte compute is dominated by downstream work
#: (regex tokenization of text, array math over vectors) and that no
#: operator reads with file-identity semantics (``input_file_name``,
#: physical-order tiebreaks). These get the scan-parallelism floor
#: below; the fact tables (lineitem/orders/part) feed the
#: zonemap/bloom per-FILE builds and must keep their native file
#: granularity, and events feeds topic_log offset assignment whose
#: tiebreak is physical order.
_SPREAD_TABLES = frozenset({"documents", "embeddings"})


def _n_parquet_files(path: str) -> int:
    """Driver-side stat of a table's parquet file count (no Spark
    job). A single small parquet file is ONE row group, hence ONE
    scan task no matter how many cores wait on it — byte-range
    splitting cannot cross a row-group boundary."""
    if os.path.isdir(path):
        return sum(
            1
            for dirpath, _dirs, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return 1


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table.

    A plain ``spark.read.parquet`` keeps the scan a v1 FileScan with
    full predicate pushdown + column pruning; callers filter/select
    directly on the result so Catalyst prunes at the source.

    r12 scan-parallelism floor (guide §2.5 "input skew: one huge
    unsplittable file" + the r11-accepted ``similarity._spread_scan``
    discipline): when a compute-heavy table's committed layout has
    fewer parquet files than the session has cores, every tokenize/
    vector stage above the scan runs on that handful of tasks while
    the rest of the box idles — at bench scale ``documents`` is ONE
    single-row-group file, so one task regex-tokenizes the whole
    corpus. Round-robin the scan to ``defaultParallelism`` first:
    filters/pruning still push to the scan below the exchange, the
    shuffled bytes are the (pruned) scan output, and a layout with
    ≥ cores files — every layout at the 100 TB shape — is a no-op by
    the same gate. Scale-adaptive by construction: the target is the
    session's parallelism, never a constant.
    """
    # Runtime-set (not only in our builder): the driver harness hands us
    # ITS session, which won't have this conf. It is a SQL conf, so
    # setting it per-session here is safe and idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        df = normalize_nanos_ts(df, col)
    if name in _SPREAD_TABLES:
        par = spark.sparkContext.defaultParallelism
        if _n_parquet_files(path) < par:
            df = df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
