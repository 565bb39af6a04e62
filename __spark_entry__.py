"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from samza_hello_samza_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (wikipedia windowed stats) on sf0.001."""
    from samza_hello_samza_spark.operators.samza_surface import wikipedia_stats

    return wikipedia_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
