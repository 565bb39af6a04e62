"""The reference's Samza SQL examples as literal Spark SQL.

Reference: src/main/java/samza/examples/sql/samza-sql-{filter,
casewhen,groupby,stream-table-join}/src/main/sql/samza.sql. Samza SQL
compiles Calcite SQL onto the stream; here the same statements run
through spark.sql over the registered tables — demonstrating that the
engine's SQL surface covers the reference's (INSERT INTO → the
returned DataFrame, which callers write wherever they sink).

The UDF the reference uses (GetSqlField over nested records) maps to
get_json_object over the events.props JSON column — registered as a
temp view projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import load_table

# samza-sql-filter/samza.sql: filter + project on the change stream.
# The reference filters on standardize(title) — a normalizer wrapped
# around the filter column. Wrapping the column in a function blocks
# predicate pushdown (the scan can't prune what it can't see), which
# at 100 TB means reading every row to filter a fraction. The
# Spark-first translation normalizes at ingest (event_type is stored
# normalized) and pushes a plain equality to the parquet scan.
SQL_FILTER = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'view'
"""

# samza-sql-casewhen/samza.sql: quality flag incl. a nested-field
# UDF (GetSqlField ≈ get_json_object on the props JSON).
SQL_CASEWHEN = """
    SELECT event_id,
           CASE WHEN value > 100 AND get_json_object(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END AS quality
    FROM events
"""

# samza-sql-groupby/samza.sql: counts per extracted key.
SQL_GROUPBY = """
    SELECT get_json_object(props, '$.k') AS page_key, count(*) AS views
    FROM events
    GROUP BY get_json_object(props, '$.k')
"""

# samza-sql-stream-table-join/samza.sql: enrich stream from table.
SQL_STREAM_TABLE_JOIN = """
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
"""


def _run(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


def samza_sql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_FILTER, ("events",))


def samza_sql_casewhen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_CASEWHEN, ("events",))


def samza_sql_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_GROUPBY, ("events",))


def samza_sql_stream_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_STREAM_TABLE_JOIN, ("events", "customer"))


ORACLES: dict[str, str] = {
    "samza_sql_filter": """
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_type = 'view'
    """,
    "samza_sql_casewhen": """
        SELECT event_id,
               CASE WHEN value > 100 AND json_extract_string(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END AS quality
        FROM events
    """,
    "samza_sql_groupby": """
        SELECT json_extract_string(props, '$.k') AS page_key, count(*) AS views
        FROM events GROUP BY json_extract_string(props, '$.k')
    """,
    "samza_sql_stream_table_join": """
        SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
}

QUERIES = {
    "samza_sql_filter": samza_sql_filter,
    "samza_sql_casewhen": samza_sql_casewhen,
    "samza_sql_groupby": samza_sql_groupby,
    "samza_sql_stream_table_join": samza_sql_stream_table_join,
}
