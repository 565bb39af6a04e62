"""Statistical analytics: regression trends, concentration, dispersion.

The "analyst follow-up" layer over the same facts the reference's SQL
examples aggregate — each operator is a statistical summary Spark can
compute as a pure aggregate (no window over fact tables, no UDFs):

- revenue_trend_regression : per-nation least-squares trend of the
                             monthly revenue series (``regr_slope`` /
                             ``regr_intercept`` / ``corr`` — one agg).
- order_size_distribution  : histogram of lines-per-order (two-level
                             count aggregate, all integers).
- supplier_concentration_hhi : Herfindahl–Hirschman index of supplier
                             revenue concentration per nation.
- user_event_entropy       : Shannon entropy of each user's
                             event-type mix (engagement diversity).

Scale notes: every operator is aggregates over aggregates — the first
level reduces the fact table on its natural key (one shuffle), the
second level is dimension-sized. The regression input is nations ×
months (bounded); HHI's per-nation totals are a 25-row broadcast;
entropy reuses ONE user_id shuffle for both grouping levels (the
second groupBy's key is a prefix of the first). DECIMAL(18,4)
hardening (SURVEY §4) makes every revenue sum order-independent
before it enters float math; float outputs are rounded in both
engines (two-sum entropy form proven by text_entropy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import maybe_broadcast
from ..session import load_table


def revenue_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation linear trend of monthly order revenue.

    x = months since epoch (year*12 + month — an exact integer), y =
    the month's DECIMAL-hardened revenue rounded to cents (identical
    doubles in both engines), so the regression aggregates consume
    bit-identical inputs and only the final statistics are rounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2
            ).alias("y")
        )
    )
    return monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(F.regr_slope("y", "x"), 2).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 2).alias("intercept"),
        F.round(F.corr("y", "x"), 4).alias("r"),
    )


def order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders have k line items — the order-size histogram.

    Two-level integer aggregate: lineitem reduces on l_orderkey (its
    natural key — one shuffle with map-side partials), then the
    order-sized intermediate collapses onto the tiny k keyspace
    (1..7 in TPC-H). All integers; engine-exact by construction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    return per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders"),
    )


def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-revenue concentration per nation.

    HHI = Σ_s share_s² over each supplier's share of its nation's
    lineitem revenue — the market-concentration metric. Supplier
    revenue reduces the fact table on l_suppkey; nation totals are a
    25-row relation broadcast back; the share square-sum is a bounded
    per-nation aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    )
    per_supp = (
        li.join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(maybe_broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(rev.alias("srev"))
    )
    totals = per_supp.groupBy("n_name").agg(F.sum("srev").alias("trev"))
    share = F.col("srev").cast("double") / F.col("trev").cast("double")
    return (
        per_supp.join(maybe_broadcast(totals), "n_name")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(share * share), 4).alias("hhi"),
            F.round(F.max(share), 4).alias("top_share"),
        )
    )


def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type distribution.

    Two-sum form (text_entropy's proven cross-engine shape):
    H = ln(N) − Σ n·ln(n) / N. Both grouping levels share the
    user_id shuffle — the second groupBy's key is a prefix of the
    first's, so Spark reuses the partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_type.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log(F.sum("n").cast("double"))
            - F.sum(F.col("n") * F.log(F.col("n").cast("double"))) / F.sum("n"),
            6,
        ).alias("entropy"),
    )


ORACLES: dict[str, str] = {
    "revenue_trend_regression": """
        WITH monthly AS (
            SELECT n_name,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS y
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        )
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_months,
               round(regr_slope(y, x), 2) AS slope,
               round(regr_intercept(y, x), 2) AS intercept,
               round(corr(y, x), 4) AS r
        FROM monthly GROUP BY n_name
    """,
    "order_size_distribution": """
        WITH per_order AS (
            SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
        FROM per_order GROUP BY n_lines
    """,
    "supplier_concentration_hhi": """
        WITH per_supp AS (
            SELECT n_name, s_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS srev
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        totals AS (SELECT n_name, sum(srev) AS trev FROM per_supp GROUP BY n_name)
        SELECT p.n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               round(sum((CAST(srev AS DOUBLE) / CAST(trev AS DOUBLE))
                         * (CAST(srev AS DOUBLE) / CAST(trev AS DOUBLE))), 4) AS hhi,
               round(max(CAST(srev AS DOUBLE) / CAST(trev AS DOUBLE)), 4) AS top_share
        FROM per_supp p JOIN totals t ON p.n_name = t.n_name
        GROUP BY p.n_name
    """,
    "user_event_entropy": """
        WITH per_type AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_types,
               round(ln(CAST(sum(n) AS DOUBLE))
                     - sum(n * ln(CAST(n AS DOUBLE))) / sum(n), 6) AS entropy
        FROM per_type GROUP BY user_id
    """,
}

QUERIES = {
    "revenue_trend_regression": revenue_trend_regression,
    "order_size_distribution": order_size_distribution,
    "supplier_concentration_hhi": supplier_concentration_hhi,
    "user_event_entropy": user_event_entropy,
}
