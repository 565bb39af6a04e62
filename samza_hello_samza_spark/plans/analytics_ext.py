"""Analytics core, part 2: the remaining TPC-H-shaped plans (Q7-Q21).

Completes the analytics surface started in ``analytics.py`` with the
query shapes that stress different Catalyst paths: multi-condition
join graphs (Q7/Q8/Q9), scalar-subquery thresholds (Q11), outer-join
distributions (Q13), argmax-vs-scalar-max (Q15), correlated-average
filters (Q17), nested semi-joins (Q20), and the exists/not-exists
self-join that we re-plan as a per-group aggregate (Q21).

This schema has no ``partsupp`` and no commit/receipt dates, so each
query keeps the *plan shape* of its TPC-H namesake over the columns
that exist (``p_retailprice`` plays supplycost, ``l_returnflag='R'``
plays "late delivery").

Scale notes (100 TB): every dim joins via explicit ``broadcast``;
facts shuffle only on their join keys; scalar subqueries (Q11 total,
Q15 max) are 1-row broadcasts, never global windows; Q21 avoids the
classic double self-join of lineitem by collapsing the EXISTS /
NOT EXISTS pair into one per-order aggregate + one join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import maybe_broadcast
from ..session import load_table


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    supplier/customer/nation all broadcast — the only shuffle is
    lineitem⋈orders on orderkey. The disjunctive nation-pair predicate
    evaluates post-join in one codegen stage.
    """
    n1 = "NATION_1"
    n2 = "NATION_2"
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(n1, n2)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    pair_ok = (
        (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2)
    ) | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market per year.

    Numerator and denominator fold into a single aggregate pass (a
    conditional sum over the same joined rows), so the fact side is
    scanned and shuffled exactly once.
    """
    target = "NATION_1"
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust_nation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target, volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year.

    ``p_retailprice`` stands in for ps_supplycost (no partsupp here):
    profit = revenue − 0.6·retail·qty. part/supplier/nation broadcast;
    the single fact shuffle is the final groupBy.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stocked value clears a global threshold.

    Per-part value aggregates first (map-side partial sums); the
    corpus-total threshold is a 1-row broadcast cross join — the
    HAVING > scalar-subquery plan with no second scan of the agg.
    """
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 0
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (
        li.join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("part_value"))
    )
    total = per_part.agg(
        (F.sum("part_value") * F.lit(0.0005)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (incl. zero).

    The zero bucket forces a *left outer* join with the filter inside
    the join condition (a WHERE would silently drop the nulls). Two
    aggregates: per-customer count, then histogram of counts.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The revenue view aggregates once; its max is a 1-row broadcast
    joined back on equality — the scalar-subquery plan without
    rescanning lineitem. Revenue is pre-rounded so the float max and
    the equality test agree across engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders.

    The correlated per-part AVG subquery becomes aggregate-then-join:
    per-part thresholds are computed in one pass and joined back on
    partkey (AQE broadcasts the agg side when it's small; at 100 TB
    both sides shuffle on partkey once). Threshold pre-rounded to 6dp
    so the boundary comparison can't flip on cross-engine float noise.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#11"
    )
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(F.lit(0.5) * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.coalesce(
                F.round(F.sum("l_extendedprice") / 7.0, 2), F.lit(0.0)
            ).alias("avg_yearly")
        )
    )


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with significant stock of promo parts.

    Nested IN subqueries become a chain: part filter broadcasts into
    the lineitem agg, the HAVING filter narrows to qualifying
    suppkeys, and supplier left-semi joins that key set. Region filter
    on the supplier's nation broadcasts.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    qualifying = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
        )
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: sole-blame suppliers on multi-supplier orders.

    ``l_returnflag = 'R'`` plays "late". The classic plan is two
    correlated self-joins of lineitem (EXISTS other-supplier, NOT
    EXISTS other-late-supplier); we collapse both into ONE per-order
    aggregate — distinct suppliers and distinct late suppliers — and
    join it back. A row qualifies iff its supplier is late, the order
    has ≥2 suppliers, and exactly one supplier was late (necessarily
    this one). Two shuffles on orderkey replace three.
    """
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    lif = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).drop("o_orderkey")
    order_stats = lif.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    late_lines = lif.filter(F.col("l_returnflag") == "R")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        late_lines.join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


ORACLES: dict[str, str] = {
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(CASE WHEN n2.n_name = 'NATION_1'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'ECONOMY'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1998-01-01'
        GROUP BY 1
    """,
    "q9_product_profit": """
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INTEGER) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "q11_important_parts": """
        WITH per_part AS (
            SELECT l_partkey, sum(l_extendedprice * l_quantity) AS part_value
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_regionkey = 0
            )
            GROUP BY l_partkey
        )
        SELECT l_partkey, round(part_value, 2) AS part_value
        FROM per_part
        WHERE part_value > (SELECT sum(part_value) * 0.0005 FROM per_part)
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "q17_small_quantity_revenue": """
        SELECT coalesce(round(sum(l_extendedprice) / 7.0, 2), 0.0) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN (
            SELECT l_partkey AS t_partkey,
                   round(0.5 * avg(l_quantity), 6) AS qty_threshold
            FROM lineitem
            GROUP BY l_partkey
        ) t ON l_partkey = t_partkey
        WHERE p_brand = 'Brand#11'
          AND l_quantity < qty_threshold
    """,
    "q20_part_promotion": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey = 1
          )
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(l_quantity) > 50
          )
    """,
    "q21_suppliers_waiting": """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
}

QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_part_promotion": q20_part_promotion,
    "q21_suppliers_waiting": q21_suppliers_waiting,
}
