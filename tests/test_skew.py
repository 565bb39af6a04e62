"""Salted joins preserve results; bucketed joins eliminate the Exchange."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from samza_hello_samza_spark.operators.skew import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from samza_hello_samza_spark.session import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    ev = load_table(spark, SF_DIR, "events")
    cust = load_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "user_id"
    )
    plain = (
        ev.join(cust, "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    salted = (
        salted_join(ev, cust, "user_id", n_salts=4)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted((r.user_id, r.n) for r in plain) == sorted(
        (r.user_id, r.n) for r in salted
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=8)
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # result parity with the plain join
        want = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_splits_skewed_join(spark):
    """AQE's runtime skew-join split is the no-code-change complement to
    salted_join: with one hot key holding ~97% of the left side, the
    post-execution plan must mark the sort-merge join skew-handled
    (isSkew=true partitions) while producing exact results."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400_000).select(
            F.when(F.col("id") < 390_000, F.lit(0))
            .otherwise(F.col("id") % 37)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(37).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's cached
        # QueryExecution runs and its AdaptiveSparkPlan finalizes —
        # count() would build and execute a different plan.
        assert len(j.collect()) == 400_000  # exact result despite the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:2000]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
