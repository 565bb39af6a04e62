"""Bucketed co-located joins: the Exchange must disappear."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources import bucketing
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("buckets"))
    names = bucketing.materialize_bucketed_facts(spark, SF_DIR, base, n_buckets=8)
    yield names
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    joined = bucketing.co_located_join(spark, bucketed)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, bucketed):
    joined = bucketing.co_located_join(spark, bucketed)
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert joined.count() == plain.count()


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    li = spark.table(bucketed["lineitem"])
    agg = li.groupBy("l_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
