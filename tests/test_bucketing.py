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


@pytest.fixture(scope="module")
def bucketed_docs(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("doc_buckets"))
    name = bucketing.materialize_bucketed_documents(spark, SF_DIR, base, n_buckets=8)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_dedup_has_no_exchange(spark, bucketed_docs):
    plan = (
        bucketing.dedup_exact_bucketed(spark, bucketed_docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_bucketed_dedup_matches_operator(spark, bucketed_docs):
    from samza_hello_samza_spark.operators.dedup import dedup_exact

    got = sorted(
        (r.doc_id, r.canonical_doc_id, r.is_duplicate)
        for r in bucketing.dedup_exact_bucketed(spark, bucketed_docs).collect()
    )
    want = sorted(
        (r.doc_id, r.canonical_doc_id, r.is_duplicate)
        for r in dedup_exact(spark, SF_DIR).collect()
    )
    assert got == want
