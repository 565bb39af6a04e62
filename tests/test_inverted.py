"""Inverted posting-list layout: bucket-pruned conjunctive search."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samza_hello_samza_spark.operators.text_analysis import SEARCH_TERMS, term_search
from samza_hello_samza_spark.sources import inverted
from tests.conftest import SF_DIR


def test_conjunctive_search_equals_scan_plan(spark):
    """The indexed query returns exactly the corpus-scan plan's docs."""
    got = sorted(r.doc_id for r in inverted.term_search_indexed(spark, SF_DIR).collect())
    want = sorted(r.doc_id for r in term_search(spark, SF_DIR).collect())
    assert got == want and got


def test_probe_lists_only_term_buckets(spark):
    """The indexed query's scan carries the bucket partition filter —
    ≤|terms| of N_TBUCKETS directories are listed (same
    PartitionFilters assertion as the ANN layout probes)."""
    index_dir = inverted._documents_index(spark, SF_DIR)
    buckets = inverted.term_buckets(spark, list(SEARCH_TERMS))
    assert len(buckets) <= len(SEARCH_TERMS)
    plan = (
        inverted.term_search_indexed(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "tbucket" in plan
    all_buckets = {
        e.split("=")[1]
        for e in os.listdir(index_dir)
        if e.startswith("tbucket=")
    }
    assert len(all_buckets) > len(buckets)  # the index really is wider


def test_build_and_query_small_corpus(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "spark join window functions"),
            (2, "spark join only"),
            (3, "window spark nothing else"),
            (4, "spark join window again and again"),
            (5, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    out = inverted.build_inverted_index(
        spark, docs, os.path.join(str(tmp_path), "inv")
    )
    got = sorted(
        r.doc_id
        for r in inverted.conjunctive_search(
            spark, out, ["spark", "join", "window"]
        ).collect()
    )
    assert got == [1, 4]
    # postings are SETS: repeated terms in doc 4 contribute one row
    n4 = (
        spark.read.parquet(out)
        .filter((F.col("doc_id") == 4) & (F.col("word") == "again"))
        .count()
    )
    assert n4 == 1
