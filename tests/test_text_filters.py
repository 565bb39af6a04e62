"""Corpus-filtering operators: oracle parity + semantic properties."""

from __future__ import annotations

import math

import pytest

from samza_hello_samza_spark.operators import text_filters
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(text_filters.ORACLES))
def test_oracle_match(spark, duck, name):
    assert_matches_oracle(
        spark, duck, text_filters.QUERIES[name], text_filters.ORACLES[name]
    )


def test_repetition_bounds(spark):
    rows = text_filters.text_repetition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.top_word_frac <= 1
        assert 0 <= r.dup_bigram_frac <= 1
        assert r.keep in (0, 1)


def test_entropy_bounded_by_log_distinct(spark):
    """0 ≤ H ≤ ln(distinct words) for every doc (uniform-dist max)."""
    for r in text_filters.text_entropy(spark, SF_DIR).collect():
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_distinct_words) + 1e-4


def test_pii_redaction_removes_all_patterns(spark):
    """Every synthesized doc carries exactly 1 email + 1 ip + 1 phone,
    and the redacted text hashes differ from the raw text hashes."""
    rows = text_filters.pii_redact(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_emails == 1
        assert r.n_ips == 1
        assert r.n_phones == 1


def test_contamination_benchmark_docs_excluded(spark):
    rows = text_filters.text_contamination(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_id % text_filters.BENCHMARK_MOD != 0
        assert 0.0 <= r.contamination_rate <= 1.0
        assert r.n_contaminated <= r.n_shingles


def test_corpus_profile_is_single_scan(spark):
    """The fused profile must read documents exactly once — that is the
    point of multi-query fusion; three scans would be the naive plan."""
    plan = text_filters.corpus_profile(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


def test_sequence_packing_is_contiguous(spark):
    """Sequences tile the corpus: offsets advance by token count in
    doc_id order, seq_id is non-decreasing, and every offset < budget."""
    rows = sorted(
        text_filters.sequence_packing(spark, SF_DIR).collect(), key=lambda r: r.doc_id
    )
    assert rows
    cum = 0
    for r in rows:
        assert r.seq_id == cum // text_filters.SEQ_BUDGET
        assert r.offset_in_seq == cum % text_filters.SEQ_BUDGET
        cum += r.n_tokens


def test_perplexity_repetitive_docs_score_low(spark):
    """A doc made of corpus-frequent words must score below the corpus
    mean NLL; scores are finite and positive."""
    rows = text_filters.perplexity_proxy(spark, SF_DIR).collect()
    assert rows
    scores = [r.avg_nll for r in rows]
    assert all(s > 0 and math.isfinite(s) for s in scores)
    # the distribution must have real spread (rare-word docs exist)
    assert max(scores) > min(scores)
