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


def test_vocab_coverage_monotone(spark):
    from samza_hello_samza_spark.operators import text_filters as tf

    rows = {r.k: r for r in tf.vocab_coverage(spark, SF_DIR).collect()}
    assert list(sorted(rows)) == [10, 100, 1000]
    assert rows[10].coverage <= rows[100].coverage <= rows[1000].coverage <= 1.0
    assert rows[10].covered_tokens > 0
    assert len({r.total_tokens for r in rows.values()}) == 1


def test_novelty_bounds_and_duplicate_doc_zero(spark, tmp_path):
    from samza_hello_samza_spark.operators import text_filters as tf

    rows = {r.doc_id: r for r in tf.text_novelty(spark, SF_DIR).collect()}
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_unique <= r.n_bigrams
    # synthetic corpus: doc 2 duplicates doc 1 -> both novelty 0;
    # doc 3 is disjoint -> novelty 1
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "s", 22),
            (2, "alpha beta gamma delta", "en", "s", 22),
            (3, "omega psi chi phi", "en", "s", 17),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "novelty_sf")
    import os

    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    tiny = {r.doc_id: r.novelty for r in tf.text_novelty(spark, d).collect()}
    assert tiny[1] == 0.0 and tiny[2] == 0.0
    assert tiny[3] == 1.0


def test_boilerplate_detects_planted_template(spark, tmp_path):
    from samza_hello_samza_spark.operators import text_filters as tf

    docs = spark.createDataFrame(
        [
            (1, "subscribe to our newsletter. unique thought one.", "en", "s", 48),
            (2, "subscribe to our newsletter. another idea here.", "en", "s", 47),
            (3, "subscribe to our newsletter. third musing now.", "en", "s", 46),
            (4, "completely original text! nothing shared at all?", "en", "s", 48),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import os

    d = str(tmp_path / "bp_sf")
    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r for r in tf.boilerplate_lines(spark, d).collect()}
    for i in (1, 2, 3):
        assert got[i].n_boilerplate == 1 and got[i].n_sentences == 2, got[i]
        assert got[i].boilerplate_share == 0.5
    assert got[4].n_boilerplate == 0


def test_doc_length_histogram_accounts_for_all_docs(spark):
    from samza_hello_samza_spark.operators import text_filters as tf
    from samza_hello_samza_spark.session import load_table

    rows = tf.doc_length_histogram(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-3


def test_contamination_bloom_is_exact_and_prunes(spark):
    """Bloom-prefiltered decontamination ≡ the exact join, and the
    prefilter actually prunes the probe input (the 100 TB win)."""
    tf = text_filters
    exact = sorted(
        map(tuple, tf.text_contamination(spark, SF_DIR).collect())
    )
    bloom = sorted(
        map(tuple, tf.contamination_bloom(spark, SF_DIR).collect())
    )
    assert bloom == exact

    # membership predicate admits every benchmark hash (no false negatives)
    import pyspark.sql.functions as F

    from samza_hello_samza_spark.operators.dedup import _shingles, _words
    from samza_hello_samza_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sh = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(_shingles(_words(F.col("text")), k=tf.SHINGLE_K), F.md5)
        ).alias("sh"),
    )
    bench = (
        sh.filter(F.col("doc_id") % tf.BENCHMARK_MOD == 0)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    hashes = [r["h"] for r in bench.collect()]
    signed, n_bits = tf.build_bloom(hashes)
    probe = (
        bench.withColumn("bloom_bits", F.lit(signed))
        .filter(F.expr(tf._bloom_member_sql(n_bits)))
    )
    assert probe.count() == len(hashes)  # all true members pass

    # and non-members are mostly rejected: corpus shingles NOT in the
    # benchmark should survive the bloom at ~fp-rate, far below 50%
    corpus_h = (
        sh.filter(F.col("doc_id") % tf.BENCHMARK_MOD != 0)
        .select(F.explode("sh").alias("h"))
        .join(bench, "h", "left_anti")
    )
    n_nonmember = corpus_h.count()
    n_pass = (
        corpus_h.withColumn("bloom_bits", F.lit(signed))
        .filter(F.expr(tf._bloom_member_sql(n_bits)))
        .count()
    )
    assert n_nonmember > 0
    assert n_pass < 0.5 * n_nonmember, (n_pass, n_nonmember)


def test_zipf_slope_is_negative_powerlaw(spark):
    r = text_filters.zipf_slope(spark, SF_DIR).collect()[0]
    assert 0 < r.n_words <= text_filters.ZIPF_TOP_K
    assert r.slope < 0  # frequency falls with rank, always
    assert -1.0 <= r.r < 0  # strong negative log-log correlation


def test_sequence_packing_curriculum_packs_each_cell_independently(spark):
    """Per-(lang, stage) budget conservation (VERDICT r04 #9): inside
    every curriculum cell the packing is exactly the contiguous
    single-stream tiling (offsets advance by token count in doc_id
    order, seq_id = cum // budget), cells restart at offset 0, and
    the stage column agrees with curriculum_assign."""
    from samza_hello_samza_spark.operators.sampling import curriculum_assign

    rows = text_filters.sequence_packing_curriculum(spark, SF_DIR).collect()
    assert rows
    stages = {r.doc_id: r.stage for r in curriculum_assign(spark, SF_DIR).collect()}
    cells: dict[tuple, list] = {}
    for r in rows:
        assert stages[r.doc_id] == r.stage
        cells.setdefault((r.lang, r.stage), []).append(r)
    assert len(cells) > 1  # the composition actually splits the corpus
    for cell, docs in cells.items():
        cum = 0
        for r in sorted(docs, key=lambda x: x.doc_id):
            assert r.seq_id == cum // text_filters.SEQ_BUDGET, (cell, r)
            assert r.offset_in_seq == cum % text_filters.SEQ_BUDGET, (cell, r)
            cum += r.n_tokens


def test_c4_rules_fire_on_planted_markers(spark):
    """The deterministic synthetic page plants every C4 violation on a
    known doc_id schedule — assert each page rule fires exactly on its
    schedule, kept lines all satisfy the line rules, and keep == the
    conjunction of the page rules (Raffel et al. 2020 §2.2)."""
    rows = text_filters.c4_quality_filters(spark, SF_DIR).collect()
    assert rows
    saw_keep = saw_drop = 0
    for r in rows:
        assert r.has_lorem_ipsum == (1 if r.doc_id % 13 == 0 else 0)
        assert r.has_badword == (1 if r.doc_id % 11 == 0 else 0)
        for line in (r.clean_text.split("\n") if r.clean_text else []):
            assert line[-1] in '.!?"', (r.doc_id, line)
            assert len(line.split(" ")) >= text_filters.C4_MIN_LINE_WORDS
            assert "javascript" not in line
        assert r.n_kept_lines == (
            len(r.clean_text.split("\n")) if r.clean_text else 0
        )
        expect_keep = (
            r.n_sentences >= text_filters.C4_MIN_SENTENCES
            and not (r.has_brace or r.has_lorem_ipsum or r.has_badword)
            and r.lang_en == 1
        )
        assert r.keep == int(expect_keep), r
        saw_keep += r.keep
        saw_drop += 1 - r.keep
    assert saw_keep > 0 and saw_drop > 0  # both branches exercised
