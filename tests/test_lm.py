"""Trigram LM oracle match + BPE encode parity with a reference encoder."""

from __future__ import annotations

from samza_hello_samza_spark.operators import lm
from samza_hello_samza_spark.operators.tokenizer import bpe_train_merges
from tests.conftest import SF_DIR, assert_matches_oracle


def test_trigram_lm_oracle(spark, duck):
    assert_matches_oracle(
        spark, duck, lm.QUERIES["trigram_lm"], lm.ORACLES["trigram_lm"]
    )


def test_trigram_conditionals_sum_to_one_per_context(spark):
    """Within one context, Σ_w P(w|ctx) over ALL continuations = 1;
    the top-50 rows expose cnt/ctx_total so partial sums must be ≤ 1."""
    rows = lm.trigram_lm(spark, SF_DIR).collect()
    assert len(rows) == lm.TOP_TRIGRAMS
    from collections import defaultdict

    per_ctx = defaultdict(float)
    for r in rows:
        assert 0 < r.cond_p <= 1
        assert r.cnt <= r.ctx_total
        per_ctx[r.ctx] += r.cond_p
    assert all(s <= 1.0001 for s in per_ctx.values())


def test_bpe_encode_matches_reference(spark):
    """Spark-encoded token counts == pure-python greedy encode with the
    same merge table, for every document at sf0.001."""
    merges = [
        (m.left, m.right, m.merged)
        for m in sorted(
            bpe_train_merges(spark, SF_DIR).collect(), key=lambda m: m.rank
        )
    ]
    got = {r.doc_id: (r.n_tokens, r.n_merged) for r in lm.bpe_encode_docs(spark, SF_DIR).collect()}

    from samza_hello_samza_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for d in docs:
        n_tok = n_merged = 0
        for w in d.text.lower().split():
            toks = lm._encode_word(w, merges)
            assert "".join(toks) == w  # char conservation
            n_tok += len(toks)
            n_merged += sum(1 for t in toks if len(t) > 1)
        assert got[d.doc_id] == (n_tok, n_merged), d.doc_id


def test_bpe_encode_compresses(spark):
    """With ≥1 learned merge the corpus token count must be below the
    character count (merges fire somewhere)."""
    rows = lm.bpe_encode_docs(spark, SF_DIR).collect()
    assert sum(r.n_merged for r in rows) > 0
    assert all(r.n_tokens > 0 for r in rows)


def test_kneser_ney_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        lm.QUERIES["kneser_ney_bigram"],
        lm.ORACLES["kneser_ney_bigram"],
    )


def test_kneser_ney_probabilities_well_formed(spark):
    """0 < P_KN ≤ 1 for every emitted bigram, and each probability is
    bounded by its row-reconstructed ceiling: discounted main term
    plus the maximum continuation mass d·N₁₊(w1·)/c(w1)."""
    from samza_hello_samza_spark.operators import lm
    from tests.conftest import SF_DIR

    rows = lm.kneser_ney_bigram(spark, SF_DIR).collect()
    assert len(rows) == lm.KN_TOP_K
    for r in rows:
        assert 0 < r.p_kn <= 1, r
        assert r.c <= r.c_w1
        assert r.n_follow >= 1 and r.n_precede >= 1
        # the discounted MAIN term never exceeds the MLE; the
        # continuation term adds back at most d·N₁₊(w1·)/c(w1)
        # (Pcont ≤ 1) — reconstruct the bound from the row's counts
        upper = (r.c - lm.KN_DISCOUNT) / r.c_w1 + (
            lm.KN_DISCOUNT * r.n_follow / r.c_w1
        )
        assert r.p_kn <= upper + 1e-6, r
