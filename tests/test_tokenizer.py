"""Distributed BPE training vs a pure-python reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import tokenizer
from samza_hello_samza_spark.session import load_table
from tests.conftest import SF_DIR


def _reference_bpe(word_freq: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016 alg. 1) with the same
    deterministic tie-break as the operator."""
    vocab = {w: [c for c in w] for w in word_freq}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (left, right), cnt = best
        merges.append((rank, left, right, left + right, cnt))
        merged = left + right
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from samza_hello_samza_spark.operators.dedup import _words

    freq = {
        r.word: r.freq
        for r in docs.select(F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    want = _reference_bpe(freq, tokenizer.N_MERGES)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in sorted(
            tokenizer.bpe_train_merges(spark, SF_DIR).collect(), key=lambda r: r.rank
        )
    ]
    assert got == want


def test_bpe_is_deterministic(spark):
    a = [tuple(r) for r in tokenizer.bpe_train_merges(spark, SF_DIR).collect()]
    b = [tuple(r) for r in tokenizer.bpe_train_merges(spark, SF_DIR).collect()]
    assert a == b


def test_bpe_merge_counts_non_increasing_in_spirit(spark):
    """Each merge's pair count is positive, and later merges never beat
    the first (greedy argmax takes the global max first)."""
    rows = sorted(
        tokenizer.bpe_train_merges(spark, SF_DIR).collect(), key=lambda r: r.rank
    )
    assert rows
    assert all(r.pair_count > 0 for r in rows)
    assert rows[0].pair_count == max(r.pair_count for r in rows)


def test_bpe_batched_rounds_use_fewer_jobs_than_one_per_merge(spark):
    """The r05 batched trainer must replay the EXACT one-merge-at-a-
    time merge list (the _accept_batch equivalence guard) while
    scheduling strictly fewer Spark jobs than the 1-argmax-per-merge
    loop it replaced (VERDICT r04 #8) — measured with the job-group
    listener on identical input."""
    from samza_hello_samza_spark.operators.dedup import explode_nonempty

    def one_per_merge(spark, sf_dir):
        vocab = tokenizer._word_freq(spark, sf_dir).select(
            "word",
            "freq",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("symbols"),
        ).localCheckpoint()
        merges = []
        for rank in range(tokenizer.N_MERGES):
            best = (
                explode_nonempty(
                    vocab, ["freq"], tokenizer._adjacent_pairs(F.col("symbols")), "pair"
                )
                .groupBy("pair")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right = best[0].pair.split(" ", 1)
            merges.append((rank, left, right, left + right, int(best[0].cnt)))
            vocab = vocab.withColumn(
                "symbols", tokenizer._merge_udf([(left, right)])(F.col("symbols"))
            ).localCheckpoint()
        return merges

    sc = spark.sparkContext
    one_per_merge(spark, SF_DIR)  # codegen warmup, uncounted
    sc.setJobGroup("bpe_old", "one merge per job round-trip")
    old = one_per_merge(spark, SF_DIR)
    n_old = len(sc.statusTracker().getJobIdsForGroup("bpe_old"))
    sc.setJobGroup("bpe_new", "batched rounds")
    new = [
        (r.rank, r.left, r.right, r.merged, int(r.pair_count))
        for r in tokenizer.bpe_train_merges(spark, SF_DIR).collect()
    ]
    n_new = len(sc.statusTracker().getJobIdsForGroup("bpe_new"))
    sc.setJobGroup("bpe_done", "")
    assert new == old  # identical merge list, counts included
    assert n_new < n_old, (n_new, n_old)


# -- unigram-LM trainer (SentencePiece flavor, r06) --------------------------


def _reference_unigram(word_freq: dict[str, int]):
    """Single-machine replay of the distributed trainer: same seed
    enumeration, same hard-EM rounds (sharing ``_viterbi_segment`` so
    the parity claim targets the DISTRIBUTED aggregation), same prune
    and final normalize."""
    from collections import Counter

    t = tokenizer
    chars: Counter = Counter()
    subs: Counter = Counter()
    for w, f in word_freq.items():
        for ch in w:
            chars[ch] += f
        for i in range(min(len(w), t.SEED_WORD_MAX_LEN)):
            for j in range(i + 2, min(len(w), i + t.SEED_SUBSTR_MAX_LEN) + 1):
                subs[w[i:j]] += f
    top_multi = dict(
        sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[: t.SEED_K]
    )
    logp = t._normalize({**chars, **top_multi})

    def estep(lp):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            for piece in t._viterbi_segment(w, lp, t.SEED_SUBSTR_MAX_LEN) or []:
                counts[piece] += f
        out = dict(counts)
        for c in chars:
            out.setdefault(c, 1)
        return out

    counts: dict[str, int] = {}
    for _ in range(t.UNIGRAM_EM_ITERS):
        counts = estep(logp)
        logp = t._normalize(counts)
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )
    keep = dict(multi[: max(0, t.UNIGRAM_VOCAB_K - len(chars))])
    logp = t._normalize(
        {p: c for p, c in counts.items() if len(p) == 1 or p in keep}
    )
    counts = estep(logp)
    logp = t._normalize(counts)
    rows = sorted(counts.items(), key=lambda x: (-x[1], x[0]))
    return [
        (i, p, len(p), c, int(logp[p] * 1e6)) for i, (p, c) in enumerate(rows)
    ]


def _word_freq_dict(spark):
    from samza_hello_samza_spark.operators.dedup import _words

    docs = load_table(spark, SF_DIR, "documents")
    return {
        r.word: r.freq
        for r in docs.select(F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }


def test_unigram_matches_reference(spark):
    want = _reference_unigram(_word_freq_dict(spark))
    got = [
        (r.rank, r.piece, r.n_chars, r.piece_count, r.logprob_micronats)
        for r in sorted(
            tokenizer.unigram_train_vocab(spark, SF_DIR).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert got == want


def test_unigram_covers_every_corpus_char_and_roundtrips(spark):
    """Coverage: every character of every corpus word is a vocab piece
    (so no word is unsegmentable — including chars past the substring
    seed window); round-trip: Viterbi pieces concatenate back to the
    word for a sample of words."""
    import math

    rows = tokenizer.unigram_train_vocab(spark, SF_DIR).collect()
    pieces = {r.piece for r in rows}
    logp = {
        r.piece: r.logprob_micronats / 1e6 for r in rows
    }
    freq = _word_freq_dict(spark)
    corpus_chars = {ch for w in freq for ch in w}
    assert corpus_chars <= pieces

    multi = [r for r in rows if r.n_chars > 1]
    assert multi, "no multi-char piece survived — vocab degenerate"
    sample = sorted(freq, key=lambda w: (-freq[w], w))[:50]
    for w in sample:
        seg = tokenizer._viterbi_segment(w, logp, tokenizer.SEED_SUBSTR_MAX_LEN)
        assert seg and "".join(seg) == w

    # probabilities form a distribution (micronat truncation slack)
    total = sum(math.exp(r.logprob_micronats / 1e6) for r in rows)
    assert abs(total - 1.0) < 1e-3


def test_unigram_is_deterministic(spark):
    a = [tuple(r) for r in tokenizer.unigram_train_vocab(spark, SF_DIR).collect()]
    b = [tuple(r) for r in tokenizer.unigram_train_vocab(spark, SF_DIR).collect()]
    assert a == b


# -- unigram encode twin (r06) ----------------------------------------------


def test_unigram_encode_matches_pure_python_reference(spark):
    """The distributed Arrow encode pass must agree doc-for-doc with a
    single-machine replay using the SAME trained artifact and the same
    integer-micronat Viterbi — the parity claim targets the
    distributed plumbing (batching, memo cache, null handling), not
    the DP itself (shared helper)."""
    art = sorted(
        tokenizer.unigram_train_vocab(spark, SF_DIR).collect(), key=lambda r: r.rank
    )
    logp = {r.piece: int(r.logprob_micronats) for r in art}
    max_len = max(len(p) for p in logp)

    docs = {
        r.doc_id: (r.text, r.n_chars)
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    }

    def ref_stats(text):
        n_p = n_m = 0
        for w in text.lower().split():
            pieces = tokenizer._viterbi_segment(w, logp, max_len) or list(w)
            assert "".join(pieces) == w  # char conservation, every word
            n_p += len(pieces)
            n_m += sum(1 for p in pieces if len(p) > 1)
        return n_p, n_m

    got = {
        r.doc_id: (r.n_pieces, r.n_multi, r.chars_per_piece)
        for r in tokenizer.unigram_encode_docs(spark, SF_DIR).collect()
    }
    assert set(got) == set(docs)
    for doc_id, (text, n_chars) in docs.items():
        n_p, n_m, cpp = *ref_stats(text), got[doc_id][2]
        assert got[doc_id][:2] == (n_p, n_m), doc_id
        # integer counts carry the parity claim; the ratio is only
        # sanity-checked (Spark HALF_UP vs python banker's rounding)
        if n_p:
            assert abs(cpp - n_chars / n_p) < 1e-3, doc_id


def test_unigram_encode_compresses_vs_chars(spark):
    """A trained subword vocab must beat char-level tokenization in
    aggregate: total pieces < total chars, and some multi-char pieces
    are actually used."""
    agg = (
        tokenizer.unigram_encode_docs(spark, SF_DIR)
        .agg(
            F.sum("n_pieces").alias("p"),
            F.sum("n_multi").alias("m"),
        )
        .first()
    )
    assert agg.m > 0
    n_word_chars = (
        load_table(spark, SF_DIR, "documents")
        .select(
            F.aggregate(
                F.transform(
                    F.split(F.lower(F.col("text")), r"\s+"),
                    lambda w: F.length(w),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("c")
        )
        .agg(F.sum("c"))
        .first()[0]
    )
    assert agg.p < n_word_chars


# -- full-EM unigram refinement (r06) ---------------------------------------


def _reference_unigram_em(word_freq: dict[str, int]):
    """Single-machine replay of the FULL-EM trainer: same seed, same
    forward-backward micro-truncated E-step (sharing
    ``_fb_expected_micro`` so the parity claim targets the distributed
    integer aggregation), same prune and final normalize."""
    from collections import Counter

    t = tokenizer
    chars: Counter = Counter()
    subs: Counter = Counter()
    for w, f in word_freq.items():
        for ch in w:
            chars[ch] += f
        for i in range(min(len(w), t.SEED_WORD_MAX_LEN)):
            for j in range(i + 2, min(len(w), i + t.SEED_SUBSTR_MAX_LEN) + 1):
                subs[w[i:j]] += f
    chars_m = {p: c * 1_000_000 for p, c in chars.items()}
    top_multi = {
        p: c * 1_000_000
        for p, c in sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[: t.SEED_K]
    }
    logp = t._normalize({**chars_m, **top_multi})

    def estep(lp):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            for piece, micro in t._fb_expected_micro(w, lp, t.SEED_SUBSTR_MAX_LEN):
                counts[piece] += f * micro
        out = dict(counts)
        for c in chars:
            out.setdefault(c, 1)
        return out

    counts: dict[str, int] = {}
    for _ in range(t.UNIGRAM_EM_ITERS):
        counts = estep(logp)
        logp = t._normalize(counts)
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )
    keep = dict(multi[: max(0, t.UNIGRAM_VOCAB_K - len(chars))])
    logp = t._normalize(
        {p: c for p, c in counts.items() if len(p) == 1 or p in keep}
    )
    counts = estep(logp)
    logp = t._normalize(counts)
    rows = sorted(counts.items(), key=lambda x: (-x[1], x[0]))
    return [
        (i, p, len(p), c, int(logp[p] * 1e6)) for i, (p, c) in enumerate(rows)
    ]


def test_unigram_em_matches_pure_python_reference(spark):
    want = _reference_unigram_em(_word_freq_dict(spark))
    got = [
        (r.rank, r.piece, r.n_chars, r.expected_micro, r.logprob_micronats)
        for r in sorted(
            tokenizer.unigram_train_vocab_em(spark, SF_DIR).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert got == want


def test_unigram_em_beats_hard_on_marginal_likelihood(spark):
    """The refinement claim: expected-count (soft) EM yields a vocab
    with LOWER freq-weighted corpus marginal NLL (forward-algorithm
    likelihood over all segmentations) than the Viterbi hard-EM vocab
    trained with the identical seed/rounds/prune structure."""
    freq = _word_freq_dict(spark)

    def nll(rows):
        logp = {r.piece: r.logprob_micronats / 1e6 for r in rows}
        tot = 0.0
        for w, f in freq.items():
            n = len(w)
            NEG = float("-inf")
            a = [NEG] * (n + 1)
            a[0] = 0.0
            for i in range(1, n + 1):
                acc = [
                    a[i - l] + logp[w[i - l : i]]
                    for l in range(1, min(tokenizer.SEED_SUBSTR_MAX_LEN, i) + 1)
                    if w[i - l : i] in logp and a[i - l] != NEG
                ]
                a[i] = tokenizer._logsumexp(acc)
            assert a[n] != NEG, w  # coverage in BOTH vocabs
            tot -= f * a[n]
        return tot

    em = nll(tokenizer.unigram_train_vocab_em(spark, SF_DIR).collect())
    hard = nll(tokenizer.unigram_train_vocab(spark, SF_DIR).collect())
    assert em < hard, (em, hard)


def test_unigram_em_covers_chars_and_is_deterministic(spark):
    rows_a = tokenizer.unigram_train_vocab_em(spark, SF_DIR).collect()
    rows_b = tokenizer.unigram_train_vocab_em(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows_a] == [tuple(r) for r in rows_b]
    pieces = {r.piece for r in rows_a}
    corpus_chars = {ch for w in _word_freq_dict(spark) for ch in w}
    assert corpus_chars <= pieces
    assert any(r.n_chars > 1 for r in rows_a)


# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------


def test_wordpiece_matches_reference(spark):
    from samza_hello_samza_spark.operators import tokenizer_wp

    freq = _word_freq_dict(spark)
    want = tokenizer_wp.wordpiece_reference_train(freq, tokenizer_wp.N_WP_MERGES)
    got = [
        (r.left, r.right, r.merged, r.pair_count, r.left_count, r.right_count)
        for r in sorted(
            tokenizer_wp.wordpiece_train_vocab(spark, SF_DIR).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert got == want


def test_wordpiece_is_deterministic(spark):
    from samza_hello_samza_spark.operators import tokenizer_wp

    a = [tuple(r) for r in tokenizer_wp.wordpiece_train_vocab(spark, SF_DIR).collect()]
    b = [tuple(r) for r in tokenizer_wp.wordpiece_train_vocab(spark, SF_DIR).collect()]
    assert a == b and len(a) == tokenizer_wp.N_WP_MERGES


def test_wordpiece_merges_are_continuation_joins(spark):
    """Every merged piece must splice out exactly one ## and the score
    numerator can never exceed either denominator count."""
    from samza_hello_samza_spark.operators import tokenizer_wp

    rows = tokenizer_wp.wordpiece_train_vocab(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.right.startswith("##")
        assert r.merged == tokenizer_wp._wp_join(r.left, r.right)
        assert r.pair_count <= r.left_count
        assert r.pair_count <= r.right_count


def test_wordpiece_encode_matches_reference_and_covers(spark):
    """Distributed encode ≡ pure-python greedy longest-match on every
    doc; alphabet coverage means zero UNKs; token chars reassemble the
    word (round-trip conservation)."""
    from samza_hello_samza_spark.operators import tokenizer_wp

    freq = _word_freq_dict(spark)
    merges = tokenizer_wp.wordpiece_reference_train(freq, tokenizer_wp.N_WP_MERGES)
    alphabet = set()
    for w in freq:
        alphabet.update(tokenizer_wp._wp_symbols(w))
    vocab = alphabet | {m[2] for m in merges}
    max_piece = max(len(p) - (2 if p.startswith("##") else 0) for p in vocab)

    # round-trip + reference stats per word
    per_word = {}
    for w in freq:
        toks = tokenizer_wp.wordpiece_encode_word(w, vocab, max_piece)
        assert toks != [tokenizer_wp.WP_UNK]
        assert "".join(t[2:] if t.startswith("##") else t for t in toks) == w
        per_word[w] = (
            len(toks),
            sum(1 for t in toks if t.startswith("##")),
        )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_continuations, r.n_unk)
        for r in tokenizer_wp.wordpiece_encode_docs(spark, SF_DIR).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        nt = nc = 0
        for w in text.lower().split():
            t, c = per_word[w]
            nt += t
            nc += c
        assert got[doc_id] == (nt, nc, 0), doc_id
