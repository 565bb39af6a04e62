"""Sampling & mixture operators: oracle parity + semantic/plan properties."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.operators import sampling
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sampling.ORACLES))
def test_oracle_match(spark, duck, name):
    assert_matches_oracle(
        spark, duck, sampling.QUERIES[name], sampling.ORACLES[name]
    )


def test_mixture_flattens_toward_uniform(spark):
    """Temperature sampling must flatten the mixture: keep-rates are
    anti-monotone in natural share (rarer language → ≥ rate), the
    dominant language keeps 100%, and the *expected* sample ratio
    (n·rate) strictly shrinks vs the natural max/min ratio. (Asserting
    on realized counts would be flaky at sf0.001 — ~70 docs per
    language of md5-bucket noise.)"""
    from samza_hello_samza_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    natural = {r.lang: r.cnt for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    sampled = sampling.mixture_sample(spark, SF_DIR)
    rates = {r.lang: r.rate_pct for r in sampled.select("lang", "rate_pct").distinct().collect()}
    assert set(rates) == set(natural)
    for a in natural:
        for b in natural:
            if natural[a] > natural[b]:
                assert rates[a] <= rates[b], (a, b, rates)
    rarest = min(natural, key=natural.get)
    assert rates[rarest] == 100
    # the rarest language keeps every md5 bucket → all its docs survive
    rare_kept = sampled.filter(sampled.lang == rarest).count()
    assert rare_kept == natural[rarest]
    expected = {lang: natural[lang] * rates[lang] / 100 for lang in natural}
    nat_ratio = max(natural.values()) / min(natural.values())
    exp_ratio = max(expected.values()) / min(expected.values())
    assert exp_ratio < nat_ratio


def test_mixture_is_deterministic(spark):
    a = {r.doc_id for r in sampling.mixture_sample(spark, SF_DIR).collect()}
    b = {r.doc_id for r in sampling.mixture_sample(spark, SF_DIR).collect()}
    assert a == b


def test_weighted_sample_favors_heavy_docs(spark):
    """A-ES with weight = n_chars: the sampled docs' mean length must
    exceed the corpus mean (long docs are proportionally likelier)."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample = sampling.weighted_sample(spark, SF_DIR)
    assert sample.count() == sampling.WEIGHTED_K
    sample_mean = sample.agg(F.avg("weight")).first()[0]
    assert sample_mean > corpus_mean


def test_weighted_sample_is_distributed_topk(spark):
    """The draw must plan as TakeOrderedAndProject — per-partition heaps
    + single k-row merge — not a global Sort."""
    plan = (
        sampling.weighted_sample(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_quality_classifier_no_shuffle_no_python(spark):
    """fasttext-shaped inference rides the scan: one FileScan, zero
    computation-required shuffles, zero BatchEvalPython. The only
    exchange allowed is the r12 scan-parallelism floor (a round-robin
    spread of an under-parallel committed layout — session.load_table;
    a no-op when the layout has ≥ cores files, i.e. at scale): the
    inference itself must never need a hash repartition."""
    plan = (
        sampling.quality_classifier(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_quality_classifier_keep_matches_prob(spark):
    for r in sampling.quality_classifier(spark, SF_DIR).collect():
        assert 0.0 <= r.quality_prob <= 1.0
        assert r.keep == (1 if r.quality_prob >= 0.5 else 0)


def test_phrase_search_no_shuffle(spark):
    # same contract as the classifier test above: the match itself is
    # map-shaped — only the load_table scan-parallelism floor (round
    # robin, layout-gated, inert at scale) may appear.
    plan = (
        sampling.phrase_search(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_phrase_search_finds_real_adjacency(spark):
    """Spot-check: every reported doc really contains the adjacent pair
    (and a doc with the words non-adjacent only is not reported)."""
    from samza_hello_samza_spark.session import load_table

    hits = {r.doc_id: r.n_matches for r in sampling.phrase_search(spark, SF_DIR).collect()}
    assert hits
    first, second = sampling.PHRASE
    docs = {r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents").collect()}
    for doc_id, n in list(hits.items())[:20]:
        words = docs[doc_id].lower().split()
        true_n = sum(
            1
            for i in range(len(words) - 1)
            if words[i] == first and words[i + 1] == second
        )
        assert n == true_n and n > 0


def test_export_shards_partition_of_corpus(spark):
    """Shards partition the corpus; shares sum to 1; no empty shard."""
    from samza_hello_samza_spark.operators import sampling
    from samza_hello_samza_spark.session import load_table

    rows = sampling.export_shards(spark, SF_DIR).collect()
    assert len(rows) == sampling.N_SHARDS
    docs = load_table(spark, SF_DIR, "documents")
    n_total = docs.count()
    assert sum(r.n_docs for r in rows) == n_total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # uniform hash balance: per-shard count is ~Binomial(n, 1/N), so
    # deviation sd ≈ sqrt(N/n); allow 5σ (test SF has ~16 docs/shard,
    # where ±60% is ordinary Poisson noise — at 100 TB this bound is
    # a fraction of a percent).
    bound = 5.0 * (sampling.N_SHARDS / n_total) ** 0.5
    for r in rows:
        assert r.n_docs > 0, f"empty shard {r.shard_id}"
        assert abs(r.dev_from_ideal) < bound, (r, bound)


def test_domain_kl_nonnegative_and_partitions_tokens(spark):
    """Gibbs: KL ≥ 0 per source; per-source token counts partition the
    corpus total."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.operators import sampling
    from samza_hello_samza_spark.operators.dedup import _words
    from samza_hello_samza_spark.session import load_table

    rows = sampling.domain_kl_divergence(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.kl_nats >= 0, r
        assert r.n_distinct_words <= r.n_words
    total = (
        load_table(spark, SF_DIR, "documents")
        .select(F.size(_words(F.col("text"))).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.n_words for r in rows) == total


def test_token_budget_plan_fills_budget_and_flattens(spark):
    """Quotas (a) sum to ≤ budget with only integer-truncation slack,
    (b) are monotone in source size, and (c) flatten the mix: the
    quota ratio between the biggest and smallest source is strictly
    smaller than their token ratio (sqrt-temperature effect)."""
    from samza_hello_samza_spark.operators import sampling
    from tests.conftest import SF_DIR

    rows = sampling.token_budget_plan(spark, SF_DIR).collect()
    assert rows
    total_quota = sum(r.quota_tokens for r in rows)
    assert total_quota <= sampling.TOKEN_BUDGET
    assert total_quota >= sampling.TOKEN_BUDGET - len(rows)  # DIV slack only
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    quotas = [r.quota_tokens for r in by_tokens]
    assert quotas == sorted(quotas)  # monotone in source size
    small, big = by_tokens[0], by_tokens[-1]
    if small.n_tokens < big.n_tokens:
        assert (
            big.quota_tokens / small.quota_tokens
            < big.n_tokens / small.n_tokens
        )


def test_dsir_importance_prefers_target_like_docs(spark):
    """The importance weight must separate the slices it was built
    from: mean log-weight of target (en) docs strictly exceeds the
    non-target mean, and docs with no bigrams carry weight 0."""
    from samza_hello_samza_spark.operators.sampling import dsir_importance
    from tests.conftest import SF_DIR

    rows = dsir_importance(spark, SF_DIR).collect()
    assert rows
    tgt = [r.log_weight for r in rows if r.is_target == 1]
    non = [r.log_weight for r in rows if r.is_target == 0]
    assert tgt and non
    assert sum(tgt) / len(tgt) > sum(non) / len(non)
    for r in rows:
        if r.n_grams == 0:
            assert r.log_weight == 0.0 and r.keep == 0


def test_train_val_test_split_is_stable_under_appends(spark):
    """Split membership is a pure function of doc_id: the report over
    the full corpus equals the fold of the report over any partition
    of the corpus (append-stability — no doc ever crosses the
    boundary), splits are disjoint-and-exhaustive, and the ppm shares
    sum to ~1e6."""
    from samza_hello_samza_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        _md5_bucket,
    )
    from samza_hello_samza_spark.session import load_table

    rows = {r.split: r for r in sampling.train_val_test_split(spark, SF_DIR).collect()}
    assert set(rows) == {"train", "val", "test"}
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    assert sum(r.n_docs for r in rows.values()) == n  # exhaustive + disjoint
    ppm = sum(r.doc_share_ppm for r in rows.values())
    assert 1_000_000 - 3 <= ppm <= 1_000_000  # integer-floor rounding only

    # membership recomputed per-doc matches the report's counts even
    # when the corpus is processed as two arbitrary halves (append
    # stability: the split column is doc_id-pure, so fold(=sum) of
    # per-half counts is the full report's counts)
    from pyspark.sql import functions as F

    b = _md5_bucket(F.col("doc_id"), 100)
    tagged = docs.select(
        F.when(b < SPLIT_TRAIN_LT, "train")
        .when(b < SPLIT_VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
        (F.col("doc_id") % 2).alias("half"),
    )
    halves = {
        (r.split, r.half): r.cnt
        for r in tagged.groupBy("split", "half").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for s in rows:
        assert halves.get((s, 0), 0) + halves.get((s, 1), 0) == rows[s].n_docs


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """Every near-dup cluster lands wholly inside ONE split (the
    contamination guarantee), singletons follow their own doc_id
    hash, and the report's counts reconcile with the full corpus."""
    from samza_hello_samza_spark.operators.dedup import dedup_clusters
    from samza_hello_samza_spark.operators.sampling import (
        _md5_bucket,
        _split_of,
        leakage_safe_split,
    )
    from samza_hello_samza_spark.session import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    rows = {r.split: r for r in leakage_safe_split(spark, SF_DIR).collect()}
    assert sum(r.n_docs for r in rows.values()) == docs.count()

    clusters = dedup_clusters(spark, SF_DIR)
    assert clusters.count() > 0  # the guard is exercised, not vacuous
    per_doc = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            _split_of(
                _md5_bucket(F.coalesce(F.col("cluster_id"), F.col("doc_id")), 100)
            ).alias("split"),
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("gid"),
        )
    )
    crossings = (
        per_doc.groupBy("gid")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert crossings == 0


def test_epoch_shuffle_orders_differ_across_epochs(spark):
    """Different epochs must produce different permutations (the whole
    point of reshuffling), while each epoch covers the corpus exactly."""
    from samza_hello_samza_spark.session import load_table

    rows = sampling.epoch_shuffle_plan(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.shard_id] = r.order_checksum
    assert sorted(by_epoch) == list(range(sampling.N_EPOCHS))
    for e, shards in by_epoch.items():
        total = sum(
            r.n_docs for r in rows if r.epoch == e
        )
        assert total == n_docs, e
    assert by_epoch[0] != by_epoch[1], "epoch 1 repeated epoch 0's order"


def test_train_quality_classifier_numpy_parity(spark):
    """The distributed GD trainer must match a straight numpy
    re-implementation of the same standardization + full-batch loop
    (the aggregates only change summation order, so agreement is to
    float-noise tolerance)."""
    import numpy as np

    feats = sampling._qc_training_frame(spark, SF_DIR).collect()
    X = np.array([[r[c] for c in sampling.QC_FEATURES] for r in feats])
    y = np.array([r.y for r in feats])
    mu, sd = X.mean(axis=0), np.maximum(X.std(axis=0), 1e-9)
    Xs = (X - mu) / sd
    w = np.zeros(len(sampling.QC_FEATURES))
    b = 0.0
    for _ in range(sampling.QC_ITERS):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        w -= sampling.QC_LR * (Xs * (p - y)[:, None]).mean(axis=0)
        b -= sampling.QC_LR * (p - y).mean()
    got = {
        r.term: r.value
        for r in sampling.train_quality_classifier(spark, SF_DIR).collect()
    }
    for j, c in enumerate(sampling.QC_FEATURES):
        assert abs(got[c] - w[j]) < 1e-5, (c, got[c], w[j])
    assert abs(got["__bias__"] - b) < 1e-5
    assert got["__n_docs__"] == len(feats)


def test_train_quality_classifier_learns(spark):
    """Sanity floor: the trained model separates the teacher labels
    far better than chance (binned-histogram AUC, no global sort)."""
    got = {
        r.term: r.value
        for r in sampling.train_quality_classifier(spark, SF_DIR).collect()
    }
    assert got["__train_auc__"] >= 0.85
