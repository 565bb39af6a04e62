"""hybrid_search_indexed: hybrid retrieval served from the committed
layouts (r10, VERDICT r09 #1) — WAND tier-pruned BM25 RRF-fused with
the SQ8 snapshot shortlist + exact rerank; the last serving path whose
hot loop read the corpus is closed."""

from __future__ import annotations

import re

from samza_hello_samza_spark.operators import similarity
from samza_hello_samza_spark.sources import inverted
from tests.conftest import SF_DIR, assert_matches_oracle


def test_hybrid_indexed_matches_oracle_and_contract(
    spark, duck, tmp_path, monkeypatch
):
    """Hash-exact vs the DuckDB twin (both legs replayed from first
    principles, fused with the same rounding), and the output contract
    equals the scan-path key's column-for-column."""
    from samza_hello_samza_spark.operators.retrieval import hybrid_search

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    assert_matches_oracle(
        spark,
        duck,
        similarity.QUERIES["hybrid_search_indexed"],
        similarity.ORACLES["hybrid_search_indexed"],
    )
    got = similarity.hybrid_search_indexed(spark, SF_DIR)
    assert got.columns == hybrid_search(spark, SF_DIR).columns


def test_hybrid_indexed_prunes_both_legs(spark, tmp_path, monkeypatch):
    """The serving claim, asserted on the real plan: the lexical leg's
    WAND probe pruned (telemetry), the vector shortlist scan reads
    code words only (no raw ``v`` in its ReadSchema), and NEITHER base
    table (documents/embeddings parquet) appears anywhere in the
    serving plan — both legs run off the committed layouts."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    df = similarity.hybrid_search_indexed(spark, SF_DIR)

    # lexical leg: the impact-bound probe that built this plan pruned
    st = inverted.bm25_wand_topk.last_stats
    assert st["fallback"] is None
    assert st["n_blocks_p1"] < st["n_blocks_total"]

    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan  # corpus text never read
    assert "embeddings.parquet" not in plan  # raw base table never read
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    # the ADC shortlist scan: packed code words, never the raw vector
    assert any("s0" in s and "v:" not in s for s in schemas), schemas
    # the rerank rehydration: vec_id + v from the SAME snapshot
    assert any("v:array" in s for s in schemas), schemas

    rows = df.collect()
    from samza_hello_samza_spark.operators.retrieval import HYBRID_TOP

    assert len(rows) == HYBRID_TOP
    # fusion sanity: every row carries at least one real rank and the
    # rrf of two sentinel ranks (-1/-1) cannot appear
    for r in rows:
        assert r.lex_rank >= 1 or r.vec_rank >= 1
        assert r.rrf > 0.0


def test_hybrid_batch_indexed_matches_oracle_and_fuses_per_query(
    spark, duck, tmp_path, monkeypatch
):
    """r10: hybrid retrieval at query volume — hash-exact vs the
    DuckDB twin (both batch programs replayed + identical fusion
    rounding), one fused top-10 per query, every row carrying at
    least one real rank, and the lexical leg really ran the
    WAND-routed batch (telemetry)."""
    from samza_hello_samza_spark.operators.retrieval import HYBRID_TOP
    from samza_hello_samza_spark.sources.inverted import BM25_BATCH_QUERIES

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    assert_matches_oracle(
        spark,
        duck,
        similarity.QUERIES["hybrid_batch_indexed"],
        similarity.ORACLES["hybrid_batch_indexed"],
    )

    rows = similarity.hybrid_batch_indexed(spark, SF_DIR).collect()
    st = inverted.bm25_batch_wand_topk.last_stats
    assert st["n_queries"] == len(BM25_BATCH_QUERIES)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.lex_rank >= 1 or r.vec_rank >= 1
        assert r.rrf > 0.0
    assert set(by_q) == set(range(len(BM25_BATCH_QUERIES)))
    for q, qrows in by_q.items():
        assert len(qrows) == HYBRID_TOP, q


def test_hybrid_indexed_survives_wand_fallback_corpus(spark, tmp_path, monkeypatch):
    """Degenerate-path discipline: on a corpus SMALLER than the
    lexical top-k, θ is not a valid k-th bound — bm25_wand_topk falls
    back (under_k) to the full pruned read — and the hybrid must
    still serve the correct fused relation (the fallback is
    relation-invisible by contract)."""
    import numpy as np

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    # 12 docs < BM25_TOP=20 → fewer than k phase-1 docs → under_k
    docs = spark.createDataFrame(
        [(i, "dup join window common words " * (i % 3 + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(size=64)], i % 3)
            for i in range(12)
        ],
        "vec_id long, embedding array<double>, label int",
    )
    emb.write.parquet(os.path.join(sf, "embeddings.parquet"))

    similarity._QUERY_VEC_CACHE.pop(sf, None)
    rows = similarity.hybrid_search_indexed(spark, sf).collect()
    st = inverted.bm25_wand_topk.last_stats
    assert st["fallback"] is not None  # the bound really could not prune
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r.lex_rank >= 1 or r.vec_rank >= 1
        assert r.rrf > 0.0
    # the lexical leg still served the exact BM25 ranking: every doc
    # matches all 3 terms, so the fused lex side must carry real ranks
    assert any(r.lex_rank >= 1 for r in rows)
    assert any(r.vec_rank >= 1 for r in rows)
