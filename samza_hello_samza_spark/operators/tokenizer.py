"""Distributed BPE tokenizer training.

The tokenizer is the first trained artifact of an LLM pipeline, and
its training pass is corpus-sized exactly once: after the initial
``groupBy(word)`` frequency table, every BPE iteration works on the
VOCABULARY (distinct words + frequencies), not the corpus — the
property that makes byte-pair training feasible at 100 TB. Shape:

1. one corpus scan → word frequency table (vocabulary-sized, Zipf);
2. each Spark round: adjacent symbol pairs weighted by word frequency
   (``zip_with`` over the per-word symbol array — per-row, no
   explode until the pair aggregate), one groupBy(pair) over a
   vocabulary-sized input, top-M candidates with deterministic
   tie-break, then the provably-non-interacting PREFIX of the batch
   (``_accept_batch`` — replays identically to one-merge-at-a-time
   BPE) is merged into every word's symbol array by ONE Arrow-batched
   pandas UDF pass (greedy left-to-right, the standard BPE merge rule
   — inherently sequential per word, so a UDF is the honest tool);
3. ``localCheckpoint`` per round truncates the iterative lineage.

Rows-only driver check (iterative greedy merging is not
SQL-expressible); pytest verifies the merge table against a
pure-python reference BPE trained on the same frequency table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..session import load_table
from .dedup import _words, explode_nonempty

N_MERGES = 10


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        explode_nonempty(docs, [], _words(F.col("text")), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(symbols: F.Column) -> F.Column:
    """'left right' strings for each adjacent symbol pair — per-row
    array math, evaluated before any explode."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, n - 1),
        F.slice(symbols, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def _merge_udf(merges: list[tuple[str, str]]):
    """Apply a BATCH of merges (in rank order) in one Arrow pass.

    Equivalent to applying them one-at-a-time because the batch
    acceptance rule (``_accept_batch``) only batches symbol-disjoint
    merges — order within the batch cannot matter, but we apply
    sequentially anyway so the equivalence is by construction."""
    pairs = [((l, r), l + r) for l, r in merges]

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merges(col: pd.Series) -> pd.Series:
        def merge_one(syms):
            for pair, merged in pairs:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(merge_one)

    return apply_merges


#: candidates examined per Spark round (the accepted batch is a
#: provably-non-interacting PREFIX of these, usually shorter).
BATCH_M = 8


def _accept_batch(
    candidates: list[tuple[str, str, int]], bound: dict[str, int]
) -> list[tuple[str, str, int]]:
    """Largest PREFIX of the ranked candidates that provably replays
    identically to one-at-a-time BPE.

    Candidate j (after accepted merges i<j) is safe iff
    1. symbol-disjoint from every earlier accepted (a,b): then no
       occurrence of j's pair overlaps a merged occurrence, so its
       count and its greedy application are unchanged — and no OLD
       pair's count ever increases under a merge, so j still outranks
       everything below it;
    2. cnt_j strictly beats every pair a merge i could CREATE: a born
       pair (x, a_ib_i) maps 1-1 onto a pre-round (x, a_i) adjacency
       and (a_ib_i, y) onto (b_i, y), so
       bound_i = max cnt over {p.right == a_i} ∪ {p.left == b_i}
       upper-bounds every born count (bound["R:"+a] / bound["L:"+b]).
    The scan STOPS at the first unsafe candidate (skipping instead of
    stopping would be wrong: a skipped candidate's count may shrink
    under the earlier merges, and later candidates would leapfrog the
    order sequential BPE actually follows).
    """
    accepted: list[tuple[str, str, int]] = []
    for left, right, cnt in candidates:
        ok = True
        for a, b, _c in accepted:
            if left in (a, b) or right in (a, b):
                ok = False
                break
            born = max(bound.get("R:" + a, 0), bound.get("L:" + b, 0))
            if cnt <= born:
                ok = False
                break
        if not ok:
            break
        accepted.append((left, right, cnt))
    return accepted


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``N_MERGES`` BPE merges from the corpus.

    Returns the merge table (rank, left, right, merged, pair_count) —
    the artifact a tokenizer ships. Ties break on (count desc, left
    asc, right asc) so the result is deterministic across runs and
    partitionings.
    """
    vocab = _word_freq(spark, sf_dir).select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("symbols"),
    ).localCheckpoint()  # the corpus scan happens exactly once, here

    # Batched rounds (VERDICT r04 #8): each Spark round takes the
    # top-M candidates in ONE TakeOrderedAndProject job plus one
    # born-pair-bound job, then accepts the provably-non-interacting
    # prefix driver-side — cutting scheduler round-trips ~|batch|×
    # versus the one-argmax-per-merge loop while replaying the exact
    # sequential merge list (pytest: python-reference parity + job
    # count).
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < N_MERGES:
        pairs = explode_nonempty(
            vocab, ["freq"], _adjacent_pairs(F.col("symbols")), "pair"
        ).groupBy("pair").agg(F.sum("freq").alias("cnt"))
        top = pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(BATCH_M).collect()
        if not top:
            break
        candidates = [
            (*r.pair.split(" ", 1), int(r.cnt)) for r in top
        ][: N_MERGES - len(merges)]
        # per-symbol max pair counts, keyed R:<right-symbol> /
        # L:<left-symbol>, restricted to the candidates' symbols —
        # one vocabulary-sized job, ≤2M rows collected.
        keys = {f"R:{l}" for l, _r, _c in candidates} | {
            f"L:{r}" for _l, r, _c in candidates
        }
        lr = F.split("pair", " ")
        bound = {
            r.k: int(r.m)
            for r in (
                pairs.select(
                    F.explode(
                        F.array(
                            F.concat(F.lit("R:"), lr[1]),
                            F.concat(F.lit("L:"), lr[0]),
                        )
                    ).alias("k"),
                    "cnt",
                )
                .filter(F.col("k").isin(list(keys)))
                .groupBy("k")
                .agg(F.max("cnt").alias("m"))
                .collect()
            )
        }
        accepted = _accept_batch(candidates, bound)
        base = len(merges)
        merges.extend(
            (base + i, l, r, l + r, c) for i, (l, r, c) in enumerate(accepted)
        )
        vocab = vocab.withColumn(
            "symbols",
            _merge_udf([(l, r) for l, r, _c in accepted])(F.col("symbols")),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


ORACLES: dict[str, str] = {}

QUERIES = {
    "bpe_train_merges": bpe_train_merges,
}
