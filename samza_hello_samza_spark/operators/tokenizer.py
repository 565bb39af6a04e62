"""Distributed BPE tokenizer training.

The tokenizer is the first trained artifact of an LLM pipeline, and
its training pass is corpus-sized exactly once: after the initial
``groupBy(word)`` frequency table, every BPE iteration works on the
VOCABULARY (distinct words + frequencies), not the corpus — the
property that makes byte-pair training feasible at 100 TB. Shape:

1. one corpus scan → word frequency table (vocabulary-sized, Zipf);
2. each merge round: adjacent symbol pairs weighted by word frequency
   (``zip_with`` over the per-word symbol array — per-row, no
   explode until the pair aggregate), one groupBy(pair) over a
   vocabulary-sized input, argmax with deterministic tie-break, then
   the winning pair is merged into every word's symbol array by an
   Arrow-batched pandas UDF (greedy left-to-right, the standard BPE
   merge rule — inherently sequential per word, so a UDF is the
   honest tool);
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


def _merge_udf(left: str, right: str):
    pair = (left, right)
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        def merge_one(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return col.map(merge_one)

    return apply_merge


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

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(N_MERGES):
        best = (
            explode_nonempty(vocab, ["freq"], _adjacent_pairs(F.col("symbols")), "pair")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )  # 1-row argmax — TakeOrderedAndProject, no global sort
        if not best:
            break
        left, right = best[0].pair.split(" ", 1)
        merges.append((rank, left, right, left + right, int(best[0].cnt)))
        vocab = vocab.withColumn(
            "symbols", _merge_udf(left, right)(F.col("symbols"))
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


ORACLES: dict[str, str] = {}

QUERIES = {
    "bpe_train_merges": bpe_train_merges,
}
