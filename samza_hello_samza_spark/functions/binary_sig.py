"""Sign-bit signature packing — the binary-quantization primitives.

One bit per dimension (bit i set ⟺ v[i] > 0) packed little-endian
into 32-bit words stored as LONG columns ``w0..w{dim/32-1}`` — the
1-bit compression behind FAISS binary indexes / Elasticsearch BBQ.
32-bit words because the per-bit weight ``2^(i-lo)`` in the JVM fold
is exact in double only for exponents < 32; Hamming distance is then
``sum(bit_count(w XOR qw))`` — whole-stage-codegen integer ops.

Shared by the in-scan probes (``operators/similarity.py``) and the
committed index layout (``operators/ann_index.py`` stores these
columns NEXT to the IVF codes so a probe scans dim/8 bytes/vector of
a committed file set instead of re-deriving signatures from the raw
float vectors — the 32× I/O cut that makes the technique matter at
100 TB). Sign compare, packing and popcount are all integer-exact,
so every consumer is oracle-checkable.

Reference parity note: the reference (hello-samza) ships no vector
ops; this belongs to the beyond-reference training-data surface
(brief § "similarity search").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

WORD_BITS = 32


def n_words(dim: int) -> int:
    if dim % WORD_BITS:
        raise ValueError(f"dim must be a multiple of {WORD_BITS}, got {dim}")
    return dim // WORD_BITS


def sig_col_names(dim: int) -> list[str]:
    return [f"w{w}" for w in range(n_words(dim))]


def sign_word_cols(v: F.Column, dim: int) -> list[F.Column]:
    """The vector's sign signature as ``dim/32`` long columns
    ``w0..``. A pure JVM fold — no Python in the packing path."""

    def _fold(lo: int):
        # closure (not a default arg: pyspark counts lambda params)
        return lambda acc, i: acc + F.when(
            F.element_at(v, i + F.lit(1)) > 0,
            F.pow(F.lit(2.0), i - F.lit(lo)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    cols = []
    for w in range(n_words(dim)):
        lo = w * WORD_BITS
        cols.append(
            F.aggregate(
                F.sequence(F.lit(lo), F.lit(lo + WORD_BITS - 1)),
                F.lit(0).cast("long"),
                _fold(lo),
            ).alias(f"w{w}")
        )
    return cols


def sign_words_py(qvec: np.ndarray) -> list[int]:
    """Driver-side twin of ``sign_word_cols`` for the query vector."""
    dim = len(qvec)
    return [
        sum(
            1 << (i - w * WORD_BITS)
            for i in range(w * WORD_BITS, (w + 1) * WORD_BITS)
            if qvec[i] > 0
        )
        for w in range(n_words(dim))
    ]


def hamming_col(qwords: list[int]) -> F.Column:
    """popcount(sig XOR query-sig) summed over the packed words."""
    h: F.Column = F.lit(0)
    for w, qw in enumerate(qwords):
        h = h + F.bit_count(F.col(f"w{w}").bitwiseXOR(F.lit(qw)))
    return h.cast("long")
