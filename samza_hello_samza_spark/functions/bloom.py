"""Broadcast Bloom-filter semi-join pruning — a reusable primitive.

The pattern Spark's own runtime bloom-join pruning applies implicitly
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), made explicit,
deterministic, and available to any operator: when a big relation must
be semi-joined against a BOUNDED key set (an eval suite, a blocklist,
a vocabulary, an id allowlist), ship the key set as a Bloom bit-array
literal and reject non-members inside whole-stage codegen BEFORE any
exchange or join build — then confirm survivors with the exact
left-semi join so the composition stays exact (Bloom filters have no
false negatives, and the confirm join removes the false positives).

Hash discipline: the filtered column must hold md5 hex digests (the
repo's engine-portable hash — both Spark and DuckDB compute identical
md5, so oracle parity survives). Each of the k=3 hash functions is an
independent 8-hex-digit slice of that digest: zero additional hashing
on either the build side (Python `int(h[8j:8j+8], 16)`) or the probe
side (JVM `conv(substring(h, 1+8j, 8), 16, 10)`), and the two sides
agree bit-for-bit by construction.

Scale shape (100 TB): the bit-array is ≤512 KiB regardless of the big
side's size — a plan constant, not a shuffled or broadcast-hashed
relation — and the per-row probe is three shifts and an AND in
codegen. The exact confirm join then runs over only the ~fp-rate
fraction that survives (~0.2% at 16 bits/key), which is what makes a
probe over 10¹¹ rows feasible.

First consumers: ``operators/text_filters.contamination_bloom`` (batch
decontamination, oracle-checked) and ``streaming/jobs
.decontamination_job`` (in-row stream screen, no confirm join —
superset semantics, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hints import maybe_broadcast

#: sizing: ≥16 bits per element (fp ≈ 0.2% at k=3), power of two so
#: idx%m and idx%64 compose; capped so the literal stays ≤512 KiB.
BLOOM_MIN_BITS = 1 << 16
BLOOM_MAX_BITS = 1 << 22
BLOOM_K = 3  # independent 32-bit slices of the md5 hex

#: driver-build budget: past 16 bits/key at the max filter size the fp
#: rate degrades anyway, and the driver collect stops being "bounded".
#: ``bloom_semi_join`` switches to the distributed aggregate build
#: beyond this — the collect there is ≤ n_bits/64 word rows, a plan
#: constant independent of key count.
BLOOM_MAX_DRIVER_KEYS = BLOOM_MAX_BITS // 16


def build_bloom(hashes: list[str]) -> tuple[list[int], int]:
    """Bloom bits (signed-int64 words, ready for ``F.lit``) + size.

    ``hashes`` must be md5 hex digests. Sized at ≥16 bits/element
    between BLOOM_MIN_BITS and BLOOM_MAX_BITS; each element sets
    BLOOM_K bits addressed by 8-hex-digit slices — the exact
    arithmetic ``member_sql`` evaluates JVM-side, so membership has no
    false negatives by construction.
    """
    n_bits = BLOOM_MIN_BITS
    while n_bits < BLOOM_MAX_BITS and n_bits < 16 * max(len(hashes), 1):
        n_bits *= 2
    bits = [0] * (n_bits // 64)
    for h in hashes:
        for j in range(BLOOM_K):
            idx = int(h[8 * j : 8 * j + 8], 16) % n_bits
            bits[idx // 64] |= 1 << (idx % 64)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in bits]
    return signed, n_bits


def member_sql(n_bits: int, col: str = "h") -> str:
    """SQL predicate: md5-hex ``col`` hits all k positions of the
    ``bloom_bits`` long-array column (pure JVM codegen — conv/
    shiftright/element_at; no Python in the per-row path). ``col`` may
    also be a lambda variable name, so the predicate composes with
    higher-order functions (``filter(sh, h -> ...)``).
    """
    terms = []
    for j in range(BLOOM_K):
        idx = (
            f"(CAST(conv(substring({col}, {1 + 8 * j}, 8), 16, 10) AS BIGINT)"
            f" % {n_bits})"
        )
        terms.append(
            f"((shiftright(element_at(bloom_bits, CAST(shiftright({idx}, 6) AS INT) + 1),"
            f" CAST({idx} & 63 AS INT)) & 1) = 1)"
        )
    return " AND ".join(terms)


def with_bloom_bits(df: DataFrame, bits: list[int]) -> DataFrame:
    """Attach the bit-array as a ``bloom_bits`` column via a broadcast
    1-row relation joined on a constant key.

    NOT ``F.lit(bits)``: a literal array of 64 Ki elements becomes a
    64 Ki-child expression tree, and analysis + codegen over it costs
    tens of seconds PER QUERY (measured: 47 s at sf0.1 with a 2²²-bit
    filter) regardless of data size. As row data in a broadcast
    relation the array is built once, hashed never, and ``element_at``
    probes it O(1) per row. The constant-key equi join (not a
    crossJoin) keeps the plan a plain BroadcastHashJoin and stays
    legal under Structured Streaming's stream-static join rules.
    """
    bits_df = (
        df.sparkSession.createDataFrame([(bits,)], "bloom_bits: array<bigint>")
        .withColumn("_bloom_k", F.lit(1))
    )
    return (
        df.withColumn("_bloom_k", F.lit(1))
        .join(F.broadcast(bits_df), "_bloom_k")
        .drop("_bloom_k")
    )


def build_bloom_distributed(keys: DataFrame, col: str) -> tuple[list[int], int]:
    """Bloom bits built by a distributed aggregate — no key collect.

    The scale path for key sets past ``BLOOM_MAX_DRIVER_KEYS``: each
    hash contributes its BLOOM_K (word_index, bit_mask) pairs in-row
    (JVM expressions, same 8-hex-slice arithmetic as ``build_bloom``),
    a groupBy(word) bit_or folds them map-side, and the driver collects
    at most n_bits/64 ≤ 64 Ki word rows — a plan constant tied to the
    FILTER size, never to the key count. Bit-identical to
    ``build_bloom`` over the same keys (pytest-asserted).
    """
    n_bits = BLOOM_MAX_BITS
    pairs = ", ".join(
        f"named_struct('w', CAST(shiftright("
        f"CAST(conv(substring({col}, {1 + 8 * j}, 8), 16, 10) AS BIGINT)"
        f" % {n_bits}, 6) AS INT), 'm', shiftleft(CAST(1 AS BIGINT), "
        f"CAST((CAST(conv(substring({col}, {1 + 8 * j}, 8), 16, 10) AS BIGINT)"
        f" % {n_bits}) & 63 AS INT)))"
        for j in range(BLOOM_K)
    )
    words = (
        keys.select(F.expr(f"explode(array({pairs})) AS p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.expr("bit_or(p.m)").alias("m"))
        .collect()
    )
    bits = [0] * (n_bits // 64)
    for r in words:
        bits[r.w] = r.m
    return bits, n_bits


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    col: str,
    max_driver_keys: int = BLOOM_MAX_DRIVER_KEYS,
) -> DataFrame:
    """Exact left-semi join of ``big`` against ``keys`` on the md5-hex
    column ``col``, with a Bloom prefilter ahead of the join.

    The filter build is collect-bounded BY CONSTRUCTION, not by caller
    promise: key sets up to ``max_driver_keys`` are collected and built
    on the driver (one pass, cheapest for the eval-suite sizes the
    anchor consumers ship); anything larger flips to
    ``build_bloom_distributed``, whose driver traffic is the ≤64 Ki
    bit-array words regardless of key count — so a 100 TB-scale key
    side degrades fp-rate, never driver memory. ``keys`` is reused for
    the exact confirm join, so localCheckpoint it if its lineage is
    expensive. Result ≡ ``big.join(keys, col, "left_semi")`` exactly;
    only the cost differs — non-members die in codegen at ~fp-rate
    survival instead of reaching the join.
    """
    # limit(n+1) bounds the probe collect itself: we never pull more
    # than the budget plus the one row that proves it was exceeded.
    probe = keys.select(col).limit(max_driver_keys + 1).collect()
    if len(probe) > max_driver_keys:
        bits, n_bits = build_bloom_distributed(keys, col)
    else:
        bits, n_bits = build_bloom([r[col] for r in probe])
    survivors = (
        with_bloom_bits(big, bits)
        .filter(F.expr(member_sql(n_bits, col)))
        .drop("bloom_bits")
    )
    return survivors.join(maybe_broadcast(keys.select(col)), col, "left_semi")
