"""Z-order (Morton-curve) clustering: multi-column data skipping.

Sorting a table by ONE column gives tight per-file min/max ranges for
that column only; a filter on any other column prunes nothing. The
Z-order layout interleaves the bits of two (or more) key columns into
a single Morton code and sorts by it, so file and row-group min/max
stats stay tight on EVERY interleaved dimension at once — a box
predicate `a BETWEEN .. AND b BETWEEN ..` skips most of the table at
the scan, before any Spark task reads a row.

This is the batch ingest-side complement to bucketing.py: bucketing
kills the JOIN shuffle, Z-ordering kills the SCAN for selective
multi-dimension predicates. At 100 TB a full-table scan is the single
most expensive thing a query can do; clustered layout + parquet
row-group stats is how a 2-column point query reads GB instead of TB.

Everything is JVM-side column math (shiftleft/bitwise OR inside
whole-stage codegen): keys are rank-normalized to ``bits``-bit ints
with percentile boundaries (so skewed keys still spread evenly across
the curve), then bit-interleaved — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def _rank_to_bits(col: Column, boundaries: Column, bits: int) -> Column:
    """Rank-normalize a numeric column to [0, 2^bits) as a long.

    ``boundaries`` is a (2^bits - 1)-element percentile array (one
    tiny agg, broadcast): the cell id is the count of boundaries below
    the value. Rank-based (not min/max) so a skewed dimension still
    spreads across the full curve — the same trick Delta's OPTIMIZE
    ZORDER uses via range_partition_id.
    """
    cell = F.size(F.filter(boundaries, lambda b: col.cast("double") > b))
    return F.least(F.lit((1 << bits) - 1).cast("bigint"), cell.cast("bigint"))


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton code: bit i of `a` → bit 2i+1, bit i of `b` → bit 2i.

    A fixed `bits`-term OR chain of shift/mask expressions — unrolled
    at plan-build time, fully inside whole-stage codegen.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i)
        )
    return z


def zorder_code(
    df: DataFrame, col_a: str, col_b: str, bits: int = DEFAULT_BITS
) -> DataFrame:
    """Append a Morton `_zcode` column over two numeric columns.

    Bounds come from ONE tiny min/max aggregate broadcast back (a
    4-value row — never a window), so the whole thing is one extra
    scan-side projection.
    """
    pcts = [i / (1 << bits) for i in range(1, 1 << bits)]
    bounds = df.agg(
        F.percentile(F.col(col_a).cast("double"), pcts).alias("_ba"),
        F.percentile(F.col(col_b).cast("double"), pcts).alias("_bb"),
    )
    a = _rank_to_bits(F.col(col_a), F.col("_ba"), bits)
    b = _rank_to_bits(F.col(col_b), F.col("_bb"), bits)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_zcode", _interleave(a, b, bits))
        .drop("_ba", "_bb")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = DEFAULT_BITS,
    files: int = 16,
    aligned: bool = True,
) -> None:
    """Write `df` clustered along the (col_a, col_b) Z-curve.

    aligned=True (default): the file id is the TOP log2(files) bits of
    the Morton code, so every file is exactly one power-of-two curve
    block — an axis-aligned rectangle in (a, b) cell space with the
    tightest possible min/max stats (sampled range boundaries instead
    produce files straddling block borders, which widens their stat
    ranges and weakens pruning ~2× in practice). ``files`` is rounded
    to a power of two; one shuffle by block id, one file per block.

    aligned=False: `repartitionByRange(_zcode)` — sampled bounds, for
    when file SIZE balance matters more than stat tightness (skewed
    occupancy along the curve).
    """
    z = zorder_code(df, col_a, col_b, bits)
    if aligned:
        shift = max(0, 2 * bits - max(1, (files - 1).bit_length()))
        z = (
            z.withColumn("_zfile", F.shiftright("_zcode", shift))
            .repartition(files, "_zfile")
            .sortWithinPartitions("_zfile", "_zcode")
            .drop("_zcode")
        )
        (
            z.write.mode("overwrite")
            .partitionBy("_zfile")
            .parquet(path)
        )
    else:
        (
            z.repartitionByRange(files, "_zcode")
            .sortWithinPartitions("_zcode")
            .drop("_zcode")
            .write.mode("overwrite")
            .parquet(path)
        )


def write_clustered(df: DataFrame, path: str, cols: list[str], files: int = 16) -> None:
    """Lexicographic (hierarchical) clustering: sort by ``cols`` in
    order, one range-partition per file.

    The 1-D complement to the Z-curve — right when the leading column
    is a LOW-CARDINALITY categorical (ship mode, return flag,
    language): every file then holds a single leading value, so an
    equality predicate on it prunes to ~1/|domain| of the files at
    listing time, and the trailing column's ranges stay tight WITHIN
    each leading value (the Z-curve would instead interleave the
    categorical's handful of cells and blur the trailing dimension).
    ``repartitionByRange`` samples real range bounds, so file sizes
    balance even when the leading values are skewed.
    """
    (
        df.repartitionByRange(files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
