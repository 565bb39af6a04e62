"""Materialized ANN index layouts: probes prune files, never re-scan.

Round-1 LSH/IVF computed codes at query time and filtered *after* the
full corpus scan — right algorithm, wrong storage story for 100 TB.
This module writes the index once and makes every probe a pruned read:

- **LSH band table** (``build_lsh_index``): the corpus exploded to one
  row per (band, code, vec_id, v), written ``partitionBy(band, code)``.
  With 4 bands × 4-bit codes that is 64 directories; a probe reads
  exactly the 4 (band, code) partitions matching the query's codes —
  file-level partition pruning, ~1/16 of the data per band, and the
  other ~94% of files are never opened. Storage is ×n_bands (vectors
  ride along so probes need no join-back); that is the classic LSH
  time/space trade, chosen because probe latency is the product goal.
  For wider codes (16+ bits) partition by ``band`` and *bucket* by
  ``code`` instead — same pruning via bucket pruning, bounded dir
  fan-out.

- **IVF index** (``build_ivf_index``): every vector coarse-quantized
  to its nearest of ``nlist`` centroids (Arrow-batched numpy matmul),
  written once ``partitionBy(list_id)`` with the centroid table
  alongside. A probe reads the centroid table (nlist rows), picks the
  ``nprobe`` nearest lists driver-side, and scans only those
  partitions: candidate cut happens before any compute runs, storage
  stays ×1.

Indexes are content-addressed under a temp root by (layout version,
scale-factor dir) and built at most once per process; ``_SUCCESS``
from the Spark write is the completion marker.
"""

from __future__ import annotations

import os
import re
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions import binary_sig
from ..functions import sq8 as sq8_codec
from ..session import load_table

#: bump when the on-disk layout or hash family changes.
LAYOUT_VERSION = 1


def _index_root() -> str:
    return os.path.join(
        os.environ.get("SPARK_GRAFT_INDEX_DIR", tempfile.gettempdir()),
        f"spark_graft_ann_index_v{LAYOUT_VERSION}",
    )


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/"))


def _is_built(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


# --------------------------------------------------------------------------
# LSH band index
# --------------------------------------------------------------------------


def band_codes(vec: np.ndarray, planes: np.ndarray, band_bits: int) -> list[int]:
    """The query-side hash: per-band code of one vector, driver-side."""
    bits = (planes @ vec) > 0
    code = 0
    for i, b in enumerate(bits):
        code |= int(b) << i
    n_bands = planes.shape[0] // band_bits
    mask = (1 << band_bits) - 1
    return [(code >> (i * band_bits)) & mask for i in range(n_bands)]


def band_rows(vectors: DataFrame, planes: np.ndarray, band_bits: int) -> DataFrame:
    """(band, code, vec_id, v) rows for a batch of vectors.

    Shared by the initial build and incremental appends so both paths
    hash identically: one Arrow-batched matmul computes the full code,
    then the per-band explode is pure column math.
    """
    n_planes = planes.shape[0]
    n_bands = n_planes // band_bits

    @F.pandas_udf(LongType())
    def code_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        bits = (mat @ planes.T) > 0
        codes = np.zeros(len(emb), dtype=np.int64)
        for i in range(n_planes):
            codes |= bits[:, i].astype(np.int64) << i
        return pd.Series(codes)

    e = vectors.withColumn("full_code", code_udf(F.col("v")))
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("full_code"), i * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("code"),
            )
            for i in range(n_bands)
        ]
    )
    return e.select("vec_id", "v", F.explode(bands).alias("bc")).select(
        F.col("bc.band").alias("band"), F.col("bc.code").alias("code"), "vec_id", "v"
    )


def build_lsh_index(
    spark: SparkSession,
    sf_dir: str,
    planes: np.ndarray,
    band_bits: int,
    out_dir: str | None = None,
) -> str:
    """Write the (band, code, vec_id, v) table partitioned by (band, code)."""
    out_dir = out_dir or os.path.join(_index_root(), _tag(sf_dir), "lsh")
    if _is_built(out_dir):
        return out_dir
    (
        band_rows(_embeddings(spark, sf_dir), planes, band_bits)
        .repartition("band", "code")
        .write.mode("overwrite")
        .partitionBy("band", "code")
        .parquet(out_dir)
    )
    return out_dir


def append_lsh_index(
    index_dir: str, vectors: DataFrame, planes: np.ndarray, band_bits: int
) -> None:
    """Incrementally index a delta of vectors — append, never rewrite.

    New band rows land as additional files inside their (band, code)
    directories (``mode('append')`` + dynamic partitionBy): existing
    files are untouched, probes see the new vectors on their next scan,
    and the write cost is ∝ |delta| × n_bands, independent of index
    size — the property that keeps a 100 TB index maintainable. The
    small files a high-frequency feed accumulates are the job of
    ``sources.compaction`` (idempotent per-partition rewrite), not of
    the ingest path.

    ``vectors``: (vec_id, v array<double>) — same contract as build.
    """
    (
        band_rows(vectors, planes, band_bits)
        .repartition("band", "code")
        .write.mode("append")
        .partitionBy("band", "code")
        .parquet(index_dir)
    )


def probe_lsh_index(
    spark: SparkSession, index_dir: str, qvec: np.ndarray, planes: np.ndarray, band_bits: int
) -> DataFrame:
    """Candidates colliding with ``qvec`` in ≥1 band — a pruned read.

    The filter is an OR over (band, code) literal pairs, which Spark
    turns into partition pruning: only the n_bands matching
    directories are listed and read. One vector may collide in
    several bands → dedupe on vec_id before scoring.
    """
    codes = band_codes(qvec, planes, band_bits)
    scan = spark.read.parquet(index_dir)
    hit = None
    for band, code in enumerate(codes):
        cond = (F.col("band") == band) & (F.col("code") == code)
        hit = cond if hit is None else (hit | cond)
    return _apply_tombstones(
        spark,
        index_dir,
        scan.filter(hit).dropDuplicates(["vec_id"]).select("vec_id", "v"),
    )


def multiprobe_band_codes(
    qvec: np.ndarray, planes: np.ndarray, band_bits: int, n_flips: int
) -> list[list[int]]:
    """The PINNED multi-probe sequence (Lv et al., VLDB'07): per band,
    the query's own code plus the codes reached by flipping the
    ``n_flips`` lowest-|margin| hyperplane bits of that band — the
    planes the query sits closest to, i.e. exactly the sign decisions
    a true near neighbor is likeliest to land on the other side of.
    Deterministic: margins sort ascending with the plane index as the
    tiebreak, so the probe set is a pure function of (query, planes)
    and recall gains cost extra PARTITIONS of the same table, never
    extra tables."""
    proj = planes @ qvec
    base = band_codes(qvec, planes, band_bits)
    n_bands = planes.shape[0] // band_bits
    out: list[list[int]] = []
    for band in range(n_bands):
        lo = band * band_bits
        margins = sorted(
            (abs(float(proj[lo + j])), j) for j in range(band_bits)
        )
        codes = [base[band]]
        for _, j in margins[: max(0, n_flips)]:
            codes.append(base[band] ^ (1 << j))
        out.append(codes)
    return out


def probe_lsh_index_multi(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    planes: np.ndarray,
    band_bits: int,
    n_flips: int,
) -> DataFrame:
    """Multi-probe candidates: vectors colliding with the query in
    any band under any of that band's pinned probe codes (own bucket
    + ``n_flips`` single-bit perturbations). Same partition-pruned
    read shape as ``probe_lsh_index`` — the filter is an OR over
    (band, code) literal pairs, so the scan lists (1 + n_flips) ×
    n_bands directories instead of n_bands; recall climbs with probe
    count while the index stays one table (the multi-TABLE
    alternative multiplies write amplification and ingest cost)."""
    probe = multiprobe_band_codes(qvec, planes, band_bits, n_flips)
    scan = spark.read.parquet(index_dir)
    hit = None
    for band, codes in enumerate(probe):
        cond = (F.col("band") == band) & (
            F.col("code").isin([int(c) for c in codes])
        )
        hit = cond if hit is None else (hit | cond)
    return _apply_tombstones(
        spark,
        index_dir,
        scan.filter(hit).dropDuplicates(["vec_id"]).select("vec_id", "v"),
    )


# --------------------------------------------------------------------------
# IVF index
# --------------------------------------------------------------------------


def _sig_meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_SIGS.json")


def read_sig_meta(index_dir: str) -> dict | None:
    """The layout's binary-signature declaration, or None.

    Written by ``build_ivf_index(sigs=True)``: names the stored
    packed-word columns and the vector dim they were derived from.
    Appenders/upserters consult it to RE-DERIVE signatures for delta
    rows (signatures are a pure function of ``v`` — layout-internal
    derived state, never caller-supplied), and probes to know which
    columns to scan. An explicit marker, not a ``w\\d+`` column-name
    pattern match, so a user attr named ``w0`` can never be mistaken
    for index state.
    """
    import json

    p = _sig_meta_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_sig_meta(index_dir: str, dim: int) -> None:
    import json

    os.makedirs(index_dir, exist_ok=True)
    tmp = _sig_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"sig_cols": binary_sig.sig_col_names(dim), "dim": dim}, f
        )
    os.replace(tmp, _sig_meta_path(index_dir))


def _sq8_meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_SQ8.json")


#: plain-data sidecar cache (r11, VERDICT r10 #6): the SQ8 codec meta
#: and the current index manifest are tiny JSON files a serving tier
#: re-reads on EVERY probe — at bench scale a local stat+parse, in
#: production an object-store GET per call. Cache the parsed dict
#: keyed on the file's (path, mtime_ns, size) fingerprint — the same
#: restart-safe plain-data discipline as the WAND pricing cache (no
#: Spark objects; a publish rewrites the file and moves the
#: fingerprint, so staleness is impossible without clock aliasing a
#: byte-identical rewrite, which changes nothing). Bounded FIFO.
_SIDECAR_JSON_CACHE: dict[tuple, dict] = {}
_SIDECAR_JSON_CACHE_MAX = 256


def _cached_sidecar_json(path: str) -> tuple[dict, bool]:
    """(parsed json, was_cache_hit) for a small sidecar file. Returns
    a DEEP COPY so callers can never mutate the cached entry."""
    import copy
    import json

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = key in _SIDECAR_JSON_CACHE
    if not hit:
        with open(path) as f:
            data = json.load(f)
        while len(_SIDECAR_JSON_CACHE) >= _SIDECAR_JSON_CACHE_MAX:
            _SIDECAR_JSON_CACHE.pop(next(iter(_SIDECAR_JSON_CACHE)))
        _SIDECAR_JSON_CACHE[key] = data
    return copy.deepcopy(_SIDECAR_JSON_CACHE[key]), hit


def read_sq8_meta(index_dir: str) -> dict | None:
    """The layout's SQ8 codec declaration, or None.

    Written by ``build_ivf_index(sq8=True)``: the packed-word column
    names plus the per-dimension (min, max) bounds the codes were
    quantized under. The bounds are FROZEN layout state (a codec, like
    a PQ codebook): appenders/upserters quantize delta rows under
    them — clamping out-of-range components, never retraining — so a
    code always means the same float interval across the whole file
    set, and a probe's query codes compare against every vector ever
    written. Same marker discipline as ``_SIGS.json``.

    Served from the fingerprint-keyed sidecar cache (r11) — repeat
    probes skip the file read; ``read_sq8_meta.last_cached`` records
    the hit for serving telemetry."""
    p = _sq8_meta_path(index_dir)
    if not os.path.exists(p):
        read_sq8_meta.last_cached = False
        return None
    data, hit = _cached_sidecar_json(p)
    read_sq8_meta.last_cached = hit
    return data


read_sq8_meta.last_cached = False


def _write_sq8_meta(
    index_dir: str, dim: int, mins: list[float], maxs: list[float]
) -> None:
    import json

    os.makedirs(index_dir, exist_ok=True)
    tmp = _sq8_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "sq8_cols": sq8_codec.sq8_col_names(dim),
                "dim": dim,
                "mins": mins,
                "maxs": maxs,
            },
            f,
        )
    os.replace(tmp, _sq8_meta_path(index_dir))


def _mrl_meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_MRL.json")


def read_mrl_meta(index_dir: str) -> dict | None:
    """The layout's Matryoshka prefix-column declaration, or None.

    Written by ``build_ivf_index(mrl_dim=...)``: names the stored
    prefix column and the prefix length. The prefix is DERIVED state
    (``v[0:dim_pre]`` — a pure function of ``v``, no codec to train or
    freeze), so append/upsert/rebalance/CDC recompute it per delta row
    like the signature/SQ8 words; probes read vec_id + the prefix
    column only (dim_pre/dim of the vector bytes — the COMPONENT cut,
    where SQ8/binary cut bytes per component). Same explicit-marker
    discipline as ``_SIGS.json``.
    """
    import json

    p = _mrl_meta_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_mrl_meta(index_dir: str, dim_pre: int) -> None:
    import json

    os.makedirs(index_dir, exist_ok=True)
    tmp = _mrl_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"mrl_col": "v_pre", "dim_pre": dim_pre}, f)
    os.replace(tmp, _mrl_meta_path(index_dir))


def _derived_col_map(index_dir: str) -> dict[str, F.Column]:
    """Column-name → derivation expression for every LAYOUT-DERIVED
    column of ``index_dir`` (binary signature words and/or SQ8 code
    words). Shared by the append and upsert legs: derived columns are
    a pure function of ``v`` (+ frozen codec state), recomputed for
    every delta row and never caller-supplied."""
    named: dict[str, F.Column] = {}
    sig = read_sig_meta(index_dir)
    if sig:
        named.update(
            zip(
                sig["sig_cols"],
                binary_sig.sign_word_cols(F.col("v"), sig["dim"]),
            )
        )
    q = read_sq8_meta(index_dir)
    if q:
        named.update(
            zip(
                q["sq8_cols"],
                sq8_codec.sq8_word_cols(F.col("v"), q["mins"], q["maxs"]),
            )
        )
    m = read_mrl_meta(index_dir)
    if m:
        named[m["mrl_col"]] = F.slice(F.col("v"), 1, m["dim_pre"])
    return named


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    nlist: int,
    out_dir: str | None = None,
    attrs: tuple[str, ...] = (),
    sigs: bool = False,
    sq8: bool = False,
    mrl_dim: int | None = None,
) -> str:
    """Assign every vector to its nearest centroid; write by list_id.

    Centroids are the first ``nlist`` vectors by vec_id (deterministic
    seed set, bounded collect). The corpus lands partitioned by
    ``list_id`` with the centroid table alongside at ``centroids/``.

    ``attrs`` names extra scalar columns of the embeddings table to
    store ALONGSIDE the vectors (the filtered-search layout: a
    metadata predicate can then be pushed into the pruned list scan
    instead of joining back to the base table per probe). Attr-bearing
    layouts live in their own directory (``ivf_<attrs>``) so the plain
    index and its cached builds are untouched.

    ``sigs=True`` additionally MATERIALIZES the binary sign-bit
    signature words (``functions/binary_sig``) next to each vector —
    the committed-layout home of the binary-quantization probe: a
    Hamming scan then reads dim/8 bytes/vector of index state instead
    of re-deriving signatures from the raw float vectors in-scan (the
    32× I/O cut that is the whole point of the binary family at
    100 TB). Signatures are derived state: append/upsert/rebalance
    recompute them from ``v``, so they stay exact through every
    maintenance op (pytest-pinned).

    ``sq8=True`` likewise materializes the per-dimension uint8
    scalar-quantization words (``functions/sq8``): dim bytes/vector —
    the 8-bit rung of the same ladder, an 8× scan cut with far higher
    ranking fidelity than the 1-bit signature. The per-dim (min, max)
    bounds are trained HERE over the build corpus and frozen into the
    ``_SQ8.json`` marker: they are codec state (a PQ-codebook
    analogue), so append/upsert quantize deltas under the same bounds
    (clamped, never retrained) and probes quantize the query with
    them — codes stay comparable across the whole file set forever.

    ``mrl_dim=k`` materializes the Matryoshka PREFIX column
    ``v_pre = v[0:k]`` next to each vector — the COMPONENT cut of the
    same ladder (where sigs/sq8 cut bytes per component): a prefix
    shortlist scan reads k/dim of the vector bytes with zero codec
    state, and parquet's columnar layout makes "the prefix as its own
    column group" literal. Derived state like the others: every write
    path recomputes it from ``v``.
    """
    tag = (
        "ivf"
        + ("_" + "_".join(attrs) if attrs else "")
        + ("_sig" if sigs else "")
        + ("_sq8" if sq8 else "")
        + (f"_mrl{mrl_dim}" if mrl_dim else "")
    )
    out_dir = out_dir or os.path.join(_index_root(), _tag(sf_dir), tag)
    corpus_dir = os.path.join(out_dir, "corpus")
    cent_dir = os.path.join(out_dir, "centroids")
    if _is_built(corpus_dir) and _is_built(cent_dir):
        return out_dir
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        *attrs,
    )
    seed = e.filter(F.col("vec_id") < nlist).orderBy("vec_id").collect()
    cmat = np.stack([np.asarray(r.v) for r in seed])
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    if sigs:
        dim = int(cmat.shape[1])
        e = e.select("*", *binary_sig.sign_word_cols(F.col("v"), dim))
        # marker BEFORE the corpus write: a crash mid-build leaves a
        # marker but no _SUCCESS (harmless — everything gates on
        # _is_built and the rebuild rewrites both); the reverse order
        # could leave a sig-bearing corpus with no marker, and
        # appenders would then demand w-columns from callers
        _write_sig_meta(out_dir, dim)
    if sq8:
        dim = int(cmat.shape[1])
        # ONE aggregate job (2·dim independent min/max, map-side
        # combined) trains the frozen bounds; same marker-before-write
        # crash discipline as the signature marker above
        mins, maxs = sq8_codec.train_bounds(e, "v", dim)
        e = e.select("*", *sq8_codec.sq8_word_cols(F.col("v"), mins, maxs))
        _write_sq8_meta(out_dir, dim, mins, maxs)
    if mrl_dim:
        # no training, no codec state — the prefix IS the derivation;
        # same marker-before-write crash discipline as the others
        e = e.select("*", F.slice(F.col("v"), 1, mrl_dim).alias("v_pre"))
        _write_mrl_meta(out_dir, mrl_dim)

    @F.pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ cnorm.T, axis=1).astype(np.int64))

    (
        e.withColumn("list_id", assign(F.col("v")))
        .repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(corpus_dir)
    )
    (
        e.filter(F.col("vec_id") < nlist)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("centroid"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(cent_dir)
    )
    return out_dir


def append_ivf_index(spark: SparkSession, index_dir: str, vectors: DataFrame) -> None:
    """Incrementally index a delta of vectors into the IVF layout.

    New vectors are coarse-quantized against the *existing* centroid
    table (frozen at build time — the standard IVF serving contract;
    re-training centroids is an offline rebuild) and appended into
    their ``list_id`` partitions as new files. Existing files are never
    rewritten; probes see appended vectors on the next pruned read.

    The appended payload mirrors the EXISTING corpus schema: on an
    attr-bearing layout (``build_ivf_index(attrs=...)``) the delta
    must carry every stored attr column — otherwise appended rows
    would land attr-null and a filtered probe's equality predicate
    would silently drop them forever. A missing column fails loudly
    here instead (pytest). Signature words on a sig-bearing layout
    (``build_ivf_index(sigs=True)``) are the exception: they are
    DERIVED state (a pure function of ``v``) recomputed here for the
    delta — callers never supply them, so they can never drift from
    the vectors they summarize.
    """
    payload = [
        f.name
        for f in spark.read.parquet(os.path.join(index_dir, "corpus")).schema
        if f.name != "list_id"
    ]
    named = _derived_col_map(index_dir)
    missing = [
        c for c in payload if c not in vectors.columns and c not in named
    ]
    if missing:
        raise ValueError(
            f"append delta lacks stored attr column(s) {missing}; the "
            f"layout at {index_dir} stores {payload} per vector"
        )
    cent = sorted(
        spark.read.parquet(_centroid_dir(index_dir)).collect(),
        key=lambda r: r.centroid_id,
    )
    cmat = np.stack([np.asarray(r.centroid) for r in cent])
    ids = np.array([r.centroid_id for r in cent])
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @F.pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(ids[np.argmax(mat @ cnorm.T, axis=1)].astype(np.int64))

    if named:
        delta = vectors.select(
            *[
                named[c].alias(c) if c in named else F.col(c)
                for c in payload  # corpus schema order
            ]
        )
    else:
        delta = vectors.select(*payload)
    (
        delta.withColumn("list_id", assign(F.col("v")))
        .repartition("list_id")
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(os.path.join(index_dir, "corpus"))
    )


# --------------------------------------------------------------------------
# snapshot-isolated index versioning (Iceberg-style file manifest)
# --------------------------------------------------------------------------
#
# Raw directory listing races with appends: a probe that lists while a
# multi-file append is landing sees SOME of the new files — a torn
# read. The warehouse answer (what Iceberg/Delta do) is a file
# manifest: readers resolve the file set from a versioned MANIFEST
# swapped atomically (os.replace), so every probe sees a consistent
# snapshot — all of an append or none of it — and writers never block
# readers. Same commit design as streaming.maintenance.TxnView.


def _index_manifest_path(index_dir: str) -> str:
    # underscore-prefixed so Spark's file listing IGNORES it: the
    # manifest lives inside the corpus directory, and a raw
    # ``spark.read.parquet(corpus_dir)`` must not trip over a JSON
    # file when inferring schema/partitions (latent until a committed
    # layout was raw-probed; caught by the tombstone pytest).
    return os.path.join(index_dir, "_MANIFEST.json")


def _legacy_manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "MANIFEST.json")


def _drop_legacy_manifest(index_dir: str) -> None:
    """A commit under the new name supersedes any pre-rename manifest;
    removing it keeps raw directory reads clean on old cached dirs."""
    try:
        os.remove(_legacy_manifest_path(index_dir))
    except FileNotFoundError:
        pass


def _list_parquet_files(index_dir: str) -> list[str]:
    out = []
    for dirpath, dirs, files in os.walk(index_dir):
        # sidecars (the tombstone set) are metadata, not data: they
        # must never enter a snapshot's file list — an explicit file
        # list overrides Spark's underscore-ignoring convention.
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def gc_orphan_builds(
    root: str,
    man: dict,
    own_build: str | None = None,
    min_age_s: float = 3600.0,
) -> list[str]:
    """Reclaim ``build-*`` dirs under ``root`` that the committed
    manifest does not reference — the loser of a first-writer-wins
    race, or a builder that crashed between its parquet write and the
    manifest link, would otherwise leak its build forever (pair and
    component relations are sizable). The caller's OWN losing build is
    removed unconditionally; OTHER unreferenced builds only once older
    than ``min_age_s`` judged by the NEWEST mtime found recursively
    inside the dir — Spark task writes land under ``_temporary/`` and
    never refresh the top-level dir's mtime, so a top-level gate could
    rmtree an in-flight build slower than ``min_age_s`` out from under
    its concurrent builder (its job commit would then fail). Returns
    the removed paths."""
    import shutil
    import time

    rootp = os.path.realpath(root)
    live = set()
    for f in man.get("files", ()):
        d = os.path.dirname(os.path.realpath(f))
        while d not in ("/", "") and os.path.dirname(d) != rootp:
            d = os.path.dirname(d)
        live.add(d)
    removed = []
    try:
        entries = os.listdir(rootp)
    except OSError:
        return removed
    now = time.time()

    def _newest_mtime(d: str) -> float:
        # recursive: a write in flight under _temporary/ keeps the
        # build "young" even when the top-level dir's mtime is stale.
        newest = os.path.getmtime(d)
        for dirpath, _dirs, files in os.walk(d):
            try:
                newest = max(newest, os.path.getmtime(dirpath))
                for f in files:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, f))
                    )
            except OSError:
                continue  # racing writer/GC — skip the vanished entry
        return newest

    for e in entries:
        p = os.path.join(rootp, e)
        if not e.startswith("build-") or not os.path.isdir(p) or p in live:
            continue
        try:
            is_own = own_build is not None and os.path.realpath(own_build) == p
            if is_own or (now - _newest_mtime(p)) > min_age_s:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        except OSError:
            continue  # concurrent GC / racing builder — leave it
    return removed


def _sidecar_tombstone_files(data_dir: str) -> list[str]:
    """The tombstone sidecar's current parquet files, resolved from a
    layout's DATA dir: the sidecar lives beside the data dir for IVF
    (``root/corpus`` + ``root/_tombstones``) and PQ (``root/codes``),
    and inside it for the LSH band table — both locations are checked
    so every commit function can capture the mask regardless of
    layout."""
    out: list[str] = []
    for cand in (
        os.path.join(data_dir, "_tombstones"),
        os.path.join(os.path.dirname(data_dir), "_tombstones"),
    ):
        if os.path.isdir(cand):
            for dirpath, _dirs, files in os.walk(cand):
                out.extend(
                    os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
                )
    return sorted(set(out))


def _layout_data_dir(index_dir: str) -> str | None:
    """The manifest-bearing data dir of a layout root (``corpus`` for
    IVF, ``codes`` for PQ, the dir itself for an LSH band table), or
    None when no snapshot has been committed anywhere — the signal
    that the layout runs raw-listing reads and deletes need no
    commit."""
    for sub in ("corpus", "codes", ""):
        d = os.path.join(index_dir, sub) if sub else index_dir
        if read_index_manifest(d)["files"]:
            return d
    return None


def _history_dir(index_dir: str) -> str:
    # underscore-prefixed: lives inside the data dir, invisible to
    # Spark's file listing like the manifest itself.
    return os.path.join(index_dir, "_manifest_history")


def index_versions(index_dir: str) -> list[int]:
    """Committed snapshot versions still readable via
    ``read_index_manifest(version=...)`` — the Delta `DESCRIBE
    HISTORY` analog. Empty for layouts committed before history
    retention existed (only new commits append history)."""
    hist = _history_dir(index_dir)
    if not os.path.isdir(hist):
        return []
    out = []
    for f in os.listdir(hist):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def expire_index_versions(index_dir: str, keep_last: int = 10) -> int:
    """Drop the oldest history manifests beyond ``keep_last`` — the
    retention pass (`expire_snapshots` for the vector store). The
    CURRENT manifest is untouched, TAGGED versions are retention-
    exempt (the merge.py tag contract — a pinned index snapshot
    stays time-travel-readable); only untagged expired versions stop
    resolving. Returns manifests removed."""
    versions = index_versions(index_dir)
    pinned = set(index_tags(index_dir).values())
    removed = 0
    for v in versions[:-keep_last] if keep_last else versions:
        if v in pinned:
            continue
        try:
            os.remove(os.path.join(_history_dir(index_dir), f"v{v}.json"))
            removed += 1
        except FileNotFoundError:
            pass
    return removed


def restore_index_version(index_dir: str, version: int) -> dict:
    """RESTORE for the vector-store layout — the index-side twin of
    ``VersionedMergeTable.restore`` (the r07g table feature): publish
    snapshot ``version``'s exact state (file set, tombstone mask,
    centroid/codebook pointers) as the NEXT manifest version. The
    rollback is an APPENDED commit: history is never rewritten, every
    in-between version stays time-travel-readable, and probes pinned
    to pre-restore manifests are untouched.

    Zero-copy, with the listing-commit bookkeeping done right:
    files live in the restored snapshot leave the ``retired`` set
    (a later ``commit_index_snapshot`` must not drop them), while the
    files the rollback supersedes ENTER it (a later listing commit
    must not resurrect them; ``vacuum_index`` may then reclaim them).
    Same post-VACUUM caveat as Delta: restoring to a version whose
    retired files a vacuum already reclaimed fails at probe time.
    Single-maintainer op like the rest of the maintenance surface.
    """
    import json

    cur = read_index_manifest(index_dir)
    target = read_index_manifest(index_dir, version=version)
    if int(target["version"]) == int(cur["version"]):
        raise ValueError(
            f"v{version} is already the current version of {index_dir}"
        )
    tfiles = set(target["files"])
    retired = sorted(
        (set(cur.get("retired", [])) | set(cur["files"])) - tfiles
    )
    # the tombstone SIDECAR is live state: a delete the rollback
    # un-does still has its file on disk, and a later listing commit
    # would re-apply it. Retire superseded tombstone files exactly
    # like superseded data files — listing commits skip them.
    keep_tombs = set(target.get("tombstones", []))
    retired_tombs = sorted(
        (
            set(cur.get("retired_tombstones", []))
            | set(_sidecar_tombstone_files(index_dir))
        )
        - keep_tombs
    )
    new_man = {
        **target,
        "version": int(cur["version"]) + 1,
        "retired": retired,
        "retired_tombstones": retired_tombs,
    }
    tmp = _index_manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, _index_manifest_path(index_dir))  # the atomic commit
    _record_history(index_dir, new_man)
    return new_man


def _tags_path(index_dir: str) -> str:
    return os.path.join(_history_dir(index_dir), "_tags.json")


def index_tags(index_dir: str) -> dict[str, int]:
    """Named refs on the index history: tag → pinned version
    (merge.py's table tags, on the vector store's manifest files)."""
    import json

    try:
        with open(_tags_path(index_dir)) as f:
            return {n: int(v) for n, v in json.load(f).items()}
    except FileNotFoundError:
        return {}


def _write_tags(index_dir: str, tags: dict[str, int]) -> None:
    import json

    os.makedirs(_history_dir(index_dir), exist_ok=True)
    tmp = _tags_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(tags, f)
    os.replace(tmp, _tags_path(index_dir))


def tag_index_version(
    index_dir: str, name: str, version: int | None = None
) -> int:
    """Pin ``version`` (default: current) under an immutable name —
    the audit handle for "the index build we served release X with".
    Tagged versions survive ``expire_index_versions``; resolve with
    ``read_index_manifest(tag=...)`` and pin probes to it via
    ``man=``. Single-maintainer op like the rest of the index
    maintenance surface (tag writes are atomic but not serialized
    against each other). Returns the pinned version."""
    cur = read_index_manifest(index_dir)
    target = int(cur["version"]) if version is None else int(version)
    known = set(index_versions(index_dir)) | {int(cur["version"])}
    if target not in known or target == 0:
        raise FileNotFoundError(
            f"cannot tag v{target}: no such committed version in {index_dir}"
        )
    tags = index_tags(index_dir)
    if name in tags:
        raise FileExistsError(
            f"tag {name!r} already exists in {index_dir} (-> v{tags[name]})"
        )
    # ensure the tagged version resolves even for layouts whose commit
    # predated history retention (current manifest but no history file)
    if target == int(cur["version"]):
        hist_file = os.path.join(_history_dir(index_dir), f"v{target}.json")
        if not os.path.exists(hist_file):
            _record_history(index_dir, cur)
    tags[name] = target
    _write_tags(index_dir, tags)
    return target


def delete_index_tag(index_dir: str, name: str) -> None:
    """Drop a tag; the pinned version becomes expirable again."""
    tags = index_tags(index_dir)
    if name not in tags:
        raise KeyError(f"no tag {name!r} in {index_dir}")
    del tags[name]
    _write_tags(index_dir, tags)


def _record_history(index_dir: str, man: dict) -> None:
    import json

    hist = _history_dir(index_dir)
    os.makedirs(hist, exist_ok=True)
    tmp = os.path.join(hist, f"v{man['version']}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(hist, f"v{man['version']}.json"))


def read_index_manifest(
    index_dir: str, version: int | None = None, tag: str | None = None
) -> dict:
    """The CURRENT committed manifest, or — with ``version`` /
    ``tag`` — a historical one (time travel: pass the result as
    ``man=`` to the snapshot probes to read the index exactly as of
    that commit; note ``vacuum_index`` may have reclaimed a retired
    version's data files, the same post-VACUUM caveat as Delta time
    travel)."""
    import json

    if tag is not None:
        if version is not None:
            raise ValueError("pass version= or tag=, not both")
        tags = index_tags(index_dir)
        if tag not in tags:
            raise KeyError(f"no tag {tag!r} in {index_dir}")
        version = tags[tag]
    if version is not None:
        path = os.path.join(_history_dir(index_dir), f"v{version}.json")
        with open(path) as f:  # FileNotFoundError: expired or never committed
            return json.load(f)
    path = _index_manifest_path(index_dir)
    if os.path.exists(path):
        data, hit = _cached_sidecar_json(path)
        read_index_manifest.last_cached = hit
        return data
    legacy = _legacy_manifest_path(index_dir)  # pre-rename cached dirs
    if os.path.exists(legacy):
        data, hit = _cached_sidecar_json(legacy)
        read_index_manifest.last_cached = hit
        return data
    read_index_manifest.last_cached = False
    return {"version": 0, "files": []}


read_index_manifest.last_cached = False


def commit_index_snapshot(index_dir: str) -> dict:
    """Publish every data file currently on disk as the next snapshot.

    Called by the builder after the initial write and by appenders
    after their files land: the listing-to-manifest step is the COMMIT;
    files written but not yet committed are invisible to manifest
    readers. Returns the new manifest.
    """
    import json

    man = read_index_manifest(index_dir)
    # files a rebalance superseded ("retired") stay on disk for pinned
    # readers but must never re-enter a listing-based commit; any other
    # extra manifest keys (e.g. the centroid-table pointer) carry over.
    retired = set(man.get("retired", []))
    files = [f for f in _list_parquet_files(index_dir) if f not in retired]
    # the delete mask is VERSIONED STATE: each snapshot records the
    # tombstone files that existed at commit time, so a reader pinned
    # to version N never sees a delete committed at N+1 (snapshot
    # isolation for deletes, not just appends).
    man = {
        **man,
        "version": man["version"] + 1,
        "files": files,
        # restore-retired tombstone files must not re-enter (their
        # delete was rolled back) — same rule as retired data files
        "tombstones": [
            t
            for t in _sidecar_tombstone_files(index_dir)
            if t not in set(man.get("retired_tombstones", []))
        ],
    }
    tmp = _index_manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _index_manifest_path(index_dir))  # the atomic commit
    _record_history(index_dir, man)  # time-travel copy (post-commit:
    # a crash here loses at most this version's history entry, never
    # the commit itself)
    _drop_legacy_manifest(index_dir)
    return man


def commit_index_files(
    index_dir: str, files: list[str], extra: dict | None = None
) -> dict:
    """Publish an EXPLICIT file set as the next snapshot — the
    rebuild/rebalance commit: superseded files stay on disk for
    readers pinned to older manifests, but leave the manifest (and are
    recorded under ``retired`` so later listing-based commits don't
    resurrect them; ``vacuum_index`` reclaims the space)."""
    import json

    man = read_index_manifest(index_dir)
    man = {**man, "version": man["version"] + 1, "files": sorted(files),
           "tombstones": [
               t
               for t in _sidecar_tombstone_files(index_dir)
               if t not in set(man.get("retired_tombstones", []))
           ],
           **(extra or {})}
    tmp = _index_manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _index_manifest_path(index_dir))
    _record_history(index_dir, man)
    _drop_legacy_manifest(index_dir)
    return man


def _tombstone_dir(index_dir: str) -> str:
    # underscore-prefixed: for the LSH layout the sidecar lives INSIDE
    # the raw-read band-table directory, where Spark must ignore it.
    return os.path.join(index_dir, "_tombstones")


def delete_index_vectors(spark: SparkSession, index_dir: str, vec_ids) -> int:
    """Logically delete vectors from an ANN layout — the missing CRUD
    member (build/append/rebalance/retrain/vacuum already exist).
    Works on any of the three layouts: pass the IVF root, the PQ
    root, or the LSH band-table dir; every probe of that layout masks
    the tombstoned ids.

    Deletes are TOMBSTONES: a tiny (vec_id) parquet appended next to
    the corpus; no committed data file is touched and appenders are
    not blocked. Probes mask tombstoned ids with one broadcast
    anti-join (tombstone-sized, bounded — deletes are rare relative
    to corpus). The next ``rebalance_ivf_index`` applies them
    PHYSICALLY (deleted rows are dropped from the rewritten snapshot);
    ``compact_ivf_tombstones`` then retires entries no longer present
    in any committed file. Replay-idempotent: re-deleting an id only
    grows the sidecar, never changes probe results.

    On a layout with a committed snapshot the delete COMMITS a new
    version (the manifest records the sidecar's file set per
    snapshot), so readers pinned to the pre-delete manifest keep an
    unmasked view — snapshot isolation — while fresh probes mask
    immediately. Uncommitted layouts keep raw-sidecar semantics.
    Single-maintainer contract (shared with rebalance/retrain): the
    listing-based commit would publish a concurrent append's
    half-landed files."""
    ids = sorted({int(x) for x in vec_ids})
    (
        spark.createDataFrame([(i,) for i in ids], "vec_id BIGINT")
        .coalesce(1)
        .write.mode("append")
        .parquet(_tombstone_dir(index_dir))
    )
    data_dir = _layout_data_dir(index_dir)
    if data_dir is not None:
        commit_index_snapshot(data_dir)
    return len(ids)


#: IVF-named alias kept for the maintenance-suite vocabulary.
delete_ivf_vectors = delete_index_vectors


def _apply_tombstones(
    spark: SparkSession,
    index_dir: str,
    df: DataFrame,
    tomb_files: list[str] | None = None,
) -> DataFrame:
    """Mask deleted ids. ``tomb_files`` is the MANIFEST'S tombstone
    file list for snapshot-resolved reads: an empty list means "this
    snapshot has no deletes" (NOT fallback), so a pinned reader never
    sees a later delete. ``None`` means raw semantics — uncommitted
    layouts and pre-versioning manifests read the live sidecar dir."""
    if tomb_files is not None:
        if not tomb_files:
            return df
        t = spark.read.parquet(*tomb_files).select("vec_id").distinct()
        return df.join(F.broadcast(t), "vec_id", "left_anti")
    tomb = _tombstone_dir(index_dir)
    if not _is_built(tomb):
        return df
    t = spark.read.parquet(tomb).select("vec_id").distinct()
    return df.join(F.broadcast(t), "vec_id", "left_anti")


def compact_ivf_tombstones(spark: SparkSession, index_dir: str) -> int:
    """Drop tombstone entries whose rows no longer exist in the
    CURRENT committed snapshot (a rebalance applied them physically).
    Entries still live in a committed file are kept — they are the
    masking state for deletes since the last rebalance. Same
    grace-period contract as ``vacuum_index``: run only once no
    reader is pinned to a pre-rebalance manifest (those manifests'
    files still contain the physically-deleted rows, and this compact
    removes their mask). Returns entries dropped."""
    tomb = _tombstone_dir(index_dir)
    if not _is_built(tomb):
        return 0
    t = spark.read.parquet(tomb).select("vec_id").distinct().localCheckpoint()
    live = snapshot_scan(spark, os.path.join(index_dir, "corpus")).select("vec_id")
    keep = t.join(live, "vec_id", "left_semi").localCheckpoint()
    dropped = t.count() - keep.count()
    keep.coalesce(1).write.mode("overwrite").parquet(tomb)
    # the overwrite replaced the sidecar's files; commit so the
    # manifest's versioned tombstone list points at the rewritten set
    # (pre-compact manifests reference deleted sidecar files — the
    # documented no-pinned-readers grace contract above).
    data_dir = _layout_data_dir(index_dir)
    if data_dir is not None:
        commit_index_snapshot(data_dir)
    return int(dropped)


def upsert_ivf_vectors(spark: SparkSession, index_dir: str, vectors: DataFrame) -> dict:
    """Atomically replace vectors by id — copy-on-write upsert.

    A delete+append pair is two visibility events: a probe between
    them would see the id missing entirely. This is the one-commit
    version (the Delta/Iceberg MERGE shape): files containing the
    upserted ids are REWRITTEN without them (copy-on-write — cost ∝
    touched files, never corpus), the replacement rows stage through
    ``append_ivf_index`` (quantized against the current centroids,
    attr schema enforced), and ONE ``commit_index_files`` swap
    publishes {untouched + rewritten + delta} while retiring the
    touched files. Readers see the old vector or the new vector,
    never neither; readers pinned to the pre-upsert manifest keep the
    old rows (``vacuum_index`` reclaims them after the grace period).

    An upserted id that was previously DELETED is resurrected: its
    sidecar tombstone entries are dropped (bounded sidecar rewrite,
    same no-pinned-readers grace contract as
    ``compact_ivf_tombstones`` — skipped entirely when no upserted id
    is tombstoned, the common case).

    Scale shape: touched-file discovery is a broadcast semi-join over
    the snapshot scan collecting FILE NAMES (bounded by batch size ×
    rows-per-file, never corpus rows); the rewrite moves only touched
    files' rows; nothing driver-side scales with the corpus.
    Single-maintainer contract, like rebalance.
    """
    from urllib.parse import unquote, urlparse

    corpus_dir = os.path.join(index_dir, "corpus")
    man = read_index_manifest(corpus_dir)
    if not man["files"]:
        raise FileNotFoundError(
            f"upsert requires a committed snapshot in {corpus_dir}; "
            "run commit_index_snapshot after the initial build"
        )
    # schema check FIRST — a failed upsert must abort before any write
    # (the same loud-attr contract as append_ivf_index, re-checked here
    # so the COW rewrite can't run ahead of a doomed append)
    payload = [
        f.name
        for f in spark.read.parquet(corpus_dir).schema
        if f.name != "list_id"
    ]
    derived = _derived_col_map(index_dir)
    missing = [
        c for c in payload if c not in vectors.columns and c not in derived
    ]  # sig/SQ8 words are derived by the append leg, never supplied
    if missing:
        raise ValueError(
            f"upsert delta lacks stored attr column(s) {missing}; the "
            f"layout at {index_dir} stores {payload} per vector"
        )
    ids = vectors.select("vec_id").distinct().localCheckpoint()

    # files whose rows are being replaced (URI → plain path to match
    # the manifest's os.walk paths)
    scan = snapshot_scan(spark, corpus_dir, man=man)
    touched = sorted(
        unquote(urlparse(r.f).path)
        for r in scan.join(F.broadcast(ids), "vec_id", "left_semi")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )

    before = set(_list_parquet_files(corpus_dir))
    if touched:
        keep = (
            spark.read.option("basePath", corpus_dir)
            .parquet(*touched)
            .join(F.broadcast(ids), "vec_id", "left_anti")
        )
        (
            keep.repartition("list_id")
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(corpus_dir)
        )
    append_ivf_index(spark, index_dir, vectors)
    new_files = [f for f in _list_parquet_files(corpus_dir) if f not in before]

    # resurrect previously-deleted ids: drop them from the sidecar so
    # the versioned mask captured by the commit below excludes them
    tomb = _tombstone_dir(index_dir)
    if _is_built(tomb):
        t = spark.read.parquet(tomb).select("vec_id").distinct().localCheckpoint()
        overlap = t.join(F.broadcast(ids), "vec_id", "left_semi").count()
        if overlap:
            survivors = (
                t.join(F.broadcast(ids), "vec_id", "left_anti").localCheckpoint()
            )
            survivors.coalesce(1).write.mode("overwrite").parquet(tomb)

    touched_set = set(touched)
    files = [f for f in man["files"] if f not in touched_set] + new_files
    retired = man.get("retired", []) + touched
    new_man = commit_index_files(corpus_dir, files, extra={"retired": retired})
    return {
        "version": new_man["version"],
        "n_touched_files": len(touched),
        "n_new_files": len(new_files),
    }


def vacuum_index(index_dir: str) -> int:
    """Delete the ``retired`` data files of ``index_dir``'s manifest
    and clear the list. Call only once no reader is pinned to a
    pre-rebalance manifest (the same grace-period contract as
    Delta VACUUM); the current snapshot is untouched. Returns the
    number of files removed."""
    import json

    man = read_index_manifest(index_dir)
    removed = 0
    for f in man.get("retired", []):
        try:
            os.remove(f)
            removed += 1
        except FileNotFoundError:
            pass
    man = {**man, "retired": []}
    tmp = _index_manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _index_manifest_path(index_dir))
    return removed


def snapshot_scan(
    spark: SparkSession, index_dir: str, man: dict | None = None
) -> DataFrame:
    """Read the index AT ITS COMMITTED SNAPSHOT — uncommitted appended
    files are excluded. ``basePath`` keeps the (band, code)/(list_id)
    partition columns parsed from the file paths, so partition pruning
    on the manifest's file subset works exactly as on a raw read.
    Pass ``man`` to pin a previously-read manifest (one consistent
    resolve per probe — the caller's tombstone mask and file set then
    come from the SAME version)."""
    if man is None:
        man = read_index_manifest(index_dir)
    if not man["files"]:
        raise FileNotFoundError(f"no committed snapshot in {index_dir}")
    return spark.read.option("basePath", index_dir).parquet(*man["files"])


def probe_lsh_snapshot(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    planes: np.ndarray,
    band_bits: int,
) -> DataFrame:
    """``probe_lsh_index`` against the committed snapshot: identical
    pruned (band, code) read, torn-append-proof."""
    codes = band_codes(qvec, planes, band_bits)
    man = read_index_manifest(index_dir)
    scan = snapshot_scan(spark, index_dir, man=man)
    hit = None
    for band, code in enumerate(codes):
        cond = (F.col("band") == band) & (F.col("code") == code)
        hit = cond if hit is None else (hit | cond)
    return _apply_tombstones(
        spark,
        index_dir,
        scan.filter(hit).dropDuplicates(["vec_id"]).select("vec_id", "v"),
        tomb_files=man.get("tombstones"),
    )


def probe_lsh_snapshot_multi(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    planes: np.ndarray,
    band_bits: int,
    n_flips: int,
    man: dict | None = None,
) -> DataFrame:
    """``probe_lsh_index_multi`` against the committed snapshot — the
    streaming serving tier's recall dial (r10, VERDICT r09 #2): the
    SAME pinned perturbation sequence (``multiprobe_band_codes`` —
    own bucket + the ``n_flips`` lowest-|margin| bit flips per band,
    margin-asc plane-index-tiebreak order), the same pruned
    (1 + n_flips) × n_bands (band, code) partition read, resolved
    through the manifest (torn-append-proof) and tombstone-masked.
    Recall is bought with probe PARTITIONS of the one committed
    table, never extra tables — the measured batch-path point
    (recall@10 0.30 → 0.70 at sf0.1, ``lsh_multiprobe_eval``)
    carries over verbatim because candidate membership is a pure
    function of (query, planes, committed file set)."""
    probe = multiprobe_band_codes(qvec, planes, band_bits, n_flips)
    if man is None:
        man = read_index_manifest(index_dir)
    scan = snapshot_scan(spark, index_dir, man=man)
    hit = None
    for band, codes in enumerate(probe):
        cond = (F.col("band") == band) & (
            F.col("code").isin([int(c) for c in codes])
        )
        hit = cond if hit is None else (hit | cond)
    return _apply_tombstones(
        spark,
        index_dir,
        scan.filter(hit).dropDuplicates(["vec_id"]).select("vec_id", "v"),
        tomb_files=man.get("tombstones"),
    )


# --------------------------------------------------------------------------
# PQ (product quantization) index
# --------------------------------------------------------------------------

#: Lloyd iterations / sample size for the deterministic codebook fit.
PQ_TRAIN_ROWS = 512
PQ_TRAIN_ITERS = 5


def _fit_codebooks(train: np.ndarray, m: int, ksub: int) -> np.ndarray:
    """Deterministic per-subspace k-means: first-k init + fixed Lloyd
    iterations over a bounded training sample. Returns (m, ksub, dsub)."""
    dim = train.shape[1]
    dsub = dim // m
    books = np.empty((m, ksub, dsub))
    for sub in range(m):
        x = train[:, sub * dsub : (sub + 1) * dsub]
        c = x[:ksub].copy()
        for _ in range(PQ_TRAIN_ITERS):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(ksub):
                pts = x[assign == k]
                if len(pts):
                    c[k] = pts.mean(axis=0)
        books[sub] = c
    return books


def build_pq_index(
    spark: SparkSession,
    sf_dir: str,
    m: int = 8,
    ksub: int = 16,
    out_dir: str | None = None,
) -> str:
    """Product-quantize the corpus: per-vector M subspace codes, no vectors.

    The 100 TB memory story: a 64-dim float32 vector is 256 bytes; its
    PQ form is M=8 one-byte codes — 32× smaller. The codes table is
    written WITHOUT the raw vectors (columnar: vec_id + m tinyint
    columns), so the ADC scan reads a few bytes per vector and the full
    vectors are touched only for the final candidate re-rank.

    Codebooks are fit deterministically (first-k init, fixed Lloyd
    iterations, first ``PQ_TRAIN_ROWS`` vectors as the training sample —
    a bounded collect like IVF's seed set) and stored alongside at
    ``codebooks/`` as (sub, k, centroid) rows.
    """
    out_dir = out_dir or os.path.join(_index_root(), _tag(sf_dir), "pq")
    codes_dir = os.path.join(out_dir, "codes")
    books_dir = os.path.join(out_dir, "codebooks")
    if _is_built(codes_dir) and _is_built(books_dir):
        return out_dir
    e = _embeddings(spark, sf_dir)
    train_rows = e.filter(F.col("vec_id") < PQ_TRAIN_ROWS).orderBy("vec_id").collect()
    train = np.stack([np.asarray(r.v) for r in train_rows])
    books = _fit_codebooks(train, m, ksub)
    dsub = train.shape[1] // m

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        codes = np.empty((len(emb), m), dtype=np.int32)
        for sub in range(m):
            x = mat[:, sub * dsub : (sub + 1) * dsub]
            d2 = ((x[:, None, :] - books[sub][None, :, :]) ** 2).sum(axis=2)
            codes[:, sub] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    coded = e.withColumn("codes", encode(F.col("v")))
    (
        coded.select(
            "vec_id",
            *[
                F.element_at(F.col("codes"), i + 1).cast("int").alias(f"code_{i}")
                for i in range(m)
            ],
        )
        .write.mode("overwrite")
        .parquet(codes_dir)
    )
    book_rows = [
        (sub, k, [float(x) for x in books[sub][k]])
        for sub in range(m)
        for k in range(ksub)
    ]
    (
        spark.createDataFrame(book_rows, "sub int, k int, centroid array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(books_dir)
    )
    return out_dir


def _codebook_dir(index_dir: str, man: dict | None = None) -> str:
    """The CURRENT codebook table: the codes manifest's ``codebooks``
    pointer once a retrain has re-fit them, else the build-time
    default. Pass the manifest when codes and codebooks must resolve
    from ONE read (snapshot probes — a retrain commit between two
    reads would pair new books with old codes)."""
    if man is None:
        man = read_index_manifest(os.path.join(index_dir, "codes"))
    return os.path.join(index_dir, man.get("codebooks", "codebooks"))


def _load_codebooks(
    spark: SparkSession, index_dir: str, books_dir: str | None = None
) -> np.ndarray:
    """(m, ksub, dsub) codebook tensor from the stored rows. Codebook
    TABLES are immutable once written (appends encode against the
    current one — the standard PQ live-index contract; a retrain
    writes a NEW versioned table and swaps the manifest pointer), so
    the raw read is snapshot-safe."""
    books = spark.read.parquet(books_dir or _codebook_dir(index_dir)).collect()
    m = max(r.sub for r in books) + 1
    ksub = max(r.k for r in books) + 1
    dsub = len(books[0].centroid)
    out = np.zeros((m, ksub, dsub))
    for r in books:
        out[r.sub][r.k] = np.asarray(r.centroid)
    return out


def _adc_rank(
    codes: DataFrame, books: np.ndarray, qvec: np.ndarray, n_candidates: int
) -> DataFrame:
    """Rank a codes relation by asymmetric-distance table lookups."""
    m, ksub, dsub = books.shape
    table = np.array(
        [books[sub] @ qvec[sub * dsub : (sub + 1) * dsub] for sub in range(m)]
    )
    score = None
    for sub in range(m):
        lut = F.array(*[F.lit(float(x)) for x in table[sub]])
        term = F.element_at(lut, F.col(f"code_{sub}") + 1)
        score = term if score is None else (score + term)
    return (
        codes.select("vec_id", score.alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc("vec_id"))
        .limit(n_candidates)
    )


def probe_pq_index(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    n_candidates: int,
) -> DataFrame:
    """ADC scan: rank by table lookups over the codes-only table.

    Asymmetric distance computation — the query is NOT quantized; its
    dot product with every codebook centroid is precomputed driver-side
    into M lookup tables of ``ksub`` floats, inlined as array literals.
    The scan then scores each vector as Σ_m table_m[code_m]: M
    ``element_at`` calls per row, whole-stage codegen, reading ONLY the
    code columns (a few bytes/vector — the raw vectors never leave
    disk), and the top ``n_candidates`` come back via
    TakeOrderedAndProject. Returns (vec_id, adc_score) candidates for
    exact re-rank by the caller.
    """
    books = _load_codebooks(spark, index_dir)
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    return _apply_tombstones(
        spark, index_dir, _adc_rank(codes, books, qvec, n_candidates)
    )


def probe_pq_snapshot(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    n_candidates: int,
) -> DataFrame:
    """``probe_pq_index`` against the committed codes snapshot: the ADC
    scan reads exactly the manifest's file set, so a concurrent
    ``append_pq_index`` is invisible until its commit — same
    torn-append contract as ``probe_lsh_snapshot``. Codes AND
    codebooks resolve from ONE manifest read, so a retrain commit
    mid-probe can never pair new books with old codes."""
    codes_dir = os.path.join(index_dir, "codes")
    man = read_index_manifest(codes_dir)
    if not man["files"]:
        raise FileNotFoundError(f"no committed snapshot in {codes_dir}")
    books = _load_codebooks(spark, index_dir, _codebook_dir(index_dir, man))
    codes = spark.read.option("basePath", codes_dir).parquet(*man["files"])
    return _apply_tombstones(
        spark,
        index_dir,
        _adc_rank(codes, books, qvec, n_candidates),
        tomb_files=man.get("tombstones"),
    )


def append_pq_index(spark: SparkSession, index_dir: str, vectors: DataFrame) -> None:
    """Append (vec_id, v) vectors as code rows, encoded with the FROZEN
    codebooks — cost ∝ |batch|, no index rewrite. Invisible to snapshot
    readers until ``commit_index_snapshot(<index_dir>/codes)``."""
    books = _load_codebooks(spark, index_dir)
    m, _ksub, dsub = books.shape

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        codes = np.empty((len(emb), m), dtype=np.int32)
        for sub in range(m):
            x = mat[:, sub * dsub : (sub + 1) * dsub]
            d2 = ((x[:, None, :] - books[sub][None, :, :]) ** 2).sum(axis=2)
            codes[:, sub] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    (
        vectors.withColumn("codes", encode(F.col("v")))
        .select(
            "vec_id",
            *[
                F.element_at(F.col("codes"), i + 1).cast("int").alias(f"code_{i}")
                for i in range(m)
            ],
        )
        .write.mode("append")
        .parquet(os.path.join(index_dir, "codes"))
    )


def retrain_pq_index(
    spark: SparkSession, index_dir: str, vectors: DataFrame
) -> dict:
    """Re-fit the PQ codebooks on the CURRENT corpus and re-encode —
    the PQ member of the drift-maintenance family (§7.17), sharing
    ``rebalance_ivf_index``'s retire/vacuum commit protocol.

    Codes are lossy projections of build-time codebooks: as appended
    vectors drift, quantization error grows and ADC ranking degrades.
    ``vectors`` is the corpus' raw (vec_id, v) table — the base table
    a real deployment keeps anyway; the codes layout is only the
    serving projection. The retrain:

    1. draws a deterministic uniform training sample — the
       ``PQ_TRAIN_ROWS`` smallest md5-slice32(vec_id) rows (the KMV
       rule, so the sample follows the CURRENT distribution instead of
       the build-time id prefix) — one bounded collect;
    2. re-fits codebooks with the same deterministic Lloyd loop as the
       build, writes them as an immutable ``codebooks_v{N}`` table;
    3. re-encodes every vector in one Arrow-batched pass, landing NEW
       code files next to the old ones (no committed file touched);
    4. publishes {new files + codebook pointer} in ONE
       ``commit_index_files`` swap, retiring the old file set — probes
       pinned to the previous manifest keep the old books+codes pair
       (coherence: snapshot probes resolve both from one manifest
       read), later listing-based commits skip retired files, and
       ``vacuum_index`` reclaims them.

    Single-maintainer contract, like the IVF rebalance. Returns audit
    stats including the mean squared reconstruction error of the
    training sample before/after (Lloyd on the drifted sample —
    pytest asserts the drop under drift).
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    codes_dir = os.path.join(index_dir, "codes")
    man = read_index_manifest(codes_dir)
    if not man["files"]:
        raise FileNotFoundError(f"no committed snapshot in {codes_dir}")
    old_books = _load_codebooks(spark, index_dir, _codebook_dir(index_dir, man))
    m, ksub, dsub = old_books.shape

    sample_rows = (
        vectors.select(
            "vec_id",
            "v",
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("_h"),
        )
        .orderBy("_h", "vec_id")
        .limit(PQ_TRAIN_ROWS)
        .collect()
    )
    train = np.stack([np.asarray(r.v) for r in sample_rows])
    books = _fit_codebooks(train, m, ksub)

    def _mse(bks: np.ndarray) -> float:
        err = 0.0
        for sub in range(m):
            x = train[:, sub * dsub : (sub + 1) * dsub]
            d2 = ((x[:, None, :] - bks[sub][None, :, :]) ** 2).sum(axis=2)
            err += float(d2.min(axis=1).sum())
        return err / len(train)

    version = man["version"] + 1
    books_name = f"codebooks_v{version}"
    book_rows = [
        (sub, k, [float(x) for x in books[sub][k]])
        for sub in range(m)
        for k in range(ksub)
    ]
    (
        spark.createDataFrame(book_rows, "sub int, k int, centroid array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, books_name))
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        codes = np.empty((len(emb), m), dtype=np.int32)
        for sub in range(m):
            x = mat[:, sub * dsub : (sub + 1) * dsub]
            d2 = ((x[:, None, :] - books[sub][None, :, :]) ** 2).sum(axis=2)
            codes[:, sub] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    before_files = set(_list_parquet_files(codes_dir))
    (
        vectors.withColumn("codes", encode(F.col("v")))
        .select(
            "vec_id",
            *[
                F.element_at(F.col("codes"), i + 1).cast("int").alias(f"code_{i}")
                for i in range(m)
            ],
        )
        .write.mode("append")
        .parquet(codes_dir)
    )
    new_files = sorted(set(_list_parquet_files(codes_dir)) - before_files)
    retired = sorted(set(man["files"]) | set(man.get("retired", [])))
    commit_index_files(
        codes_dir, new_files, {"codebooks": books_name, "retired": retired}
    )
    return {
        "version": version,
        "n_train": len(train),
        "train_mse_before": round(_mse(old_books), 6),
        "train_mse_after": round(_mse(books), 6),
    }


def _centroid_dir(index_dir: str, man: dict | None = None) -> str:
    """The CURRENT centroid table: the corpus manifest's ``centroids``
    pointer when a rebalance has re-trained them, else the build-time
    default — so probes and appenders always quantize against the
    centroids that produced the committed assignment. Pass ``man`` to
    resolve against a pinned manifest version."""
    if man is None:
        man = read_index_manifest(os.path.join(index_dir, "corpus"))
    return os.path.join(index_dir, man.get("centroids", "centroids"))


def _ivf_probe_lists(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    nprobe: int,
    man: dict | None = None,
) -> list[int]:
    """The query's ``nprobe`` nearest centroid lists (driver-side over
    the nlist-row centroid table — a dim-table read)."""
    cent = sorted(
        spark.read.parquet(_centroid_dir(index_dir, man)).collect(),
        key=lambda r: r.centroid_id,
    )  # parquet row order is not contractual; list choice must be stable
    cmat = np.stack([np.asarray(r.centroid) for r in cent])
    ids = np.array([r.centroid_id for r in cent])
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    order = np.argsort(-(cnorm @ (qvec / np.linalg.norm(qvec))))
    return [int(i) for i in ids[order[:nprobe]]]


def probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    nprobe: int,
    where: F.Column | None = None,
) -> DataFrame:
    """Read only the ``nprobe`` nearest lists — partition pruning.

    List selection happens driver-side; the corpus scan carries a
    ``list_id IN (...)`` partition filter so non-probed directories
    are never opened. ``where`` (a predicate over attr columns stored
    by an attr-bearing build) is applied INSIDE the pruned scan — a
    parquet data filter pushed to the reader, so filtered search
    never rehydrates non-matching vectors.

    File resolution: a layout WITH a committed manifest reads through
    it (a rebalance retires superseded files that stay on disk for
    pinned readers — a raw listing would double-read every vector and
    resurrect physically-deleted rows); an uncommitted layout (plain
    build/append, no snapshot protocol engaged) reads the raw
    listing, where appends are visible immediately."""
    probe = _ivf_probe_lists(spark, index_dir, qvec, nprobe)
    corpus_dir = os.path.join(index_dir, "corpus")
    man = read_index_manifest(corpus_dir)
    if man["files"]:
        corpus = snapshot_scan(spark, corpus_dir, man=man)
        tomb_files = man.get("tombstones")
    else:
        corpus = spark.read.parquet(corpus_dir)
        tomb_files = None
    scan = corpus.filter(F.col("list_id").isin(probe))
    if where is not None:
        scan = scan.filter(where)
    return _apply_tombstones(
        spark, index_dir, scan.select("vec_id", "v"), tomb_files=tomb_files
    )


def probe_ivf_snapshot(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    nprobe: int,
    man: dict | None = None,
) -> DataFrame:
    """``probe_ivf_index`` against the committed corpus snapshot: the
    pruned (list_id) read resolves the manifest's file set, so a
    concurrent ``append_ivf_index`` is invisible until its commit —
    the same torn-append contract as the LSH and PQ routes. Pass
    ``man`` to pin a version: files, centroid pointer AND tombstone
    mask all resolve from that one manifest, so a pinned reader sees
    the index exactly as of its commit — later deletes/upserts
    included."""
    corpus_dir = os.path.join(index_dir, "corpus")
    if man is None:
        man = read_index_manifest(corpus_dir)
    probe = _ivf_probe_lists(spark, index_dir, qvec, nprobe, man=man)
    scan = snapshot_scan(spark, corpus_dir, man=man)
    return _apply_tombstones(
        spark,
        index_dir,
        scan.filter(F.col("list_id").isin(probe)).select("vec_id", "v"),
        tomb_files=man.get("tombstones"),
    )


def probe_binary_snapshot(
    spark: SparkSession,
    index_dir: str,
    qwords: list[int],
    where: F.Column | None = None,
    man: dict | None = None,
) -> DataFrame:
    """Hamming candidates over the COMMITTED signature columns —
    the serving probe of a ``build_ivf_index(sigs=True)`` layout.

    Returns (vec_id, hamming) after the snapshot's tombstone mask.
    The scan projects ONLY vec_id + the packed signature words (+ any
    ``where`` attr, whose predicate is pushed to the parquet reader):
    the raw vector column never enters the read schema
    (plan-asserted), so the probe reads dim/8 bytes of signature per
    vector — the committed-layout version of ``ann_binary_topk``'s
    in-scan derivation, and the reason binary quantization holds at
    100 TB (the whole signature file set page-caches where raw
    vectors cannot). Callers order by (hamming, vec_id) and cut; an
    exact re-rank of the shortlist is ``operators/similarity``'s
    ``_rerank`` (rehydrates a constant number of raw vectors).
    """
    sig = read_sig_meta(index_dir)
    if sig is None:
        raise FileNotFoundError(
            f"{index_dir} stores no signature columns; build with "
            "build_ivf_index(sigs=True)"
        )
    if len(qwords) != len(sig["sig_cols"]):
        raise ValueError(
            f"query signature has {len(qwords)} words; layout stores "
            f"{len(sig['sig_cols'])}"
        )
    corpus_dir = os.path.join(index_dir, "corpus")
    if man is None:
        man = read_index_manifest(corpus_dir)
    scan = snapshot_scan(spark, corpus_dir, man=man)
    if where is not None:
        scan = scan.filter(where)
    cand = scan.select("vec_id", *sig["sig_cols"]).withColumn(
        "hamming", binary_sig.hamming_col(qwords)
    )
    return _apply_tombstones(
        spark,
        index_dir,
        cand.select("vec_id", "hamming"),
        tomb_files=man.get("tombstones"),
    )


def probe_sq8_snapshot(
    spark: SparkSession,
    index_dir: str,
    qcodes: list[int],
    where: F.Column | None = None,
    man: dict | None = None,
) -> DataFrame:
    """Centered symmetric integer-ADC candidates over the COMMITTED
    SQ8 code columns — the serving probe of a
    ``build_ivf_index(sq8=True)`` layout.

    Returns (vec_id, sq8_score) after the snapshot's tombstone mask.
    The scan projects ONLY vec_id + the packed code words (+ any
    ``where`` attr, predicate pushed to the parquet reader): dim bytes
    of code per vector instead of 8·dim of raw doubles — the 8× scan
    cut that, with far better ranking fidelity than the 1-bit
    signature, makes SQ8 the default committed representation in
    production vector stores (FAISS SQ8 / Lucene scalar-quantized
    KNN). ``qcodes`` must come from ``functions/sq8.sq8_codes_py``
    under THIS layout's frozen bounds (``read_sq8_meta``) — quantizing
    the query under any other bounds silently mis-ranks. Callers order
    by (sq8_score DESC, vec_id) and cut; exact re-rank of the
    shortlist rehydrates a constant number of raw vectors.
    """
    meta = read_sq8_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(
            f"{index_dir} stores no SQ8 code columns; build with "
            "build_ivf_index(sq8=True)"
        )
    if len(qcodes) != meta["dim"]:
        raise ValueError(
            f"query has {len(qcodes)} codes; layout stores dim={meta['dim']}"
        )
    corpus_dir = os.path.join(index_dir, "corpus")
    if man is None:
        man = read_index_manifest(corpus_dir)
    scan = snapshot_scan(spark, corpus_dir, man=man)
    if where is not None:
        scan = scan.filter(where)
    cand = scan.select("vec_id", *meta["sq8_cols"]).withColumn(
        "sq8_score", sq8_codec.adc_score_col(qcodes)
    )
    return _apply_tombstones(
        spark,
        index_dir,
        cand.select("vec_id", "sq8_score"),
        tomb_files=man.get("tombstones"),
    )


def probe_mrl_snapshot(
    spark: SparkSession,
    index_dir: str,
    qvec_prefix: list[float],
    where: F.Column | None = None,
    man: dict | None = None,
) -> DataFrame:
    """Matryoshka prefix-cosine candidates over the COMMITTED prefix
    column — the serving probe of a ``build_ivf_index(mrl_dim=k)``
    layout.

    Returns (vec_id, prefix_cosine) after the snapshot's tombstone
    mask. The scan projects ONLY vec_id + ``v_pre`` (+ any ``where``
    attr, predicate pushed to the reader): k/dim of the vector bytes
    — the raw vector column never enters the read schema
    (plan-asserted). Scoring is the same rounded-cosine + vec_id
    discipline as the in-scan key, so a shortlist cut over this probe
    composes into an oracle-checkable serving loop. Callers order by
    (prefix_cosine DESC, vec_id) and cut; exact full-dim re-rank
    rehydrates a constant number of raw vectors.
    """
    import math

    meta = read_mrl_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(
            f"{index_dir} stores no MRL prefix column; build with "
            "build_ivf_index(mrl_dim=...)"
        )
    if len(qvec_prefix) != meta["dim_pre"]:
        raise ValueError(
            f"query prefix has {len(qvec_prefix)} dims; layout stores "
            f"dim_pre={meta['dim_pre']}"
        )
    corpus_dir = os.path.join(index_dir, "corpus")
    if man is None:
        man = read_index_manifest(corpus_dir)
    scan = snapshot_scan(spark, corpus_dir, man=man)
    if where is not None:
        scan = scan.filter(where)
    col = meta["mrl_col"]
    qpre = F.array(*[F.lit(float(x)) for x in qvec_prefix])
    qnorm = float(math.sqrt(sum(float(x) * float(x) for x in qvec_prefix)))
    dot = F.aggregate(
        F.zip_with(F.col(col), qpre, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(F.col(col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cand = scan.select("vec_id", col).withColumn(
        "prefix_cosine", F.round(dot / (nrm * F.lit(qnorm)), 6)
    )
    return _apply_tombstones(
        spark,
        index_dir,
        cand.select("vec_id", "prefix_cosine"),
        tomb_files=man.get("tombstones"),
    )


def rebalance_ivf_index(spark: SparkSession, index_dir: str) -> dict:
    """Re-train centroids and re-assign the committed corpus — the
    §7.15 "IVF list re-balancing after drift" maintenance pass.

    Appends quantize against build-time centroids, so a drifting
    stream piles into few lists: probes of those lists degrade toward
    scans while empty lists waste nprobe. One Lloyd iteration fixes
    it: each list's new centroid is the MEAN of its current members,
    then every vector re-assigns to its nearest new centroid.

    Scale shape: the per-list mean is a posexplode + (list_id, pos)
    groupBy — partial-aggregated map-side, collecting exactly
    nlist × dim rows regardless of corpus size (the PCA tree-reduce
    discipline); re-assignment is one Arrow-batched pass against the
    broadcast nlist × dim matrix; the rewrite is one shuffle by the
    new list_id. Nothing driver-side ever scales with the corpus.

    Commit protocol: new corpus files land as APPENDED files (no
    committed file is touched), the re-trained centroid table lands at
    ``centroids_v{N}``, then one ``commit_index_files`` swap publishes
    exactly {new files + centroid pointer} and retires the old file
    set — probes pinned to the previous manifest keep reading the old
    assignment (pytest-asserted); the serving jobs pick up the new one
    at their next micro-batch. Single-maintainer contract, like
    ``VersionedMergeTable``'s writer model: run from the one
    maintenance job, not concurrently with appenders.
    """
    import pandas as pd
    from pyspark.sql.types import LongType

    corpus_dir = os.path.join(index_dir, "corpus")
    man = read_index_manifest(corpus_dir)
    if not man["files"]:
        raise FileNotFoundError(f"no committed snapshot in {corpus_dir}")
    # the rewrite carries EVERY stored payload column (attr-bearing
    # layouts keep their metadata filterable across rebalances), and
    # applies outstanding tombstones PHYSICALLY — the rewritten
    # snapshot simply omits deleted rows.
    scan = (
        _apply_tombstones(spark, index_dir, snapshot_scan(spark, corpus_dir))
        .localCheckpoint()  # 3 downstream jobs; also breaks lineage to
        # the files the rewrite appends next to
    )
    counts = {r.list_id: r.n for r in
              scan.groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_vec = sum(counts.values())

    old_cent = {
        r.centroid_id: np.asarray(r.centroid, dtype=float)
        for r in spark.read.parquet(_centroid_dir(index_dir)).collect()
    }
    nlist = len(old_cent)
    imbalance_before = max(counts.values()) / (n_vec / nlist)

    # per-list mean: nlist × dim result rows, constant in corpus size
    sums = (
        scan.select("list_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("list_id", "pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    dim = len(next(iter(old_cent.values())))
    cmat = np.stack([old_cent[i] for i in range(nlist)]).copy()
    by_list: dict[int, dict[int, float]] = {}
    for r in sums:
        by_list.setdefault(r.list_id, {})[r.pos] = r.s
    for lid, d in by_list.items():  # empty lists keep their old centroid
        cmat[lid] = np.array([d[p] for p in range(dim)]) / counts[lid]
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @F.pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ cnorm.T, axis=1).astype(np.int64))

    assigned = (
        scan.drop("list_id")
        .withColumn("list_id", assign(F.col("v")))
        .localCheckpoint()
    )
    moved = (
        assigned.select("vec_id", "list_id").alias("a")
        .join(scan.select("vec_id", "list_id").alias("o"), "vec_id")
        .filter(F.col("a.list_id") != F.col("o.list_id"))
        .count()
    )
    new_counts = {r.list_id: r.n for r in
                  assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    imbalance_after = max(new_counts.values()) / (n_vec / nlist)

    version = man["version"] + 1
    cent_name = f"centroids_v{version}"
    (
        spark.createDataFrame(
            [(int(i), [float(x) for x in cmat[i]]) for i in range(nlist)],
            "centroid_id BIGINT, centroid ARRAY<DOUBLE>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, cent_name))
    )
    before_files = set(_list_parquet_files(corpus_dir))
    (
        assigned.repartition("list_id")
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(corpus_dir)
    )
    new_files = sorted(set(_list_parquet_files(corpus_dir)) - before_files)
    retired = sorted(set(man["files"]) | set(man.get("retired", [])))
    commit_index_files(
        corpus_dir, new_files, {"centroids": cent_name, "retired": retired}
    )
    return {
        "version": version,
        "n_vectors": n_vec,
        "moved": moved,
        "imbalance_before": round(imbalance_before, 4),
        "imbalance_after": round(imbalance_after, 4),
    }


# --------------------------------------------------------------------------
# IVFPQ — the composed FAISS-style index: coarse IVF lists + PQ residual
# codes within each list (Jégou et al. 2011's IVFADC)
# --------------------------------------------------------------------------


def build_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    nlist: int,
    m: int = 8,
    ksub: int = 16,
    out_dir: str | None = None,
) -> str:
    """Coarse-quantize to ``nlist`` IVF lists, then PQ-encode each
    vector's RESIDUAL (v - coarse centroid) into ``m`` one-byte codes.

    The canonical large-scale serving layout (FAISS's IVFADC): probes
    compose BOTH prunings — the coarse step cuts the candidate set to
    nprobe/nlist of the corpus at file-listing time (partition
    pruning), and within the probed lists the scan reads only the code
    columns (a few bytes per vector; raw vectors never leave disk).
    Residual encoding beats plain PQ because residuals concentrate
    near 0 once the coarse component is removed, so the same ksub
    codebook resolution covers a much smaller cell.

    Layout: ``codes/`` partitioned by ``list_id`` holding
    (vec_id, code_0..code_{m-1}) — NO raw vectors; ``centroids/`` the
    coarse table; ``codebooks/`` the SHARED residual codebooks
    ((sub, k, centroid) rows — shared across lists, the standard
    IVFPQ choice: the ADC lookup table is then query-global and the
    per-list term is a single scalar q·c_l).

    Determinism discipline (matches build_ivf_index/build_pq_index):
    coarse centroids are the first ``nlist`` vectors by vec_id,
    codebooks are fit on the first ``PQ_TRAIN_ROWS`` residuals with
    first-k init and fixed Lloyd iterations — bounded collects, no RNG.
    """
    out_dir = out_dir or os.path.join(_index_root(), _tag(sf_dir), "ivfpq")
    codes_dir = os.path.join(out_dir, "codes")
    cent_dir = os.path.join(out_dir, "centroids")
    books_dir = os.path.join(out_dir, "codebooks")
    if _is_built(codes_dir) and _is_built(cent_dir) and _is_built(books_dir):
        return out_dir
    e = _embeddings(spark, sf_dir)
    seed = e.filter(F.col("vec_id") < nlist).orderBy("vec_id").collect()
    cmat = np.stack([np.asarray(r.v) for r in seed])
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    train_rows = e.filter(F.col("vec_id") < PQ_TRAIN_ROWS).orderBy("vec_id").collect()
    tmat = np.stack([np.asarray(r.v) for r in train_rows])
    tassign = np.argmax(
        (tmat / np.linalg.norm(tmat, axis=1, keepdims=True)) @ cnorm.T, axis=1
    )
    books = _fit_codebooks(tmat - cmat[tassign], m, ksub)
    dsub = tmat.shape[1] // m

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        lid = np.argmax(
            (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ cnorm.T, axis=1
        )
        resid = mat - cmat[lid]
        out = np.empty((len(emb), m + 1), dtype=np.int32)
        out[:, 0] = lid
        for sub in range(m):
            x = resid[:, sub * dsub : (sub + 1) * dsub]
            d2 = ((x[:, None, :] - books[sub][None, :, :]) ** 2).sum(axis=2)
            out[:, sub + 1] = d2.argmin(axis=1)
        return pd.Series(list(out))

    coded = e.withColumn("enc", encode(F.col("v")))
    (
        coded.select(
            "vec_id",
            F.element_at(F.col("enc"), 1).cast("long").alias("list_id"),
            *[
                F.element_at(F.col("enc"), i + 2).cast("int").alias(f"code_{i}")
                for i in range(m)
            ],
        )
        .repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(codes_dir)
    )
    (
        spark.createDataFrame(
            [(int(i), [float(x) for x in cmat[i]]) for i in range(nlist)],
            "centroid_id BIGINT, centroid ARRAY<DOUBLE>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(cent_dir)
    )
    book_rows = [
        (sub, k, [float(x) for x in books[sub][k]])
        for sub in range(m)
        for k in range(ksub)
    ]
    (
        spark.createDataFrame(book_rows, "sub int, k int, centroid array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(books_dir)
    )
    return out_dir


def probe_ivfpq_index(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    nprobe: int,
    n_candidates: int,
) -> DataFrame:
    """IVFADC probe: prune to the ``nprobe`` nearest lists, ADC-rank
    their residual codes, return (vec_id, adc_score) candidates.

    score(v) ≈ q·v = q·c_{list(v)} + q·residual(v): the first term is
    one scalar per probed list (driver-computed, inlined as a CASE),
    the second is the shared-codebook ADC sum — M ``element_at`` table
    lookups per row against query-global LUTs (residual codebooks are
    shared across lists, so the LUT does NOT fork per list). The scan
    carries ``list_id IN (...)`` (partition pruning at file listing)
    and reads only the code columns (column pruning); both are
    plan-asserted in tests. Exact re-rank of the candidates is the
    caller's job (same contract as ``probe_pq_index``).
    """
    cent = sorted(
        spark.read.parquet(os.path.join(index_dir, "centroids")).collect(),
        key=lambda r: r.centroid_id,
    )
    cmat = np.stack([np.asarray(r.centroid) for r in cent])
    ids = np.array([r.centroid_id for r in cent])
    qn = qvec / np.linalg.norm(qvec)
    sims = (cmat / np.linalg.norm(cmat, axis=1, keepdims=True)) @ qn
    order = np.argsort(-sims)[:nprobe]
    probed = [int(ids[i]) for i in order]
    base = {int(ids[i]): float(cmat[i] @ qvec) for i in order}

    books = _load_codebooks(spark, index_dir, os.path.join(index_dir, "codebooks"))
    m, _ksub, dsub = books.shape
    luts = [books[sub] @ qvec[sub * dsub : (sub + 1) * dsub] for sub in range(m)]

    codes = spark.read.parquet(os.path.join(index_dir, "codes")).filter(
        F.col("list_id").isin(probed)
    )
    base_expr = None
    for lid, b in base.items():
        cond = F.col("list_id") == lid
        base_expr = (
            F.when(cond, F.lit(b))
            if base_expr is None
            else base_expr.when(cond, F.lit(b))
        )
    score = base_expr
    for sub in range(m):
        lut = F.array(*[F.lit(float(x)) for x in luts[sub]])
        score = score + F.element_at(lut, F.col(f"code_{sub}") + 1)
    return (
        codes.select("vec_id", score.alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc("vec_id"))
        .limit(n_candidates)
    )


def append_ivfpq_index(spark: SparkSession, index_dir: str, vectors: DataFrame) -> None:
    """Incrementally index (vec_id, v) vectors into the IVFPQ layout.

    New vectors coarse-quantize against the FROZEN centroids and
    PQ-encode their residuals with the FROZEN codebooks (the standard
    live-index contract — re-training either is an offline rebuild,
    and with residual codes a centroid move would invalidate every
    code in the list, so drift repair is rebuild-shaped by design).
    Cost ∝ |batch|; existing files never rewritten; probes see the
    appended rows on the next pruned read. Note the asymmetry with
    ``append_ivf_index``: codes-only storage means the delta's raw
    vectors are consumed at encode time and never land on disk.
    """
    cent = sorted(
        spark.read.parquet(os.path.join(index_dir, "centroids")).collect(),
        key=lambda r: r.centroid_id,
    )
    cmat = np.stack([np.asarray(r.centroid) for r in cent])
    ids = np.array([r.centroid_id for r in cent])
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    books = _load_codebooks(spark, index_dir, os.path.join(index_dir, "codebooks"))
    m, _ksub, dsub = books.shape

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        pos = np.argmax(
            (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ cnorm.T, axis=1
        )
        resid = mat - cmat[pos]
        out = np.empty((len(emb), m + 1), dtype=np.int32)
        out[:, 0] = ids[pos]
        for sub in range(m):
            x = resid[:, sub * dsub : (sub + 1) * dsub]
            d2 = ((x[:, None, :] - books[sub][None, :, :]) ** 2).sum(axis=2)
            out[:, sub + 1] = d2.argmin(axis=1)
        return pd.Series(list(out))

    coded = vectors.withColumn("enc", encode(F.col("v")))
    (
        coded.select(
            "vec_id",
            F.element_at(F.col("enc"), 1).cast("long").alias("list_id"),
            *[
                F.element_at(F.col("enc"), i + 2).cast("int").alias(f"code_{i}")
                for i in range(m)
            ],
        )
        .repartition("list_id")
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(os.path.join(index_dir, "codes"))
    )


# --------------------------------------------------------------------------
# index branches: write-audit-publish for rebuilds (table-side parity)
# --------------------------------------------------------------------------
#
# The table layer has branch → validate → merge-back (merge.py
# `create_branch`/WAP); the index side had tags but no branches, so an
# index REBUILD (rebalance after drift, a retrain, a bulk re-ingest)
# could only be audited in place. A branch is the `clone_to`
# discipline applied to a layout root: every data file HARDLINKED
# (O(files) metadata, zero bytes moved — immutability makes sharing
# safe: commits only add files, vacuum unlinks, which just drops one
# reference), every manifest/history/tag JSON copied with the path
# prefix rewritten, so the branch is a fully independent layout every
# ann_index primitive (append/upsert/delete/rebalance/probe) operates
# on directly. Promotion is ONE commit on the main line.


def _branch_root(index_dir: str) -> str:
    return os.path.join(index_dir, "_branches")


def branch_index(index_dir: str, name: str) -> str:
    """Zero-copy branch of a committed index layout at its current
    state. Returns the branch dir — a standalone layout root."""
    import shutil

    if "/" in name or name.startswith("."):
        raise ValueError(f"bad branch name {name!r}")
    data_dir = _layout_data_dir(index_dir)
    if data_dir is None:
        raise FileNotFoundError(f"no committed snapshot under {index_dir}")
    dst = os.path.join(_branch_root(index_dir), name)
    if os.path.exists(dst):
        raise FileExistsError(f"branch {name!r} already exists on {index_dir}")
    src_abs = os.path.abspath(index_dir)
    dst_abs = os.path.abspath(dst)
    for dirpath, dirs, files in os.walk(index_dir):
        dirs[:] = [d for d in dirs if d != "_branches"]
        rel = os.path.relpath(dirpath, index_dir)
        tgt = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            src_f = os.path.join(dirpath, f)
            dst_f = os.path.join(tgt, f)
            if f.endswith(".json"):
                # manifests/history/tags carry ABSOLUTE file paths;
                # the branch's copies must resolve inside the branch
                with open(src_f) as fh:
                    txt = fh.read()
                with open(dst_f, "w") as fh:
                    fh.write(txt.replace(src_abs, dst_abs))
            else:
                try:
                    os.link(src_f, dst_f)
                except OSError:
                    shutil.copy2(src_f, dst_f)  # cross-device fallback
    return dst


def index_branches(index_dir: str) -> list[str]:
    root = _branch_root(index_dir)
    if not os.path.isdir(root):
        return []
    return sorted(
        n
        for n in os.listdir(root)
        if _layout_data_dir(os.path.join(root, n)) is not None
    )


def merge_index_branch(index_dir: str, name: str) -> dict:
    """PUBLISH a branch's committed state onto the main line as one
    atomic commit — the write-audit-publish loop's last step:
    ``branch_index`` → rebuild/maintain and validate ON THE BRANCH →
    ``merge_index_branch``.

    Every file in the branch's current manifest (data, tombstone
    sidecars, the centroid table it points at) is hardlinked into the
    main layout at its branch-relative path (files main already holds
    are the same inodes — immutability again), then ONE
    ``commit_index_files`` swap makes the branch's file set main's
    current version; main's previous files move to ``retired`` so
    listing-based commits never resurrect them, and readers pinned to
    pre-promote manifests are untouched. Single-maintainer across the
    PAIR: the WAP contract is that main is quiescent between branch
    and publish (concurrent main commits would be silently shadowed —
    same rule as the table-side WAP merge).
    """
    import shutil

    br = os.path.join(_branch_root(index_dir), name)
    br_data = _layout_data_dir(br)
    if br_data is None:
        raise KeyError(f"no branch {name!r} on {index_dir}")
    man_b = read_index_manifest(br_data)
    sub = os.path.relpath(br_data, br)  # corpus / codes / .
    main_data = index_dir if sub == "." else os.path.join(index_dir, sub)
    man_m = read_index_manifest(main_data)

    def _link_back(branch_file: str) -> str:
        rel = os.path.relpath(branch_file, br)
        dst_f = os.path.join(index_dir, rel)
        if not os.path.exists(dst_f):
            os.makedirs(os.path.dirname(dst_f), exist_ok=True)
            try:
                os.link(branch_file, dst_f)
            except OSError:
                shutil.copy2(branch_file, dst_f)
        return dst_f

    files = [_link_back(f) for f in man_b["files"]]
    for t in man_b.get("tombstones", []):
        _link_back(t)
    # a branch-side rebalance/retrain left a pointer to a new
    # centroid/codebook dir: carry the whole dir over
    extra: dict = {}
    for ptr in ("centroids", "codebooks"):
        if ptr in man_b:
            src_dir = os.path.join(br, man_b[ptr])
            if os.path.isdir(src_dir):
                for dirpath, _dirs, fs in os.walk(src_dir):
                    for f in fs:
                        _link_back(os.path.join(dirpath, f))
            extra[ptr] = man_b[ptr]
    retired = sorted(
        (set(man_m["files"]) - set(files)) | set(man_m.get("retired", []))
    )
    extra["retired"] = retired
    new_man = commit_index_files(main_data, files, extra=extra)
    return {
        "version": new_man["version"],
        "n_files": len(files),
        "n_retired_main_files": len(set(man_m["files"]) - set(files)),
    }
