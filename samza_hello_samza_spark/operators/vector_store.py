"""IvfVectorStore — the one-object vector-store API.

The reference exposes its keyed stores through a single table handle
(hello-samza's table examples get/put/delete one object); the ANN
layouts here grew the same operations one function at a time across
``ann_index``. This facade binds them to one handle so a user holds a
store, not a directory convention:

    store = IvfVectorStore.create(spark, sf_dir, nlist=16, out_dir=...)
    store.append(df); store.upsert(df); store.delete([7, 9])
    hits = store.probe(qvec, nprobe=4, where=F.col("label") == 2)
    old  = store.probe(qvec, nprobe=4, version=1)       # time travel
    store.rebalance(); store.compact(); store.vacuum()
    store.versions()                                     # history

Everything delegates to the audited ``ann_index`` primitives — the
facade adds no behavior, only coherence; every scale/commit contract
(manifest snapshots, versioned tombstone masks, copy-on-write upsert,
retire/vacuum grace periods) is documented on the primitive it
belongs to.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ann_index


class IvfVectorStore:
    """Handle over a committed IVF layout (optionally attr-bearing)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.corpus_dir = os.path.join(index_dir, "corpus")

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        sf_dir: str,
        nlist: int,
        out_dir: str | None = None,
        attrs: tuple[str, ...] = (),
        sigs: bool = False,
        sq8: bool = False,
        mrl_dim: int | None = None,
    ) -> "IvfVectorStore":
        """Build the layout from the embeddings table and COMMIT the
        first snapshot — a store handle always speaks the snapshot
        protocol (raw-listing reads are the uncommitted-layout escape
        hatch, not the store contract). ``sigs=True`` materializes the
        binary sign-bit signature words next to each vector (see
        ``build_ivf_index``), enabling ``probe_binary``; ``sq8=True``
        materializes the uint8 scalar-quantization words under frozen
        per-dim bounds, enabling ``probe_sq8``; ``mrl_dim=k``
        materializes the Matryoshka prefix column, enabling
        ``probe_mrl``."""
        idx = ann_index.build_ivf_index(
            spark, sf_dir, nlist, out_dir, attrs, sigs, sq8, mrl_dim
        )
        store = cls(spark, idx)
        if not ann_index.read_index_manifest(store.corpus_dir)["files"]:
            ann_index.commit_index_snapshot(store.corpus_dir)
        return store

    # -- reads ---------------------------------------------------------
    def probe(
        self,
        qvec: np.ndarray,
        nprobe: int,
        where: F.Column | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Pruned candidate read at the current (or a pinned) version."""
        if version is not None:
            man = ann_index.read_index_manifest(self.corpus_dir, version=version)
            if where is not None:
                raise ValueError(
                    "filtered time-travel probes are not supported: pass "
                    "version or where, not both"
                )
            return ann_index.probe_ivf_snapshot(
                self.spark, self.index_dir, qvec, nprobe, man=man
            )
        return ann_index.probe_ivf_index(
            self.spark, self.index_dir, qvec, nprobe, where=where
        )

    def probe_binary(
        self,
        qvec: np.ndarray,
        where: F.Column | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Hamming candidates (vec_id, hamming) over the committed
        signature words — requires a ``sigs=True`` layout. The query
        vector packs driver-side; the scan never reads raw vectors."""
        from ..functions import binary_sig

        man = (
            ann_index.read_index_manifest(self.corpus_dir, version=version)
            if version is not None
            else None
        )
        return ann_index.probe_binary_snapshot(
            self.spark,
            self.index_dir,
            binary_sig.sign_words_py(np.asarray(qvec, dtype=float)),
            where=where,
            man=man,
        )

    def probe_sq8(
        self,
        qvec: np.ndarray,
        where: F.Column | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Integer-ADC candidates (vec_id, sq8_score) over the
        committed SQ8 code words — requires a ``sq8=True`` layout. The
        query quantizes driver-side under the layout's FROZEN bounds;
        the scan never reads raw vectors."""
        from ..functions import sq8 as sq8_codec

        meta = ann_index.read_sq8_meta(self.index_dir)
        if meta is None:
            raise FileNotFoundError(
                f"{self.index_dir} stores no SQ8 code columns; create "
                "the store with sq8=True"
            )
        man = (
            ann_index.read_index_manifest(self.corpus_dir, version=version)
            if version is not None
            else None
        )
        return ann_index.probe_sq8_snapshot(
            self.spark,
            self.index_dir,
            sq8_codec.sq8_codes_py(
                np.asarray(qvec, dtype=float), meta["mins"], meta["maxs"]
            ),
            where=where,
            man=man,
        )

    def probe_mrl(
        self,
        qvec: np.ndarray,
        where: F.Column | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Matryoshka prefix-cosine candidates (vec_id, prefix_cosine)
        over the committed prefix column — requires an
        ``mrl_dim=k`` layout. The query's prefix slices driver-side;
        the scan never reads raw vectors."""
        meta = ann_index.read_mrl_meta(self.index_dir)
        if meta is None:
            raise FileNotFoundError(
                f"{self.index_dir} stores no MRL prefix column; create "
                "the store with mrl_dim=..."
            )
        man = (
            ann_index.read_index_manifest(self.corpus_dir, version=version)
            if version is not None
            else None
        )
        return ann_index.probe_mrl_snapshot(
            self.spark,
            self.index_dir,
            [float(x) for x in np.asarray(qvec, dtype=float)[: meta["dim_pre"]]],
            where=where,
            man=man,
        )

    def scan(self, version: int | None = None) -> DataFrame:
        man = (
            ann_index.read_index_manifest(self.corpus_dir, version=version)
            if version is not None
            else None
        )
        return ann_index.snapshot_scan(self.spark, self.corpus_dir, man=man)

    # -- writes --------------------------------------------------------
    def append(self, vectors: DataFrame) -> dict:
        ann_index.append_ivf_index(self.spark, self.index_dir, vectors)
        return ann_index.commit_index_snapshot(self.corpus_dir)

    def upsert(self, vectors: DataFrame) -> dict:
        return ann_index.upsert_ivf_vectors(self.spark, self.index_dir, vectors)

    def delete(self, vec_ids) -> int:
        return ann_index.delete_ivf_vectors(self.spark, self.index_dir, vec_ids)

    # -- maintenance ---------------------------------------------------
    def rebalance(self) -> dict:
        return ann_index.rebalance_ivf_index(self.spark, self.index_dir)

    def compact_tombstones(self) -> int:
        return ann_index.compact_ivf_tombstones(self.spark, self.index_dir)

    def vacuum(self) -> int:
        return ann_index.vacuum_index(self.corpus_dir)

    # -- metadata ------------------------------------------------------
    def manifest(
        self, version: int | None = None, tag: str | None = None
    ) -> dict:
        return ann_index.read_index_manifest(
            self.corpus_dir, version=version, tag=tag
        )

    def versions(self) -> list[int]:
        return ann_index.index_versions(self.corpus_dir)

    def expire_versions(self, keep_last: int = 10) -> int:
        return ann_index.expire_index_versions(self.corpus_dir, keep_last)

    def restore(self, version: int) -> dict:
        """RESTORE: make snapshot ``version`` current again as a NEW
        appended commit (zero-copy; see
        ``ann_index.restore_index_version``)."""
        return ann_index.restore_index_version(self.corpus_dir, version)

    # -- named refs ----------------------------------------------------
    def tag(self, name: str, version: int | None = None) -> int:
        return ann_index.tag_index_version(self.corpus_dir, name, version)

    def delete_tag(self, name: str) -> None:
        ann_index.delete_index_tag(self.corpus_dir, name)

    def tags(self) -> dict[str, int]:
        return ann_index.index_tags(self.corpus_dir)

    # -- branches (write-audit-publish) --------------------------------
    def create_branch(self, name: str) -> "IvfVectorStore":
        """Zero-copy branch at the current state — audit a rebuild
        (rebalance, bulk re-ingest) on the branch, then publish with
        :meth:`merge_branch`. The branch handle speaks the full store
        API."""
        return IvfVectorStore(self.spark, ann_index.branch_index(self.index_dir, name))

    def branch(self, name: str) -> "IvfVectorStore":
        d = os.path.join(self.index_dir, "_branches", name)
        if ann_index._layout_data_dir(d) is None:
            raise KeyError(f"no branch {name!r} on {self.index_dir}")
        return IvfVectorStore(self.spark, d)

    def branches(self) -> list[str]:
        return ann_index.index_branches(self.index_dir)

    def merge_branch(self, name: str) -> dict:
        return ann_index.merge_index_branch(self.index_dir, name)


class LshVectorStore:
    """One-handle facade over the LSH band-table layout — pure
    delegation to the audited ``ann_index`` primitives (the
    ``IvfVectorStore`` contract for the second probe family: every
    read resolves the committed snapshot, every write ends in a
    commit)."""

    def __init__(self, spark: SparkSession, index_dir: str, planes, band_bits: int):
        self.spark = spark
        self.index_dir = index_dir
        self.planes = planes
        self.band_bits = band_bits

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        sf_dir: str,
        planes,
        band_bits: int,
        out_dir: str | None = None,
    ) -> "LshVectorStore":
        idx = ann_index.build_lsh_index(spark, sf_dir, planes, band_bits, out_dir)
        store = cls(spark, idx, planes, band_bits)
        if not ann_index.read_index_manifest(idx)["files"]:
            ann_index.commit_index_snapshot(idx)
        return store

    def probe(self, qvec: np.ndarray) -> DataFrame:
        return ann_index.probe_lsh_snapshot(
            self.spark, self.index_dir, qvec, self.planes, self.band_bits
        )

    def append(self, vectors: DataFrame) -> dict:
        ann_index.append_lsh_index(self.index_dir, vectors, self.planes, self.band_bits)
        return ann_index.commit_index_snapshot(self.index_dir)

    def delete(self, vec_ids) -> int:
        return ann_index.delete_index_vectors(self.spark, self.index_dir, vec_ids)

    def versions(self) -> list[int]:
        return ann_index.index_versions(self.index_dir)

    def restore(self, version: int) -> dict:
        """RESTORE: republish snapshot ``version`` as a new appended
        commit (``ann_index.restore_index_version``; the band table is
        its own manifest dir)."""
        return ann_index.restore_index_version(self.index_dir, version)


class PqVectorStore:
    """One-handle facade over the PQ codes layout (codes-only ADC
    scans; raw vectors never stored). Pure delegation."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.codes_dir = os.path.join(index_dir, "codes")

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        sf_dir: str,
        m: int = 8,
        ksub: int = 16,
        out_dir: str | None = None,
    ) -> "PqVectorStore":
        idx = ann_index.build_pq_index(spark, sf_dir, m, ksub, out_dir)
        store = cls(spark, idx)
        if not ann_index.read_index_manifest(store.codes_dir)["files"]:
            ann_index.commit_index_snapshot(store.codes_dir)
        return store

    def probe(self, qvec: np.ndarray, n_candidates: int) -> DataFrame:
        return ann_index.probe_pq_snapshot(
            self.spark, self.index_dir, qvec, n_candidates
        )

    def append(self, vectors: DataFrame) -> dict:
        ann_index.append_pq_index(self.spark, self.index_dir, vectors)
        return ann_index.commit_index_snapshot(self.codes_dir)

    def delete(self, vec_ids) -> int:
        return ann_index.delete_index_vectors(self.spark, self.index_dir, vec_ids)

    def retrain(self, vectors: DataFrame) -> dict:
        return ann_index.retrain_pq_index(self.spark, self.index_dir, vectors)

    def versions(self) -> list[int]:
        return ann_index.index_versions(self.codes_dir)

    def restore(self, version: int) -> dict:
        """RESTORE the codes snapshot (incl. its codebook pointer) as
        a new appended commit — a retrained index rolls back to the
        prior codes+books pairing atomically."""
        return ann_index.restore_index_version(self.codes_dir, version)


class IvfPqVectorStore:
    """One-handle facade over the composed IVFADC layout. Pure
    delegation."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.codes_dir = os.path.join(index_dir, "codes")

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        sf_dir: str,
        nlist: int,
        m: int = 8,
        ksub: int = 16,
        out_dir: str | None = None,
    ) -> "IvfPqVectorStore":
        idx = ann_index.build_ivfpq_index(spark, sf_dir, nlist, m, ksub, out_dir)
        store = cls(spark, idx)
        if not ann_index.read_index_manifest(store.codes_dir)["files"]:
            ann_index.commit_index_snapshot(store.codes_dir)
        return store

    def probe(self, qvec: np.ndarray, nprobe: int, n_candidates: int) -> DataFrame:
        return ann_index.probe_ivfpq_index(
            self.spark, self.index_dir, qvec, nprobe, n_candidates
        )

    def append(self, vectors: DataFrame) -> dict:
        ann_index.append_ivfpq_index(self.spark, self.index_dir, vectors)
        return ann_index.commit_index_snapshot(self.codes_dir)

    def delete(self, vec_ids) -> int:
        return ann_index.delete_index_vectors(self.spark, self.index_dir, vec_ids)

    def versions(self) -> list[int]:
        return ann_index.index_versions(self.codes_dir)

    def restore(self, version: int) -> dict:
        """RESTORE the composed layout's codes snapshot (with its
        centroid/codebook pointers) as a new appended commit."""
        return ann_index.restore_index_version(self.codes_dir, version)
