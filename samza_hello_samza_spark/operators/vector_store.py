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
    ) -> "IvfVectorStore":
        """Build the layout from the embeddings table and COMMIT the
        first snapshot — a store handle always speaks the snapshot
        protocol (raw-listing reads are the uncommitted-layout escape
        hatch, not the store contract)."""
        idx = ann_index.build_ivf_index(spark, sf_dir, nlist, out_dir, attrs)
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

    # -- named refs ----------------------------------------------------
    def tag(self, name: str, version: int | None = None) -> int:
        return ann_index.tag_index_version(self.corpus_dir, name, version)

    def delete_tag(self, name: str) -> None:
        ann_index.delete_index_tag(self.corpus_dir, name)

    def tags(self) -> dict[str, int]:
        return ann_index.index_tags(self.corpus_dir)
