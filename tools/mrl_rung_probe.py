#!/usr/bin/env python3
"""MRL second-rung evidence probe (VERDICT r07 #6 / SURVEY §7.43e).

Question: would a prefix-32 MRL rung measurably separate from the
existing prefix-16 rung on this corpus — and would it on an
ANISOTROPIC corpus (the regime real MRL-trained embeddings live in)?

Method: load the embeddings table into numpy, and for N_QUERIES
deterministic query vectors measure shortlist recall — the fraction
of the exact cosine top-10 captured by the M=50 prefix-cosine
shortlist (identical to the serving composition: the exact re-rank
can only choose from the shortlist, so recall@10 == coverage of the
exact 10 by the 50). Four cells:

- raw prefix-16 / raw prefix-32: the corpus as-is (isotropic
  synthetic — every dimension carries equal signal, so a k-dim
  prefix keeps ~k/64 of the inner-product information).
- PCA-rotated prefix-16 / prefix-32: the same vectors expressed in
  their principal axes (an ORTHOGONAL rotation — norms, angles, and
  the exact top-k are untouched; only the prefix energy moves). On
  anisotropic data this concentrates variance into the leading
  dimensions, which is exactly what MRL training does by
  construction — so the rotated cells are the upper bound this
  corpus can offer a prefix family.

Decision rule (recorded in SURVEY §7.43e): add the prefix-32 rung
only if the rotated corpus separates rung recalls by ≥ 0.15 AND the
32-rung reaches a servable recall (≥ 0.8); otherwise the rung stays
shelved — a key that measures noise grades nothing.

Usage: python tools/mrl_rung_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 64
TOP_K = 10
RERANK_M = 50
RUNGS = (16, 32)


def shortlist_recall(X: np.ndarray, prefix: int, qidx: np.ndarray) -> float:
    """Mean coverage of the exact cosine top-K by the M prefix shortlist."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    P = X[:, :prefix]
    Pn = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    hits = 0
    for q in qidx:
        exact = np.argsort(-(Xn @ Xn[q]))
        exact = exact[exact != q][:TOP_K]
        pre = np.argsort(-(Pn @ Pn[q]))
        pre = set(pre[pre != q][:RERANK_M].tolist())
        hits += len(set(exact.tolist()) & pre)
    return hits / (len(qidx) * TOP_K)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    X = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    rng = np.random.default_rng(42)
    qidx = rng.choice(len(X), size=min(N_QUERIES, len(X)), replace=False)

    # PCA rotation: principal axes of the (uncentered) second moment —
    # orthogonal, so exact cosine top-k is invariant; prefix energy
    # concentrates exactly as much as the corpus is anisotropic.
    _, S, Vt = np.linalg.svd(X, full_matrices=False)
    Xrot = X @ Vt.T
    evr = (S**2) / (S**2).sum()

    out = {"sf_dir": sf_dir, "n_vectors": len(X), "dim": X.shape[1]}
    for prefix in RUNGS:
        out[f"raw{prefix}"] = round(shortlist_recall(X, prefix, qidx), 4)
        out[f"rot{prefix}"] = round(shortlist_recall(Xrot, prefix, qidx), 4)
    out["var_share_16"] = round(float(evr[:16].sum()), 4)
    out["var_share_32"] = round(float(evr[:32].sum()), 4)
    sep = out["rot32"] - out["rot16"]
    out["rot_separation"] = round(sep, 4)
    out["verdict"] = (
        "ADD prefix-32 rung"
        if sep >= 0.15 and out["rot32"] >= 0.8
        else "SHELVE (no measurable rung separation on this corpus)"
    )
    import json

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
