#!/usr/bin/env python3
"""Evidence probe for §7.22: would PCA-ROTATED zone-map boxes prune
better than the shipped axis-aligned (d0, d1) boxes?

The shipped `embedding_box_scan` layout z-orders on the first two
RAW dimensions and keeps per-file min/max of them. If the embedding
cloud's variance is concentrated along non-axis directions, rotating
the indexed coordinates onto the top-2 PCA axes spreads files across
a wider range per coordinate, so an equally-selective box (expressed
in the rotated space) should skip more files. If the cloud is already
axis-ish (or the probe workload is axis-aligned), rotation buys
nothing and the extra moving part is not worth shipping — the judge's
condition (VERDICT r05 #9) is exactly this evidence.

Method, same-cost comparison:
- layout A: z-order on (_d0, _d1) = raw dims 0, 1 (the shipped one);
- layout B: z-order on (_p0, _p1) = projections onto the corpus'
  top-2 PCA directions (Gramian eigenvectors — same tree-reduce as
  `embedding_pca`);
- the SAME ``N_PROBES`` probe boxes, each centred on a sampled vector
  with half-width = ``WIDTH_SD`` × the per-coordinate std dev of the
  respective space (equal selectivity construction, not equal
  volume);
- metric: fraction of files the zone map keeps, averaged over probes,
  plus the exact row recall check (conservative skipping must hold in
  both spaces).

Prints one JSON line; SURVEY §7.22 records the verdict.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samza_hello_samza_spark.session import get_spark, load_table
from samza_hello_samza_spark.sources import zonemap
from samza_hello_samza_spark.sources.zorder import write_zordered

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/spark_graft_pca_probe"
N_FILES = 32
N_PROBES = 24
WIDTH_SD = 0.35  # half-width in per-coordinate std-dev units


def _layout(spark, df, cols, name):
    out = os.path.join(OUT_ROOT, name)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        write_zordered(df, out, cols[0], cols[1], files=N_FILES)
    if not os.path.exists(zonemap._stats_dir(out)):
        zonemap.build_zonemap(spark, out, list(cols))
    return out


def _fraction_kept(spark, table_dir, boxes):
    stats = zonemap._stats_dir(table_dir)
    n_files = spark.read.parquet(stats).count()
    kept = [
        len(zonemap.pruned_files(spark, table_dir, b)) / n_files for b in boxes
    ]
    return float(np.mean(kept)), n_files


def main() -> None:
    spark = get_spark("pca-box-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )

    # corpus Gramian → top-2 PCA directions (driver sees dim×dim only)
    mat = np.stack([np.asarray(r.v) for r in emb.limit(4096).collect()])
    mu = mat.mean(axis=0)
    x = mat - mu
    w, vecs = np.linalg.eigh((x.T @ x) / len(x))
    p1, p2 = vecs[:, -1], vecs[:, -2]
    explained = float((w[-1] + w[-2]) / w.sum())

    dim = mat.shape[1]
    a_cols = ("_d0", "_d1")
    b_cols = ("_p0", "_p1")
    raw = emb.select(
        "vec_id",
        "v",
        F.col("v")[0].alias("_d0"),
        F.col("v")[1].alias("_d1"),
    )
    proj = emb.select(
        "vec_id",
        "v",
        sum((F.col("v")[i] - float(mu[i])) * float(p1[i]) for i in range(dim)).alias("_p0"),
        sum((F.col("v")[i] - float(mu[i])) * float(p2[i]) for i in range(dim)).alias("_p1"),
    )
    lay_a = _layout(spark, raw, a_cols, "axis")
    lay_b = _layout(spark, proj, b_cols, "pca")

    # per-space coordinate std devs → equal-selectivity half-widths
    sd_a = raw.agg(F.stddev("_d0"), F.stddev("_d1")).first()
    sd_b = proj.agg(F.stddev("_p0"), F.stddev("_p1")).first()

    # probe centres: deterministic sample of vectors
    centres = raw.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(N_PROBES).collect()
    cb = {r.vec_id: r for r in proj.filter(
        F.col("vec_id").isin([r.vec_id for r in centres])
    ).collect()}

    boxes_a = [
        {
            "_d0": (r._d0 - WIDTH_SD * sd_a[0], r._d0 + WIDTH_SD * sd_a[0]),
            "_d1": (r._d1 - WIDTH_SD * sd_a[1], r._d1 + WIDTH_SD * sd_a[1]),
        }
        for r in centres
    ]
    boxes_b = [
        {
            "_p0": (cb[r.vec_id]._p0 - WIDTH_SD * sd_b[0], cb[r.vec_id]._p0 + WIDTH_SD * sd_b[0]),
            "_p1": (cb[r.vec_id]._p1 - WIDTH_SD * sd_b[1], cb[r.vec_id]._p1 + WIDTH_SD * sd_b[1]),
        }
        for r in centres
    ]

    frac_a, nf_a = _fraction_kept(spark, lay_a, boxes_a)
    frac_b, nf_b = _fraction_kept(spark, lay_b, boxes_b)

    # conservatism spot check in the rotated space: pruned read ⊇ exact
    b0 = boxes_b[0]
    files = zonemap.pruned_files(spark, lay_b, b0)
    got = set()
    if files:
        got = {
            r.vec_id
            for r in spark.read.option("basePath", lay_b).parquet(*files)
            .filter(
                F.col("_p0").between(*b0["_p0"]) & F.col("_p1").between(*b0["_p1"])
            )
            .collect()
        }
    want = {
        r.vec_id
        for r in proj.filter(
            F.col("_p0").between(*b0["_p0"]) & F.col("_p1").between(*b0["_p1"])
        ).collect()
    }
    assert got == want, "conservative-skipping violated in rotated space"

    print(
        json.dumps(
            {
                "metric": "pca_box_probe",
                "files": {"axis": nf_a, "pca": nf_b},
                "mean_fraction_kept_axis": round(frac_a, 4),
                "mean_fraction_kept_pca": round(frac_b, 4),
                "pca_gain": round(frac_a / frac_b, 3) if frac_b else None,
                "top2_explained_variance": round(explained, 4),
                "n_probes": N_PROBES,
                "width_sd": WIDTH_SD,
            }
        )
    )


if __name__ == "__main__":
    main()
