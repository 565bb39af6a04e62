#!/usr/bin/env python3
"""A/B probe for the r11 batch-ADC kernel change (guide §2.2).

Times the 240-query batch ADC scoring stage over the committed SQ8
code layout two ways, in ONE warm JVM, through the noop sink:

  A (r10 kernel): packed query words broadcast, per-(doc, query)
     shift/mask/center extraction inside the scoring expression
     (``adc_score_batch_col``);
  B (r11 kernel): doc bytes unpacked ONCE per doc row before the
     broadcast cross join (``unpack_centered_cols``), per-pair work a
     bare multiply-add (``adc_score_unpacked_col``).

Both produce the identical integer scores (pytest-pinned); the probe
also asserts equality of the two relations' hashes before timing.

Usage: adc_ab_probe.py [SF_DIR] [N_PASSES]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from samza_hello_samza_spark.functions import sq8 as _sq8  # noqa: E402
from samza_hello_samza_spark.operators import ann_index  # noqa: E402
from samza_hello_samza_spark.operators import similarity  # noqa: E402
from samza_hello_samza_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = get_spark("adc-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    idx = similarity._sq8_index(spark, SF_DIR)
    meta = ann_index.read_sq8_meta(idx)
    corpus_dir = f"{idx}/corpus"
    man = ann_index.read_index_manifest(corpus_dir)
    e = similarity._embeddings(spark, SF_DIR)
    n = e.count()
    ids = similarity._wide_vec_ids(n)
    qrows = e.filter(F.col("vec_id").isin(ids)).collect()
    codes_rows = [
        (
            int(r.vec_id),
            _sq8.sq8_codes_py(np.asarray(r.v), meta["mins"], meta["maxs"]),
        )
        for r in qrows
    ]
    qrel_packed = spark.createDataFrame(
        [(vid, _sq8.pack_words_py(c)) for vid, c in codes_rows],
        "query_id LONG, qw ARRAY<BIGINT>",
    )
    qrel_unpacked = spark.createDataFrame(
        [(vid, _sq8.centered_codes_py(c)) for vid, c in codes_rows],
        "query_id LONG, qb ARRAY<INT>",
    )

    def base_codes():
        c = ann_index.snapshot_scan(spark, corpus_dir, man=man).select(
            "vec_id", *meta["sq8_cols"]
        )
        return ann_index._apply_tombstones(
            spark, idx, c, tomb_files=man.get("tombstones")
        )

    w = Window.partitionBy("query_id").orderBy(F.desc("sq8_score"), F.asc("vec_id"))

    def plan_a():
        scored = (
            base_codes()
            .crossJoin(F.broadcast(qrel_packed))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "sq8_score", _sq8.adc_score_batch_col(meta["dim"], F.col("qw"))
            )
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= similarity.BATCH_TOP_K)
            .select("query_id", "vec_id", "sq8_score")
        )

    def plan_b():
        unpacked = base_codes().select(
            "vec_id", *_sq8.unpack_centered_cols(meta["dim"])
        )
        scored = (
            unpacked.crossJoin(F.broadcast(qrel_unpacked))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "sq8_score", _sq8.adc_score_unpacked_col(meta["dim"], F.col("qb"))
            )
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= similarity.BATCH_TOP_K)
            .select("query_id", "vec_id", "sq8_score")
        )

    def plan_a_spread():
        scored = (
            similarity._spread_scan(spark, base_codes())
            .crossJoin(F.broadcast(qrel_packed))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "sq8_score", _sq8.adc_score_batch_col(meta["dim"], F.col("qw"))
            )
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= similarity.BATCH_TOP_K)
            .select("query_id", "vec_id", "sq8_score")
        )

    def plan_c():
        # r11 production shape: spread scan + one exact GEMM per
        # Arrow batch with in-kernel partial top-k (guide §4.2)
        cand = _sq8.adc_batch_candidates(
            similarity._spread_scan(spark, base_codes()),
            meta["dim"],
            codes_rows,
            similarity.BATCH_TOP_K,
        )
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= similarity.BATCH_TOP_K)
            .select("query_id", "vec_id", "sq8_score")
        )

    # equality gate before timing
    ra = sorted(map(tuple, plan_a().collect()))
    rb = sorted(map(tuple, plan_b().collect()))
    rc = sorted(map(tuple, plan_c().collect()))
    assert ra == rb, "kernel results differ!"
    assert ra == rc, "GEMM kernel results differ!"
    print(f"equality gate: {len(ra)} rows identical (A=B=C)", flush=True)

    for label, fn in (
        ("A:packed", plan_a),
        ("B:unpacked", plan_b),
        ("A2:packed+spread", plan_a_spread),
        ("C:gemm+spread", plan_c),
    ):
        # warm one pass, then timed passes
        fn().write.mode("overwrite").format("noop").save()
        times = []
        for _ in range(N_PASSES):
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: passes {times} min {min(times):.3f}", flush=True)


if __name__ == "__main__":
    main()
