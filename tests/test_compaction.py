"""Small-file compaction: fewer files, identical data, idempotent."""

from __future__ import annotations

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources import compaction
from tests.conftest import SF_DIR


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "frag")
    src = load_table(spark, SF_DIR, "events")
    # fragment: one file per shuffle partition
    src.repartition(40).write.parquet(out)
    n0, total, _ = compaction.plan_compaction(spark, out)
    assert n0 >= 40

    before, after = compaction.compact_parquet(spark, out, target_bytes=total)
    assert before == n0 and after < before
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)

    # idempotent: second run is a no-op
    b2, a2 = compaction.compact_parquet(spark, out, target_bytes=total)
    assert b2 == a2 == after


def test_compaction_with_sort_column_clusters(spark, tmp_path):
    out = str(tmp_path / "frag2")
    src = load_table(spark, SF_DIR, "events")
    src.repartition(20).write.parquet(out)
    _, total, _ = compaction.plan_compaction(spark, out)
    compaction.compact_parquet(
        spark, out, target_bytes=total // 2, sort_col="user_id"
    )
    back = spark.read.parquet(out)
    assert back.count() == src.count()
