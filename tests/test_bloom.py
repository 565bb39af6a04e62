"""functions/bloom: the broadcast Bloom semi-join primitive is exact
on arbitrary relations (not just the decontamination family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from samza_hello_samza_spark.functions import bloom
from samza_hello_samza_spark.session import load_table
from tests.conftest import SF_DIR


def _md5_keys(df, col):
    return df.select(F.md5(F.col(col).cast("string")).alias("h"))


def test_bloom_semi_join_equals_plain_semi_join(spark):
    """bloom_semi_join ≡ left_semi on an unrelated table/column pair."""
    events = load_table(spark, SF_DIR, "events")
    big = _md5_keys(events, "user_id").withColumn("one", F.lit(1))
    # bounded key set: an arbitrary slice of customers
    keys = _md5_keys(
        load_table(spark, SF_DIR, "customer").filter(F.col("c_custkey") % 7 == 0),
        "c_custkey",
    ).distinct()
    got = sorted(r.h for r in bloom.bloom_semi_join(big, keys, "h").collect())
    want = sorted(r.h for r in big.join(keys, "h", "left_semi").collect())
    assert got == want
    assert got  # non-degenerate: some members exist


def test_bloom_no_false_negatives_and_prunes(spark):
    """Every true member passes the raw predicate; non-members are
    rejected at far better than coin-flip rate."""
    customers = load_table(spark, SF_DIR, "customer")
    members = _md5_keys(customers.filter(F.col("c_custkey") % 2 == 0), "c_custkey")
    non_members = _md5_keys(customers.filter(F.col("c_custkey") % 2 == 1), "c_custkey")
    bits, n_bits = bloom.build_bloom([r.h for r in members.collect()])

    def passed(df):
        return (
            df.withColumn("bloom_bits", F.lit(bits))
            .filter(F.expr(bloom.member_sql(n_bits)))
            .count()
        )

    assert passed(members) == members.count()
    n_non = non_members.count()
    assert passed(non_members) < 0.1 * n_non, "fp rate should be ~0.2%"


def test_member_sql_composes_with_higher_order_filter(spark):
    """The predicate works as a lambda body (the streaming in-row use)."""
    keys = ["k1", "k2", "k3"]
    import hashlib

    member_hashes = [hashlib.md5(k.encode()).hexdigest() for k in keys[:2]]
    bits, n_bits = bloom.build_bloom(member_hashes)
    df = spark.createDataFrame([(keys,)], "ks: array<string>").select(
        F.transform("ks", F.md5).alias("hs")
    )
    n = (
        df.withColumn("bloom_bits", F.lit(bits))
        .select(
            F.expr(f"size(filter(hs, h -> {bloom.member_sql(n_bits)}))").alias("n")
        )
        .collect()[0]
        .n
    )
    assert n == 2  # both members hit, the non-member (almost surely) misses
