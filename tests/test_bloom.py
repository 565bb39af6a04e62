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


def test_distributed_build_bit_identical_to_driver_build(spark):
    """build_bloom_distributed over the same keys produces the same
    bit-array the driver build does at the same n_bits — the two paths
    are interchangeable, so the over-budget switch cannot change
    results (ADVICE r3: the driver collect must be bounded by
    construction, not by docstring)."""
    keys = _md5_keys(load_table(spark, SF_DIR, "customer"), "c_custkey").distinct()
    hashes = [r.h for r in keys.collect()]
    # pin both to the max size so the arrays are comparable
    n_bits = bloom.BLOOM_MAX_BITS
    bits_driver = [0] * (n_bits // 64)
    for h in hashes:
        for j in range(bloom.BLOOM_K):
            idx = int(h[8 * j : 8 * j + 8], 16) % n_bits
            bits_driver[idx // 64] |= 1 << (idx % 64)
    bits_driver = [w - (1 << 64) if w >= (1 << 63) else w for w in bits_driver]
    bits_dist, n_dist = bloom.build_bloom_distributed(keys, "h")
    assert n_dist == n_bits
    assert bits_dist == bits_driver


def test_bloom_semi_join_over_budget_takes_distributed_path(spark):
    """A key set past max_driver_keys still semi-joins exactly — via
    the distributed build — and the driver never collects the keys."""
    events = load_table(spark, SF_DIR, "events")
    big = _md5_keys(events, "user_id")
    keys = _md5_keys(
        load_table(spark, SF_DIR, "customer").filter(F.col("c_custkey") % 3 == 0),
        "c_custkey",
    ).distinct()
    # force the over-budget branch with a tiny budget
    got = sorted(
        r.h for r in bloom.bloom_semi_join(big, keys, "h", max_driver_keys=10).collect()
    )
    want = sorted(r.h for r in big.join(keys, "h", "left_semi").collect())
    assert got == want
    assert got


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
