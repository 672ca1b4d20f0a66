"""Bloom filter operator tests: the no-false-negative safety
property, partition invariance of the packed bitmap, FP-rate sanity,
and parameter guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.bloom import bloom_build, bloom_might_contain


def _probe(spark, bf_df, keys_df, key_col, m_bits=1 << 16, k=4):
    return keys_df.crossJoin(F.broadcast(bf_df)).select(
        F.col(key_col),
        bloom_might_contain(F.col("_bf"), F.col(key_col), m_bits, k).alias("hit"),
    )


class TestBloom:
    def test_no_false_negatives(self, spark):
        # every inserted key must probe true — the property that makes
        # join pruning safe
        build = spark.range(0, 1000).select(F.col("id").alias("k"))
        bf = bloom_build(build, "k")
        out = _probe(spark, bf, build, "k").collect()
        assert len(out) == 1000
        assert all(r.hit for r in out)

    def test_fp_rate_bounded(self, spark):
        # disjoint probe keys: (1-e^(-kn/m))^k ≈ 2e-5 at n=1000,
        # m=2^16, k=4 — allow three orders of magnitude of headroom
        build = spark.range(0, 1000).select(F.col("id").alias("k"))
        bf = bloom_build(build, "k")
        probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
        fp = _probe(spark, bf, probe, "k").where("hit").count()
        assert fp <= 20000 * 0.01, f"false-positive count {fp} out of 20000"

    def test_bitmap_partition_invariant(self, spark):
        build = spark.range(0, 500).select(F.col("id").alias("k"))
        a = bloom_build(build, "k").collect()[0]
        b = bloom_build(build.repartition(13), "k").collect()[0]
        assert a._bf_n == b._bf_n == 500
        assert dict(a._bf) == dict(b._bf)

    def test_duplicate_keys_counted_once(self, spark):
        build = spark.range(0, 100).select((F.col("id") % 10).alias("k"))
        bf = bloom_build(build, "k").collect()[0]
        assert bf._bf_n == 10

    def test_param_guards(self, spark):
        build = spark.range(0, 10).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="m_bits"):
            bloom_build(build, "k", m_bits=100)
        with pytest.raises(ValueError, match="k must"):
            bloom_build(build, "k", k=0)
