"""Exact heavy hitters: candidate guarantee + recount exactness."""

import pyspark.sql.functions as F

from dbm_nca_ph_etl_spark.operators.frequent import (
    exact_heavy_hitters,
    local_share_candidates,
)


def _items(spark, data, partitions):
    return spark.createDataFrame(
        [(x,) for x in data], "item string"
    ).repartition(partitions)


class TestHeavyHitters:
    def test_matches_naive_groupby(self, spark):
        # 'a' 40%, 'b' 25%, everything else rare
        data = ["a"] * 400 + ["b"] * 250 + [f"r{i}" for i in range(350)]
        items = _items(spark, data, 8)
        got = {
            (r["item"], r["cnt"])
            for r in exact_heavy_hitters(items, "item", phi_denom=10).collect()
        }
        naive = (
            items.groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") * 10 >= 1000)
        )
        want = {(r["item"], r["cnt"]) for r in naive.collect()}
        assert got == want == {("a", 400), ("b", 250)}

    def test_no_false_negatives_under_adversarial_skew(self, spark):
        """A hitter spread thin across partitions must still surface:
        with global share exactly at the threshold, pigeonhole says
        some partition is at-or-above it."""
        # 'h' is exactly 1/10 of 1000 rows, diluted over 10 partitions
        data = ["h"] * 100 + [f"x{i}" for i in range(900)]
        items = _items(spark, data, 10)
        got = exact_heavy_hitters(items, "item", phi_denom=10).collect()
        assert ("h", 100) in {(r["item"], r["cnt"]) for r in got}

    def test_false_positives_are_recounted_away(self, spark):
        """An item that is locally hot in one tiny partition but
        globally rare must NOT appear after the recount."""
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # partition-local heat: repartition by item puts all 5 'hot'
        # rows in one partition where their local share is high
        data = ["hot"] * 5 + [f"x{i}" for i in range(995)]
        items = spark.createDataFrame(
            [(x,) for x in data], "item string"
        ).repartition(8, "item")
        cands = {r["item"] for r in local_share_candidates(items, "item", 0.01).collect()}
        assert "hot" in cands  # locally hot → candidate
        got = {r["item"] for r in exact_heavy_hitters(items, "item", 100).collect()}
        assert "hot" not in got  # globally 0.5% < 1% → recounted away

    def test_empty_input(self, spark):
        items = _items(spark, [], 4)
        assert exact_heavy_hitters(items, "item", 10).count() == 0
