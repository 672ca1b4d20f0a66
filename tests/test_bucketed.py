"""Bucketed-layout contract: the write-time shuffle buys exchange-free
joins and aggregations (sinks/bucketed.py — the 100 TB co-location
strategy). Asserted on the physical plan, same discipline as
test_plans.py: a silent layout regression costs a full fact-table
shuffle per query at scale."""

from __future__ import annotations

import re

import pytest

from dbm_nca_ph_etl_spark.sinks.bucketed import (
    cobucket_tables,
    read_bucketed,
    write_bucketed,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def shuffles(plan: str) -> int:
    return len(re.findall(r"\bExchange (hash|range|Single)", plan))


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    tables = cobucket_tables(
        spark,
        {
            "b_orders": (orders, ["o_custkey"]),
            "b_customer": (customer, ["c_custkey"]),
        },
        num_buckets=8,
        base_path=base,
    )
    yield tables
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    """orders ⋈ customer on the bucket key: zero shuffles — the join
    reads matching buckets pairwise (with broadcast disabled so the
    planner can't sidestep the layout)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed["b_orders"].join(
            bucketed["b_customer"],
            bucketed["b_orders"]["o_custkey"] == bucketed["b_customer"]["c_custkey"],
        )
        p = plan_of(j)
        assert "SortMergeJoin" in p
        assert shuffles(p) == 0, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    """groupBy on the bucket key aggregates bucket-locally — no
    exchange before the hash aggregate."""
    from pyspark.sql import functions as F

    agg = bucketed["b_orders"].groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend")
    )
    assert shuffles(plan_of(agg)) == 0


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    """Layout changes nothing semantically: same row count as the
    plain parquet join."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = o.join(c, o["o_custkey"] == c["c_custkey"]).count()
    bucketed_count = (
        bucketed["b_orders"]
        .join(
            bucketed["b_customer"],
            bucketed["b_orders"]["o_custkey"] == bucketed["b_customer"]["c_custkey"],
        )
        .count()
    )
    assert bucketed_count == plain


def test_bucket_pruning_on_key_filter(spark, bucketed):
    """A point filter on the bucket key scans ONE bucket of 8
    (SelectedBucketsCount) — partition-pruning economics without a
    partition column. Spark's auto-bucketed-scan heuristic skips
    bucketed reading when no join/agg exploits the distribution, so
    pin it on for the assertion (a real point-lookup job would too)."""
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        p = plan_of(read_bucketed(spark, "b_orders").where("o_custkey = 7"))
        assert "SelectedBucketsCount: 1 out of 8" in p, p
    finally:
        spark.conf.set(conf, old)
