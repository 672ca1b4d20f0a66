"""Salted join/agg equivalence tests: salting must never change
results, only the shuffle layout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.skew import salted_agg, salted_join


def test_salted_join_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, ["l_orderkey"]).groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(li, o, ["l_orderkey"], salt_n=5).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_orderkey % 2 = 0")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus")
    )
    plain = li.join(o, ["l_orderkey"], "left")
    salted = salted_join(li, o, ["l_orderkey"], salt_n=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.where("o_orderstatus IS NULL").count()
        == salted.where("o_orderstatus IS NULL").count()
    )


def test_salted_agg_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = sorted(
        map(
            tuple,
            li.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("sq"),
                F.min("l_shipdate").alias("mn"),
                F.max("l_shipdate").alias("mx"),
            )
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_agg(
                li,
                ["l_returnflag"],
                {
                    "n": "count(*)",
                    "sq": "sum(l_quantity)",
                    "mn": "min(l_shipdate)",
                    "mx": "max(l_shipdate)",
                },
                salt_n=7,
            )
            .withColumn("sq", F.round("sq", 2))
            .collect(),
        )
    )
    assert plain == salted


def test_salted_rollup_plan_scatters_the_hot_key(spark, sf_dir):
    """The catalog query's whole point is plan shape: the join and
    the partial agg must shuffle on (key, _salt), not on the bare hot
    key — one reducer per (key, salt) pair instead of one reducer
    swallowing the whole key."""
    from dbm_nca_ph_etl_spark.plans.queries import QUERIES

    df = QUERIES["salted_hot_key_rollup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    # the salted exchanges partition on (event_type, _salt)
    import re

    salted_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "_salt" in ln
    ]
    assert salted_exchanges, plan
    # and the final gather is the only bare-key exchange
    assert df.count() == 5
