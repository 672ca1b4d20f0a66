"""Measure hand-salting vs AQE skew handling on a skewed corpus.

Round-9 verdict task: session.py enables
``spark.sql.adaptive.skewJoin`` while operators/skew.py hand-salts —
nothing pinned which wins, or whether the salted plan still beats
AQE-off/on under real skew. This probe times the four join variants
and the two aggregation variants on a generated hot-key corpus
(default 2M rows, 90% on one key) with broadcast DISABLED (the
salting operators exist precisely for the broadcast-ineligible case;
with broadcast on, Spark broadcasts any small dim and neither AQE nor
salting has anything to do).

    python tools/skew_aqe_probe.py [n_rows] [hot_share]

Prints one markdown table (appended to SCALING.md by hand) and the
guidance lines recorded in operators/skew.py. AQE confs are runtime-
settable, so all variants share one JVM; each cell is min-of-3 after
an untimed warmup, hot cell first so page-cache warmth favors no one.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.skew import salted_agg, salted_join
from dbm_nca_ph_etl_spark.session import get_spark


def _gen(spark, n_rows: int, hot_share: float):
    """Skewed fact (one key holds hot_share of rows, 24 cold keys
    share the rest) + a broadcast-ineligible-by-conf dim."""
    hot = F.when(
        F.pmod(F.col("id"), F.lit(1000)) < int(hot_share * 1000), F.lit(0)
    ).otherwise(F.pmod(F.col("id"), F.lit(24)) + 1)
    fact = (
        spark.range(n_rows)
        .select(
            hot.cast("int").alias("k"),
            F.col("id").alias("row_id"),
            (F.pmod(F.col("id"), F.lit(997))).cast("double").alias("v"),
        )
        .localCheckpoint(eager=True)  # freeze: generation cost out of band
    )
    dim = (
        spark.range(25)
        .select(F.col("id").cast("int").alias("k"), (F.col("id") * 10).alias("w"))
        .localCheckpoint(eager=True)
    )
    return fact, dim


def _time(fn, reps: int = 3) -> float:
    fn()  # warmup (codegen; data already checkpointed)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark(app_name="skew-aqe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the broadcast-ineligible case is the one salting exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    fact, dim = _gen(spark, n_rows, hot_share)

    def aqe(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(on).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    def sink(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def plain_join() -> None:
        sink(fact.join(dim, "k").select(F.sum(F.col("v") + F.col("w"))))

    def salt_join() -> None:
        sink(
            salted_join(fact, dim, on=["k"], salt_n=16, salt_src="row_id")
            .select(F.sum(F.col("v") + F.col("w")))
        )

    def plain_agg() -> None:
        sink(fact.groupBy("k").agg(F.sum("v"), F.count(F.lit(1))))

    def salt_agg() -> None:
        sink(
            salted_agg(
                fact, ["k"], {"sv": "sum(v)", "n": "count(*)"}, salt_n=16
            )
        )

    rows = []
    for label, fn in [
        ("join plain", plain_join),
        ("join salted", salt_join),
    ]:
        cells = []
        for on in (False, True):
            aqe(on)
            cells.append(_time(fn))
        rows.append((label, *cells))
    for label, fn in [("agg plain", plain_agg), ("agg salted", salt_agg)]:
        cells = []
        for on in (False, True):
            aqe(on)
            cells.append(_time(fn))
        rows.append((label, *cells))

    print(
        f"\n| variant (n={n_rows:,}, hot={hot_share:.0%}, "
        f"broadcast off, salt_n=16) | AQE off (s) | AQE on (s) |"
    )
    print("|---|---|---|")
    for label, off, on in rows:
        print(f"| {label} | {off} | {on} |")


if __name__ == "__main__":
    main()
