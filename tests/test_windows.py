"""Partition-invariance property tests for the ordered kernel.

The classic Spark port bug (SURVEY §5): any operator that silently
depends on collect_list/partition order breaks when the input is
repartitioned. Every W1-W4 operator must produce identical results
under adversarial repartitioning.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from dbm_nca_ph_etl_spark.operators.windows import (
    forward_fill,
    leading_run_concat,
    ordered_collect,
    segment_by_change,
    segment_by_flag,
    sessionize,
)


@pytest.fixture(scope="module")
def scattered(spark):
    """A deterministic event-ish table, shuffled and oddly partitioned."""
    rng = random.Random(42)
    rows = []
    for g in range(5):
        for i in range(200):
            rows.append(
                Row(
                    g=g,
                    i=i,
                    v=None if i % 7 == 0 else float(rng.randint(0, 100)),
                    k=f"K{rng.randint(0, 3)}",
                    ts=1_700_000_000 + i * 60 + rng.randint(0, 5),
                )
            )
    rng.shuffle(rows)
    return spark.createDataFrame(rows).repartition(13, "k")


def rows_set(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_forward_fill_partition_invariant(scattered):
    a = forward_fill(scattered, "v", ["g"], ["i"], out_col="f")
    b = forward_fill(scattered.repartition(3), "v", ["g"], ["i"], out_col="f")
    c = forward_fill(scattered.coalesce(1), "v", ["g"], ["i"], out_col="f")
    assert rows_set(a) == rows_set(b) == rows_set(c)


def test_forward_fill_semantics(spark):
    df = spark.createDataFrame(
        [Row(g=1, i=1, v="a"), Row(g=1, i=2, v=None), Row(g=1, i=3, v=None),
         Row(g=1, i=4, v="b"), Row(g=1, i=5, v=None)]
    )
    out = {r.i: r.v for r in forward_fill(df, "v", ["g"], ["i"]).collect()}
    assert out == {1: "a", 2: "a", 3: "a", 4: "b", 5: "b"}


def test_segment_by_change(spark):
    df = spark.createDataFrame(
        [Row(g=1, i=i, k=k) for i, k in enumerate(["a", "a", "b", "b", "a", "c"])]
    )
    out = {r.i: r.segment_id for r in segment_by_change(df, "k", ["g"], ["i"]).collect()}
    assert out == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 4}


def test_segment_by_flag_partition_invariant(scattered):
    flag = F.col("k") == "K0"
    a = segment_by_flag(scattered, flag, ["g"], ["i"])
    b = segment_by_flag(scattered.repartition(7, "g"), flag, ["g"], ["i"])
    assert rows_set(a) == rows_set(b)


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [Row(u=1, t=0), Row(u=1, t=100), Row(u=1, t=2000), Row(u=1, t=2100),
         Row(u=2, t=50)]
    )
    out = sessionize(df, "t", ["u"], gap=1000)
    got = {(r.u, r.t): r.session_id for r in out.collect()}
    assert got == {(1, 0): 1, (1, 100): 1, (1, 2000): 2, (1, 2100): 2, (2, 50): 1}


def test_ordered_collect_pins_order(scattered):
    agg_a = scattered.groupBy("g").agg(ordered_collect("v", "i").alias("arr"))
    agg_b = (
        scattered.repartition(17)
        .groupBy("g")
        .agg(ordered_collect("v", "i").alias("arr"))
    )
    assert rows_set(agg_a) == rows_set(agg_b)
    one = agg_a.where(F.col("g") == 0).collect()[0].arr
    assert len(one) == 200  # nulls preserved, order pinned by i


def test_leading_run_concat(spark):
    df = spark.createDataFrame(
        [Row(arr=["a", "b", "", "c"]), Row(arr=["", "x"]), Row(arr=["p", "q"]),
         Row(arr=[None, "y"]), Row(arr=[])]
    )
    got = [r.s for r in df.select(leading_run_concat(F.col("arr")).alias("s")).collect()]
    assert got == ["a b", "", "p q", "", ""]


class TestPrefixSum:
    def test_matches_naive_global_window(self, spark):
        from pyspark.sql import Window

        from dbm_nca_ph_etl_spark.operators.windows import prefix_sum

        df = spark.createDataFrame(
            [Row(k=i, v=(i * 37) % 11 + 1) for i in range(500)]
        ).repartition(7)
        got = prefix_sum(df, "v", ["k"], out_col="p")
        w = (
            Window.orderBy("k")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = df.withColumn("p", (F.sum("v").over(w) - F.col("v")).cast("long"))
        assert rows_set(got) == rows_set(want)

    def test_partition_invariant(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import prefix_sum

        rng = random.Random(7)
        rows = [Row(k=i, v=rng.randint(0, 50)) for i in range(300)]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows)
        a = prefix_sum(df.repartition(17), "v", ["k"], out_col="p")
        b = prefix_sum(df.coalesce(1), "v", ["k"], out_col="p", num_partitions=3)
        assert rows_set(a) == rows_set(b)

    def test_precomputed_cuts_reused_bit_exactly(self, spark):
        """cuts= skips the eager approxQuantile job and any sorted
        boundary list gives the exact same answer (boundaries only
        balance block sizes)."""
        from dbm_nca_ph_etl_spark.operators.windows import prefix_sum

        rows = [Row(k=i, v=(i * 13) % 7 + 1) for i in range(200)]
        df = spark.createDataFrame(rows).repartition(5)
        sampled = prefix_sum(df, "v", ["k"], out_col="p")
        reused = prefix_sum(df, "v", ["k"], out_col="p", cuts=[50.0, 100.0, 150.0])
        lopsided = prefix_sum(df, "v", ["k"], out_col="p", cuts=[3.0])
        assert rows_set(sampled) == rows_set(reused) == rows_set(lopsided)

    def test_exclusive_first_row_zero(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import prefix_sum

        df = spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20), Row(k=3, v=5)])
        got = {r["k"]: r["p"] for r in prefix_sum(df, "v", ["k"], out_col="p").collect()}
        assert got == {1: 0, 2: 10, 3: 30}


class TestPrefixSumDuplicateFirstKey:
    def test_heavy_duplicates_on_the_block_key(self, spark):
        """Blocks are cut on the FIRST order column only (quantile
        literals); rows equal on it must always share a block, so a
        heavily-duplicated first key — the worst case for quantile
        cuts landing ON a duplicated value — must still produce the
        exact global prefix sum under the (k, tie) total order."""
        import random as _r

        from pyspark.sql import Window

        from dbm_nca_ph_etl_spark.operators.windows import prefix_sum

        rng = _r.Random(13)
        # only 5 distinct first-key values over 400 rows
        rows = [
            Row(k=rng.choice([1, 2, 2, 2, 3, 7, 9]), tie=i, v=rng.randint(0, 9))
            for i in range(400)
        ]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows).repartition(11)
        got = prefix_sum(df, "v", ["k", "tie"], out_col="p", num_partitions=8)
        w = (
            Window.orderBy("k", "tie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = df.withColumn("p", (F.sum("v").over(w) - F.col("v")).cast("long"))
        key = lambda r: (r.k, r.tie)
        assert sorted(
            ((r.k, r.tie, r.p) for r in got.collect())
        ) == sorted((r.k, r.tie, r.p) for r in want.collect())


class TestQuotaViaPrefixSum:
    def test_giant_cell_quota_matches_global_window(self, spark):
        """The corpus_quota_sample docstring promises that a giant
        cell can swap the single-task global window for the two-phase
        prefix_sum with identical results — prove it: same kept set,
        same kept-token totals, on a one-cell corpus."""
        from pyspark.sql import Window

        from dbm_nca_ph_etl_spark.operators.windows import prefix_sum
        from dbm_nca_ph_etl_spark.sources.catalog import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        base = docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tokens"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("qs:"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        quota = 5000
        w = Window.orderBy("h", "doc_id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        via_window = {
            r.doc_id
            for r in base.withColumn(
                "cb", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            )
            .where(F.col("cb") < quota)
            .collect()
        }
        via_prefix = {
            r.doc_id
            for r in prefix_sum(
                base, "n_tokens", ["h", "doc_id"], out_col="cb", num_partitions=7
            )
            .where(F.col("cb") < quota)
            .collect()
        }
        assert via_window == via_prefix and len(via_window) > 10


class TestSkyline2D:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id int, price double, size int")

    def test_small_frontier_with_ties_and_dups(self, spark):
        # frontier pairs: (1.0, 5), (2.0, 8); (3.0, 8) dominated by
        # (2.0, 8); (1.5, 5) dominated by (1.0, 5); equal pairs both
        # survive (neither strictly dominates the other)
        df = self._df(
            spark,
            [
                (1, 1.0, 5),
                (2, 1.0, 5),   # duplicate frontier pair — kept too
                (3, 2.0, 8),
                (4, 3.0, 8),
                (5, 1.5, 5),
                (6, 2.0, 3),
            ],
        )
        from dbm_nca_ph_etl_spark.operators.windows import skyline_2d

        got = sorted(r.id for r in skyline_2d(df, "price", "size").collect())
        assert got == [1, 2, 3]

    def test_matches_not_exists_spec(self, spark, sf_dir):
        from dbm_nca_ph_etl_spark.sources.catalog import load_table
        from dbm_nca_ph_etl_spark.operators.windows import skyline_2d

        part = load_table(spark, sf_dir, "part")
        part.createOrReplaceTempView("_sky_part")
        spec = {
            r.p_partkey
            for r in spark.sql(
                """
                SELECT a.p_partkey FROM _sky_part a
                WHERE NOT EXISTS (
                  SELECT 1 FROM _sky_part b
                  WHERE b.p_retailprice <= a.p_retailprice
                    AND b.p_size >= a.p_size
                    AND (b.p_retailprice < a.p_retailprice
                         OR b.p_size > a.p_size))
                """
            ).collect()
        }
        got = {
            r.p_partkey
            for r in skyline_2d(part, "p_retailprice", "p_size").collect()
        }
        assert got == spec and got

    def test_partition_invariant(self, spark):
        import random

        from dbm_nca_ph_etl_spark.operators.windows import skyline_2d

        rng = random.Random(11)
        rows = [
            (i, float(rng.randint(1, 40)), rng.randint(1, 30))
            for i in range(300)
        ]
        df = self._df(spark, rows)
        a = sorted(r.id for r in skyline_2d(df.repartition(1), "price", "size").collect())
        b = sorted(r.id for r in skyline_2d(df.repartition(13), "price", "size").collect())
        assert a == b and a


class TestTimeGridInterpolate:
    def _run(self, spark, rows, step=1):
        from dbm_nca_ph_etl_spark.operators.windows import time_grid_interpolate

        df = spark.createDataFrame(rows, "k string, t long, v long")
        out = time_grid_interpolate(df, ["k"], "t", "v", step)
        return {(r.k, r.t): (r.interp, r.observed) for r in out.collect()}

    def test_linear_between_observations(self, spark):
        got = self._run(spark, [("a", 0, 100), ("a", 4, 200)])
        assert got == {
            ("a", 0): (100, 1),
            ("a", 1): (125, 0),
            ("a", 2): (150, 0),
            ("a", 3): (175, 0),
            ("a", 4): (200, 1),
        }

    def test_round_half_up(self, spark):
        got = self._run(spark, [("a", 0, 0), ("a", 2, 1)])
        assert got[("a", 1)] == (1, 0)  # exact 0.5 rounds up

    def test_negative_values(self, spark):
        got = self._run(spark, [("a", 0, -100), ("a", 4, 0)])
        assert got[("a", 1)] == (-75, 0) and got[("a", 3)] == (-25, 0)
        # -0.5 rounds half-UP to 0 (toward +inf), the convention both
        # engines reproduce through the positive shift
        got2 = self._run(spark, [("b", 0, -1), ("b", 2, 0)])
        assert got2[("b", 1)] == (0, 0)

    def test_multi_key_and_partition_invariance(self, spark):
        rows = [("a", 0, 10), ("a", 10, 110), ("b", 5, 1000), ("b", 8, 400)]
        from dbm_nca_ph_etl_spark.operators.windows import time_grid_interpolate

        df = spark.createDataFrame(rows, "k string, t long, v long")
        a = {
            (r.k, r.t): (r.interp, r.observed)
            for r in time_grid_interpolate(
                df.repartition(1), ["k"], "t", "v", 1
            ).collect()
        }
        b = {
            (r.k, r.t): (r.interp, r.observed)
            for r in time_grid_interpolate(
                df.repartition(9), ["k"], "t", "v", 1
            ).collect()
        }
        assert a == b
        assert a[("a", 5)] == (60, 0) and a[("b", 6)] == (800, 0)
        assert len(a) == 11 + 4

    def test_deep_negative_domain(self, spark):
        """Values below -2^41 — the domain where the old positivity
        shift under-shifted and truncation stopped being floor. The
        2^63 shift covers the whole int64 value range (ADVICE r5)."""
        lo = -(1 << 50)
        got = self._run(spark, [("a", 0, lo), ("a", 2, lo + 2)])
        assert got[("a", 1)] == (lo + 1, 0)
        # -x.5 still rounds half-UP (toward +inf) this deep
        got2 = self._run(spark, [("b", 0, lo), ("b", 2, lo + 1)])
        assert got2[("b", 1)] == (lo + 1, 0)

    def test_single_observation_key(self, spark):
        got = self._run(spark, [("solo", 7, 42)])
        assert got == {("solo", 7): (42, 1)}


class TestMatchSequence:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, ts_us long, event_type string")

    def _match(self, df, gap=100):
        from dbm_nca_ph_etl_spark.operators.windows import match_sequence

        return {
            r.user_id: (r.t1, r.t2, r.t3)
            for r in match_sequence(
                df,
                [
                    F.col("event_type") == "a",
                    F.col("event_type") == "b",
                    F.col("event_type") == "c",
                ],
                gap=gap,
            ).collect()
        }

    def test_basic_match_and_gap_violation(self, spark):
        df = self._events(
            spark,
            [
                (1, 10, "a"), (1, 50, "b"), (1, 120, "c"),      # all gaps <= 100
                (2, 10, "a"), (2, 200, "b"), (2, 250, "c"),     # a->b gap 190 > 100
                (3, 10, "a"), (3, 20, "b"),                      # no c
            ],
        )
        got = self._match(df)
        assert got == {1: (10, 50, 120)}

    def test_greedy_earliest_pinned(self, spark):
        # waiting for the later 'a' (t=60) would satisfy the gaps, but
        # greedy t1=10 forces b in (10, 110] -> picks 100, then c must
        # land in (100, 200] -> 150 matches. Document the exact picks.
        df = self._events(
            spark,
            [
                (1, 10, "a"), (1, 60, "a"), (1, 100, "b"), (1, 150, "c"),
            ],
        )
        assert self._match(df) == {1: (10, 100, 150)}

    def test_equal_timestamp_not_after(self, spark):
        # stage i+1 must be STRICTLY after stage i
        df = self._events(spark, [(1, 10, "a"), (1, 10, "b"), (1, 20, "c")])
        assert self._match(df) == {}

    def test_guards(self, spark):
        import pytest

        from dbm_nca_ph_etl_spark.operators.windows import match_sequence

        df = self._events(spark, [(1, 10, "a")])
        with pytest.raises(ValueError, match="at least 2"):
            match_sequence(df, [F.lit(True)], gap=10)
        with pytest.raises(ValueError, match="gap"):
            match_sequence(df, [F.lit(True), F.lit(True)], gap=0)


class TestGridCumsums:
    """grid_cumsums: the in-code guard for the post-agg global-window
    pattern (ks_drift / mann_whitney). Small grids window directly;
    a grid past max_window_rows routes through prefix_sum — both
    branches must be bit-identical."""

    def _grid(self, spark, n=500, seed=7):
        rng = random.Random(seed)
        rows = [(v, rng.randint(0, 5), rng.randint(0, 5)) for v in
                rng.sample(range(10 * n), n)]
        return spark.createDataFrame(rows, "v long, ca long, cb long")

    def _rows(self, df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    def test_branches_bit_identical_inclusive(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import grid_cumsums

        g = self._grid(spark).localCheckpoint(eager=True)
        small = grid_cumsums(g, "v", ["ca", "cb"])          # window branch
        big = grid_cumsums(g, "v", ["ca", "cb"], max_window_rows=1)  # prefix
        assert self._rows(small) == self._rows(big)

    def test_branches_bit_identical_exclusive_with_totals(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import grid_cumsums

        g = self._grid(spark, n=300, seed=11).withColumn(
            "t", F.col("ca") + F.col("cb")
        ).localCheckpoint(eager=True)
        small = grid_cumsums(g, "v", ["t"], inclusive=False,
                             total_cols=["ca", "cb"])
        big = grid_cumsums(g, "v", ["t"], inclusive=False,
                           total_cols=["ca", "cb"], max_window_rows=1)
        assert self._rows(small) == self._rows(big)

    def test_semantics_against_naive(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import grid_cumsums

        g = spark.createDataFrame(
            [(3, 1, 0), (1, 2, 1), (7, 0, 4)], "v long, ca long, cb long"
        )
        got = {r.v: (r.cum_ca, r.cum_cb, r.tot_ca, r.tot_cb)
               for r in grid_cumsums(g, "v", ["ca", "cb"]).collect()}
        assert got == {1: (2, 1, 3, 5), 3: (3, 1, 3, 5), 7: (3, 5, 3, 5)}
        excl = {r.v: r.cum_ca for r in
                grid_cumsums(g, "v", ["ca"], inclusive=False).collect()}
        assert excl == {1: 0, 3: 2, 7: 3}

    def test_high_cardinality_domain_routes_through_prefix_sum(self, spark):
        """The VERDICT-r7 guard scenario: a caller on a non-cents,
        high-cardinality value column must not build a
        single-partition window — the plan of the guarded branch
        carries the prefix_sum block join instead of one global
        running-sum window over the data."""
        from dbm_nca_ph_etl_spark.operators.windows import grid_cumsums

        g = self._grid(spark, n=2000, seed=3).localCheckpoint(eager=True)
        guarded = grid_cumsums(g, "v", ["ca"], max_window_rows=100)
        plan = guarded._sc._jvm.PythonSQLUtils.explainString(
            guarded._jdf.queryExecution(), "formatted"
        )
        # prefix_sum's signature move: the _blk-partitioned window +
        # a broadcast join; no window may run over the raw grid order
        assert "_blk" in plan
        # correctness unchanged
        naive = grid_cumsums(g, "v", ["ca"])
        assert self._rows(guarded) == self._rows(naive)


class TestQuantileThresholds:
    """quantile_thresholds — the one home of the nearest-rank
    threshold idiom: both routes (bounded grid, unbounded prefix_sum)
    must agree with each other and with the rank-at-ceil(q·n/100)
    definition computed in plain Python."""

    def _df(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, rng.randrange(0, 40)) for i in range(500)]
        return (
            spark.createDataFrame(rows, "id long, m long"),
            sorted(v for _, v in rows),
        )

    def test_routes_agree_and_match_definition(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import quantile_thresholds

        df, vals = self._df(spark)
        n = len(vals)
        qs = (25, 50, 75, 90)
        want = {
            f"t{i + 1}": vals[-(-n * q // 100) - 1]  # ceil(q·n/100), 1-based
            for i, q in enumerate(qs)
        }
        b = quantile_thresholds(df, "m", qs, bounded=True).collect()[0]
        u = quantile_thresholds(
            df, "m", qs, bounded=False, tie_break="id"
        ).collect()[0]
        assert b.asDict() == want
        assert u.asDict() == want

    def test_partition_invariance(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import quantile_thresholds

        df, _ = self._df(spark)
        a = quantile_thresholds(
            df.repartition(13), "m", (50,), bounded=False, tie_break="id"
        ).collect()
        b = quantile_thresholds(
            df.coalesce(1), "m", (50,), bounded=False, tie_break="id"
        ).collect()
        assert a == b

    def test_refinement_rounds_preserve_exactness(self, spark, monkeypatch):
        """Force the multi-select's capped refinement to actually run
        (every octave bucket over a tiny cap) — the refined picks must
        still match the plain-Python nearest-rank definition."""
        import dbm_nca_ph_etl_spark.operators.windows as W

        monkeypatch.setattr(W, "_SELECT_CAP", 8)
        df, vals = self._df(spark)
        n = len(vals)
        qs = (25, 50, 75, 90)
        want = {
            f"t{i + 1}": vals[-(-n * q // 100) - 1]
            for i, q in enumerate(qs)
        }
        u = W.quantile_thresholds(
            df, "m", qs, bounded=False, tie_break="id"
        ).collect()[0]
        assert u.asDict() == want

    def test_duplicate_heavy_bucket_short_circuits(self, spark, monkeypatch):
        """A bucket that collapses to ONE value is its own threshold —
        however many duplicate rows it holds, no window sorts them
        (the tie-mountain case a rank-based route would sort whole)."""
        import dbm_nca_ph_etl_spark.operators.windows as W

        monkeypatch.setattr(W, "_SELECT_CAP", 8)
        rows = [(i, 17) for i in range(400)] + [
            (400 + i, v) for i, v in enumerate((1, 2, 3, 900, 950))
        ]
        df = spark.createDataFrame(rows, "id long, m long")
        vals = sorted(v for _, v in rows)
        n = len(vals)
        got = W.quantile_thresholds(
            df, "m", (50, 99), bounded=False, tie_break="id"
        ).collect()[0]
        assert got["t1"] == vals[-(-n * 50 // 100) - 1] == 17
        assert got["t2"] == vals[-(-n * 99 // 100) - 1]

    def test_empty_input_yields_null_thresholds(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import quantile_thresholds

        df = spark.createDataFrame([], "id long, m long")
        row = quantile_thresholds(
            df, "m", (50,), bounded=False, tie_break="id"
        ).collect()
        assert len(row) == 1 and row[0]["t1"] is None

    def test_names_and_validation(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import quantile_thresholds

        df, _ = self._df(spark)
        out = quantile_thresholds(
            df, "m", (50,), bounded=True, names=["median"]
        )
        assert out.columns == ["median"]
        import pytest as _pytest

        with _pytest.raises(ValueError, match="tie_break"):
            quantile_thresholds(df, "m", (50,), bounded=False)
        with _pytest.raises(ValueError, match="align"):
            quantile_thresholds(df, "m", (50,), bounded=True, names=["a", "b"])


class TestEwmaScaled:
    """Exact integer EWMA (alpha=1/2, truncated expansion)."""

    @staticmethod
    def _reference(rows, terms=40):
        # rows: (key, ord1, ord2, value) — python ground truth
        byk = {}
        for k, o1, o2, v in rows:
            byk.setdefault(k, []).append((o1, o2, v))
        out = {}
        for k, obs in byk.items():
            obs.sort()
            tail = obs[-terms:]
            s = sum(
                v * (1 << (terms - 1 - age))
                for age, (_, _, v) in enumerate(reversed(tail))
            )
            out[k] = (len(obs), s)
        return out

    def _run(self, spark, rows, terms=40):
        from dbm_nca_ph_etl_spark.operators.windows import ewma_scaled

        df = spark.createDataFrame(
            rows, "k long, o1 long, o2 long, v long"
        )
        got = {
            r.k: (r.n_obs, r.ewma_scaled)
            for r in ewma_scaled(
                df, ["k"], ["o1", "o2"], "v", terms=terms
            ).collect()
        }
        assert got == self._reference(rows, terms)

    def test_matches_reference_short_series(self, spark):
        rows = [
            (1, 1, 0, 100),
            (1, 2, 0, 200),
            (1, 3, 0, 50),
            (2, 5, 0, 7),
        ]
        self._run(spark, rows)

    def test_truncates_to_newest_terms(self, spark):
        # 120 observations, terms=40: only the newest 40 contribute
        rows = [(1, i, 0, (i * 37) % 900 + 1) for i in range(120)]
        self._run(spark, rows, terms=40)
        self._run(spark, rows, terms=8)

    def test_tie_break_second_order_column(self, spark):
        # same o1, order decided by o2 — weights must follow (o1, o2)
        rows = [(1, 10, 2, 300), (1, 10, 1, 100), (1, 10, 3, 900)]
        self._run(spark, rows)

    def test_partitioning_invariance(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import ewma_scaled

        rows = [
            (k, i, 0, ((k * 13 + i * 7) % 500) + 1)
            for k in range(6)
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "k long, o1 long, o2 long, v long")
        a = {
            r.k: r.ewma_scaled
            for r in ewma_scaled(
                df.repartition(1), ["k"], ["o1", "o2"], "v"
            ).collect()
        }
        b = {
            r.k: r.ewma_scaled
            for r in ewma_scaled(
                df.repartition(16), ["k"], ["o1", "o2"], "v"
            ).collect()
        }
        assert a == b == {
            k: s for k, (_, s) in self._reference(rows).items()
        }

    def test_single_shuffle_exchange_reuse(self, spark):
        from dbm_nca_ph_etl_spark.operators.windows import ewma_scaled

        df = spark.createDataFrame(
            [(1, 1, 0, 10)], "k long, o1 long, o2 long, v long"
        )
        plan = (
            ewma_scaled(df, ["k"], ["o1", "o2"], "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re as _re

        # window prune + groupBy share the hash partitioning on k:
        # one real exchange (plus whatever the tiny local input needs)
        assert len(_re.findall(r"\bExchange hashpartitioning", plan)) <= 1, plan
