"""Incremental digest verification on the keyed layout: a merge's
touched-bucket set drives a partition-pruned re-digest whose splice
into the stored digest table equals a full re-digest; corruption
localizes to its bucket (operators/integrity keyed_digest /
refresh_digest / diff_digest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.integrity import (
    diff_digest,
    keyed_digest,
    refresh_digest,
)
from dbm_nca_ph_etl_spark.sinks.keyed import (
    KB_COL,
    delete_keyed,
    upsert_keyed,
    write_keyed,
)

N_BUCKETS = 8
CANON = lambda: [F.col("k").cast("string"), F.col("v")]  # noqa: E731


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k long, v string"
    )
    write_keyed(base, path, ["k"], num_buckets=N_BUCKETS)
    return path


class TestIncrementalDigest:
    def test_upsert_then_incremental_equals_full(self, spark, table):
        # materialize the pre-merge digest: its lazy plan reads files
        # the upsert is about to rewrite
        stored = keyed_digest(spark, table, CANON()).localCheckpoint(eager=True)
        stored_rows = _rows(stored)
        assert 1 < len(stored_rows) <= N_BUCKETS

        batch = spark.createDataFrame(
            [(3, "NEW3"), (17, "NEW17"), (99, "v99")], "k long, v string"
        )
        touched = upsert_keyed(spark, batch, table, ["k"])
        assert touched  # the merge reports its bucket set

        partial = keyed_digest(spark, table, CANON(), buckets=touched)
        incremental = refresh_digest(stored, partial, touched)
        full = keyed_digest(spark, table, CANON())
        assert _rows(incremental) == _rows(full)
        # and the content actually changed vs the pre-merge digest
        assert _rows(full) != stored_rows
        # ...only in the touched buckets
        changed = {r[0] for r in diff_digest(stored, full).collect()}
        assert changed <= set(touched)

    def test_partial_scan_is_partition_pruned(self, spark, table):
        touched = upsert_keyed(
            spark,
            spark.createDataFrame([(3, "x")], "k long, v string"),
            table,
            ["k"],
        )
        partial = keyed_digest(spark, table, CANON(), buckets=touched)
        plan = partial._sc._jvm.PythonSQLUtils.explainString(
            partial._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters" in plan and KB_COL in plan, plan

    def test_delete_empties_bucket_and_still_reconciles(self, spark, table):
        stored = keyed_digest(spark, table, CANON()).localCheckpoint(eager=True)
        # delete every key in one bucket: its digest row must vanish
        base = spark.read.parquet(table)
        some_bucket = base.select(KB_COL).first()[0]
        doomed = base.where(F.col(KB_COL) == some_bucket).select("k")
        touched = delete_keyed(spark, table, doomed, ["k"])
        assert some_bucket in touched
        partial = keyed_digest(spark, table, CANON(), buckets=touched)
        incremental = refresh_digest(stored, partial, touched)
        full = keyed_digest(spark, table, CANON())
        assert _rows(incremental) == _rows(full)
        assert some_bucket not in {r[0] for r in full.collect()}

    def test_corruption_localizes_to_its_bucket(self, spark, table):
        expected = keyed_digest(spark, table, CANON()).localCheckpoint()
        # corrupt one bucket directory behind the digest's back:
        # flip a value without changing the row count
        victim = spark.read.parquet(table).select(KB_COL).first()[0]
        bucket_dir = f"{table}/{KB_COL}={victim}"
        rows = spark.read.parquet(bucket_dir).localCheckpoint(eager=True)
        corrupted = rows.withColumn(
            "v",
            F.when(
                F.col("k") == rows.select(F.min("k")).first()[0],
                F.lit("CORRUPTED"),
            ).otherwise(F.col("v")),
        )
        corrupted.write.mode("overwrite").parquet(bucket_dir)

        actual = keyed_digest(spark, table, CANON())
        bad = diff_digest(expected, actual).collect()
        assert [r.bucket for r in bad] == [victim]
        r = bad[0]
        # a value-only corruption keeps the row count, changes the digest
        assert r.n_rows_expected == r.n_rows_actual
        assert r.digest_expected != r.digest_actual

    def test_one_sided_bucket_is_a_mismatch(self, spark):
        a = spark.createDataFrame(
            [(0, 2, "d0"), (1, 3, "d1")], "bucket long, n_rows long, digest string"
        )
        b = spark.createDataFrame(
            [(0, 2, "d0")], "bucket long, n_rows long, digest string"
        )
        bad = diff_digest(a, b).collect()
        assert [r.bucket for r in bad] == [1]
        assert bad[0].n_rows_actual is None
