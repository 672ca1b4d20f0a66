"""Zone-map data-skipping tests: footer harvest correctness, file-
level prune assertions on a range-clustered layout, the no-skip
behavior on random layout, conservatism (pruned read == full filter),
and sidecar drift guards."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.sinks.zonemap import (
    ZM_DIR,
    _data_files,
    pruned_read,
    write_zonemaps,
)


@pytest.fixture()
def clustered(spark):
    """1000 rows, v in [0,1000), range-clustered into 10 files of
    exactly 100 values each (hive dir per bucket -> one file per
    bucket)."""
    scratch = tempfile.mkdtemp(prefix="zm_test_")
    path = os.path.join(scratch, "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.col("id").alias("v"),
        (F.col("id") / 100).cast("int").alias("zb"),
    )
    df.repartition(F.col("zb")).write.partitionBy("zb").parquet(path)
    write_zonemaps(spark, path, ["v"])
    yield spark, path
    shutil.rmtree(scratch, ignore_errors=True)


class TestZoneMaps:
    def test_harvest_matches_data(self, clustered):
        spark, path = clustered
        zm = spark.read.parquet(os.path.join(path, ZM_DIR))
        rows = {r.file: r for r in zm.collect()}
        assert len(rows) == 10
        for r in rows.values():
            assert r.n_rows == 100
            assert r.is_numeric
            assert int(r.vmax) - int(r.vmin) == 99  # disjoint 100-wide zones

    def test_narrow_range_reads_one_file(self, clustered):
        spark, path = clustered
        rows, n_read, n_total = pruned_read(spark, path, "v", 250, 260)
        assert (n_read, n_total) == (1, 10)
        got = sorted(r.v for r in rows.collect())
        assert got == list(range(250, 261))

    def test_boundary_range_reads_two_files(self, clustered):
        spark, path = clustered
        rows, n_read, n_total = pruned_read(spark, path, "v", 295, 305)
        assert (n_read, n_total) == (2, 10)
        assert rows.count() == 11

    def test_empty_range_reads_zero_files(self, clustered):
        spark, path = clustered
        rows, n_read, _ = pruned_read(spark, path, "v", 5000, 6000)
        assert n_read == 0
        assert rows.count() == 0

    def test_pruned_equals_full_filter(self, clustered):
        spark, path = clustered
        rows, _, _ = pruned_read(spark, path, "v", 123, 777)
        full = (
            spark.read.parquet(path).where(F.col("v").between(123, 777)).count()
        )
        assert rows.count() == full == 655

    def test_random_layout_prunes_nothing(self, spark):
        # v scattered across every file: all zones overlap any range
        scratch = tempfile.mkdtemp(prefix="zm_rand_")
        path = os.path.join(scratch, "t")
        try:
            df = spark.range(0, 1000).select(
                F.col("id").alias("k"), ((F.col("id") * 7919) % 1000).alias("v")
            )
            df.repartition(8).write.parquet(path)
            write_zonemaps(spark, path, ["v"])
            rows, n_read, n_total = pruned_read(spark, path, "v", 100, 110)
            assert n_read == n_total == len(_data_files(path))
            assert rows.count() == 11
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_untracked_column_fails_loudly(self, clustered):
        spark, path = clustered
        with pytest.raises(ValueError, match="tracks"):
            pruned_read(spark, path, "k", 0, 10)

    def test_missing_table_fails_loudly(self, tmp_path):
        # a typo'd path must not silently harvest zero footers (or
        # hand a phantom non-parquet path to spark.read)
        with pytest.raises(FileNotFoundError, match="no table"):
            _data_files(str(tmp_path / "typo"))
