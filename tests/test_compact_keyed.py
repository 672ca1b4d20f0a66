"""compact_keyed — OPTIMIZE for the keyed layout: file counts drop
to the target, content is bit-identical (digest-equal), untouched
buckets' files are not rewritten, and a second pass is a no-op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.integrity import diff_digest, keyed_digest
from dbm_nca_ph_etl_spark.sinks.keyed import (
    KB_COL,
    _write_meta,
    compact_keyed,
    key_bucket,
    read_keyed,
    upsert_keyed,
    write_keyed,
)

N_BUCKETS = 4
CANON = lambda: [F.col("k").cast("string"), F.col("v")]  # noqa: E731


def _files_per_bucket(path: str) -> dict[int, int]:
    out = {}
    for d in os.listdir(path):
        if d.startswith(f"{KB_COL}="):
            b = int(d.split("=", 1)[1])
            out[b] = len(
                [x for x in os.listdir(os.path.join(path, d)) if x.endswith(".parquet")]
            )
    return out


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A keyed table whose every bucket holds SEVERAL parquet files —
    written directly with a non-bucket-aligned repartition (the state
    a wide-parallelism merge or many streamed epochs leaves)."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k long, v string"
    ).withColumn(KB_COL, key_bucket(["k"], N_BUCKETS))
    df.repartition(8).write.mode("overwrite").partitionBy(KB_COL).parquet(path)
    _write_meta(
        path,
        {"keys": ["k"], "num_buckets": N_BUCKETS, "schema": "k BIGINT,v STRING"},
    )
    assert max(_files_per_bucket(path).values()) > 1, "fixture not fragmented"
    return path


class TestCompactKeyed:
    def test_compacts_to_one_file_content_identical(self, spark, fragmented):
        before = keyed_digest(spark, fragmented, CANON()).localCheckpoint(
            eager=True
        )
        rows_before = sorted(
            tuple(r) for r in read_keyed(spark, fragmented).collect()
        )
        done = compact_keyed(spark, fragmented)
        assert sorted(done) == sorted(_files_per_bucket(fragmented))
        assert all(n == 1 for n in _files_per_bucket(fragmented).values())
        after = keyed_digest(spark, fragmented, CANON())
        assert diff_digest(before, after).count() == 0
        assert (
            sorted(tuple(r) for r in read_keyed(spark, fragmented).collect())
            == rows_before
        )

    def test_second_pass_is_noop(self, spark, fragmented):
        assert compact_keyed(spark, fragmented)
        assert compact_keyed(spark, fragmented) == []

    def test_bucket_subset_leaves_others_untouched(self, spark, fragmented):
        all_buckets = sorted(_files_per_bucket(fragmented))
        target, rest = all_buckets[:1], all_buckets[1:]
        listing_before = {
            b: sorted(
                os.listdir(os.path.join(fragmented, f"{KB_COL}={b}"))
            )
            for b in rest
        }
        done = compact_keyed(spark, fragmented, buckets=target)
        assert done == target
        fpb = _files_per_bucket(fragmented)
        assert fpb[target[0]] == 1
        for b in rest:
            assert (
                sorted(os.listdir(os.path.join(fragmented, f"{KB_COL}={b}")))
                == listing_before[b]
            ), "compaction rewrote an unselected bucket"
            assert fpb[b] > 1

    def test_upsert_then_compact_in_its_wake(self, spark, fragmented):
        batch = spark.createDataFrame(
            [(3, "NEW3"), (777, "v777")], "k long, v string"
        )
        touched = upsert_keyed(spark, batch, fragmented, ["k"])
        assert touched
        # compact exactly the merge's wake; content must include the
        # merge's effect and survive compaction unchanged
        before = keyed_digest(spark, fragmented, CANON()).localCheckpoint(
            eager=True
        )
        compact_keyed(spark, fragmented, buckets=touched)
        after = keyed_digest(spark, fragmented, CANON())
        assert diff_digest(before, after).count() == 0
        got = {r.k: r.v for r in read_keyed(spark, fragmented).collect()}
        assert got[3] == "NEW3" and got[777] == "v777"

    def test_missing_meta_is_noop(self, spark, tmp_path):
        assert compact_keyed(spark, str(tmp_path / "nope")) == []

    def test_serialized_compaction_logs_and_preserves_content(
        self, spark, fragmented
    ):
        from dbm_nca_ph_etl_spark.sinks.txlog import (
            CommitLog,
            compact_keyed_serialized,
        )

        before = keyed_digest(spark, fragmented, CANON()).localCheckpoint(
            eager=True
        )
        done = compact_keyed_serialized(spark, fragmented, writer="opt")
        assert done
        after = keyed_digest(spark, fragmented, CANON())
        assert diff_digest(before, after).count() == 0
        entries = CommitLog(fragmented).entries()
        assert [
            (e["op"], e["writer"], e["buckets"]) for e in entries
        ] == [("compact", "opt", done)]
        # a no-op second pass takes the lease but logs nothing
        assert compact_keyed_serialized(spark, fragmented, writer="opt") == []
        assert len(CommitLog(fragmented).entries()) == 1

    def test_concurrent_upserts_survive_compactions(self, spark, fragmented):
        """A maintenance compactor beside a writer, both serialized on
        the lease: every upserted key must survive — the lost-update
        interleaving (compactor reads, writer merges, compactor
        overwrites with stale content) is exactly what the lease
        forbids."""
        import threading

        from dbm_nca_ph_etl_spark.sinks.txlog import (
            compact_keyed_serialized,
            upsert_keyed_serialized,
        )

        errors = []

        def upserter():
            try:
                for i in range(5):
                    batch = spark.createDataFrame(
                        [(1000 + i, f"u{i}")], "k long, v string"
                    )
                    upsert_keyed_serialized(
                        spark, batch, fragmented, ["k"], writer="ingest",
                        timeout_s=120.0,
                    )
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        def compactor():
            try:
                for _ in range(3):
                    compact_keyed_serialized(
                        spark, fragmented, writer="opt", timeout_s=120.0
                    )
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        ts = [
            threading.Thread(target=upserter),
            threading.Thread(target=compactor),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errors, errors
        got = {r.k: r.v for r in read_keyed(spark, fragmented).collect()}
        for i in range(5):
            assert got[1000 + i] == f"u{i}", "compaction rolled back an upsert"

    def test_streamed_epochs_then_compact_keeps_digest_baseline(
        self, spark, tmp_path
    ):
        """The full maintenance cycle: stream epochs into the keyed
        table, incrementally refresh the digest from the commit log's
        touched buckets, compact in their wake — the refreshed digest
        must STILL equal a full re-digest (compaction is content-free,
        so it never invalidates a baseline)."""
        from dbm_nca_ph_etl_spark.operators.integrity import refresh_digest
        from dbm_nca_ph_etl_spark.sinks.txlog import CommitLog
        from dbm_nca_ph_etl_spark.streaming.agg_stream import stream_into_keyed

        src = str(tmp_path / "src")
        os.makedirs(src)
        path = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "ckpt")
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], "k long, v string"
        )
        write_keyed(base, path, ["k"], num_buckets=N_BUCKETS)
        stored = keyed_digest(spark, path, CANON()).localCheckpoint(eager=True)

        spark.createDataFrame(
            [(3, "E3"), (99, "v99")], "k long, v string"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("k long, v string").parquet(src)
        stream_into_keyed(stream, path, ["k"], ckpt, writer="ingest")

        touched = sorted(
            {
                b
                for e in CommitLog(path).entries()
                if e.get("op") == "upsert"
                for b in e["buckets"]
            }
        )
        partial = keyed_digest(spark, path, CANON(), buckets=touched)
        refreshed = refresh_digest(stored, partial, touched).localCheckpoint(
            eager=True
        )
        compact_keyed(spark, path, buckets=touched)
        full_after_compact = keyed_digest(spark, path, CANON())
        assert diff_digest(refreshed, full_after_compact).count() == 0
