"""Multi-writer coordination: CAS commit log, TTL writer lease,
serialized keyed merges (sinks/txlog)."""

import json
import threading
import time

import pytest

from dbm_nca_ph_etl_spark.sinks.txlog import (
    CommitFenced,
    CommitLog,
    WriterLease,
    upsert_keyed_serialized,
)


class TestPutIfAbsent:
    def test_posix_cas_is_exclusive_under_thread_race(self, tmp_path):
        from dbm_nca_ph_etl_spark.sources.lakefs import PosixLakeFS

        f = PosixLakeFS()
        target = str(tmp_path / "cas")
        wins = []
        barrier = threading.Barrier(8)

        def racer(i):
            barrier.wait()
            if f.put_if_absent(target, str(i).encode()):
                wins.append(i)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1
        # the winner's bytes are what landed
        assert f.read_bytes(target) == str(wins[0]).encode()


class TestCommitLog:
    def test_versions_are_dense_and_exclusive(self, tmp_path):
        log = CommitLog(str(tmp_path))
        assert log.version() == 0
        assert log.try_commit({"op": "a"}, 0) is True
        # second writer at the same expected version loses
        assert log.try_commit({"op": "b"}, 0) is False
        assert log.try_commit({"op": "b"}, 1) is True
        assert log.version() == 2
        assert [e["op"] for e in log.entries()] == ["a", "b"]
        assert [e["version"] for e in log.entries(since=1)] == [2]

    def test_concurrent_writers_serialize_without_loss(self, tmp_path):
        log = CommitLog(str(tmp_path))
        n_writers, per = 6, 5

        def writer(w):
            for i in range(per):
                while True:
                    v = log.version()
                    if log.try_commit({"w": w, "i": i}, v):
                        break

        ts = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        entries = log.entries()
        assert len(entries) == n_writers * per
        assert [e["version"] for e in entries] == list(
            range(1, n_writers * per + 1)
        )
        # every (writer, i) recorded exactly once
        assert len({(e["w"], e["i"]) for e in entries}) == n_writers * per


class TestWriterLease:
    def test_live_lease_blocks_and_release_unblocks(self, tmp_path):
        a = WriterLease(str(tmp_path), ttl_s=60)
        b = WriterLease(str(tmp_path), ttl_s=60)
        assert a.acquire() == 1
        with pytest.raises(TimeoutError):
            b.acquire(timeout_s=0.3)
        a.release()
        assert b.acquire() == 1  # fresh lease file, generation restarts
        b.release()

    def test_expired_lease_is_stolen_with_higher_generation(self, tmp_path):
        a = WriterLease(str(tmp_path), ttl_s=0.1)
        b = WriterLease(str(tmp_path), ttl_s=0.1)
        assert a.acquire() == 1
        time.sleep(0.25)
        assert b.acquire(timeout_s=2.0) == 2  # stolen, fenced above a
        assert b.is_current() and not a.is_current()

    def test_fencing_detects_loss(self, tmp_path):
        a = WriterLease(str(tmp_path), ttl_s=0.1)
        b = WriterLease(str(tmp_path), ttl_s=60)
        a.acquire()
        assert a.is_current()
        time.sleep(0.25)
        b.acquire(timeout_s=2.0)
        assert not a.is_current()
        a.release()  # must not remove b's lease
        assert b.is_current()
        b.release()


class TestSerializedUpsert:
    def _mk_table(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sinks.keyed import write_keyed

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k long, v string"
        )
        write_keyed(base, path, ["k"], num_buckets=4)
        return path

    def test_two_writers_same_bucket_no_lost_update(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sinks.keyed import read_keyed

        path = self._mk_table(spark, tmp_path)
        errs = []

        def write(k, val):
            try:
                df = spark.createDataFrame([(k, val)], "k long, v string")
                upsert_keyed_serialized(
                    spark, df, path, ["k"], writer=f"w{k}", lease_ttl_s=60,
                    timeout_s=120,
                )
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        # keys chosen to hash into overlapping bucket traffic; the
        # lease serializes the read-merge-overwrite spans
        ts = [
            threading.Thread(target=write, args=(k, f"new{k}"))
            for k in (1, 2, 3, 4, 5)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        got = {r.k: r.v for r in read_keyed(spark, path).collect()}
        for k in (1, 2, 3, 4, 5):
            assert got[k] == f"new{k}"  # every writer's row survived
        assert got[10] == "v10"  # untouched rows intact
        log = CommitLog(path)
        assert log.version() == 5
        assert {e["writer"] for e in log.entries()} == {
            "w1", "w2", "w3", "w4", "w5"
        }

    def test_fenced_commit_raises_and_records_nothing(self, spark, tmp_path, monkeypatch):
        path = self._mk_table(spark, tmp_path)

        # make the merge slower than the TTL and have a thief take
        # the lease mid-merge
        import dbm_nca_ph_etl_spark.sinks.txlog as T

        real_upsert = __import__(
            "dbm_nca_ph_etl_spark.sinks.keyed", fromlist=["upsert_keyed"]
        ).upsert_keyed

        def slow_upsert(spark_, df_, path_, keys_, **kw):
            out = real_upsert(spark_, df_, path_, keys_, **kw)
            thief = WriterLease(path, ttl_s=0.01)
            time.sleep(0.05)
            thief.acquire(timeout_s=2.0)  # steals the expired lease
            return out

        monkeypatch.setattr(
            "dbm_nca_ph_etl_spark.sinks.keyed.upsert_keyed", slow_upsert
        )
        df = spark.createDataFrame([(1, "x")], "k long, v string")
        with pytest.raises(CommitFenced):
            upsert_keyed_serialized(
                spark, df, path, ["k"], writer="stale", lease_ttl_s=0.01
            )
        assert CommitLog(path).version() == 0  # nothing recorded


class TestExpireLog:
    def test_expiry_keeps_version_counter_and_recent_entries(self, tmp_path):
        from dbm_nca_ph_etl_spark.sinks.txlog import expire_log

        log = CommitLog(str(tmp_path))
        for i in range(7):
            assert log.try_commit({"i": i}, i)
        assert expire_log(str(tmp_path), keep=3) == 4
        entries = log.entries()
        assert [e["version"] for e in entries] == [5, 6, 7]
        # version() is MAX-based: expiry never resets the counter
        assert log.version() == 7
        assert log.try_commit({"i": 7}, 7)
        assert log.version() == 8

    def test_keep_larger_than_log_is_noop(self, tmp_path):
        from dbm_nca_ph_etl_spark.sinks.txlog import expire_log

        log = CommitLog(str(tmp_path))
        log.try_commit({"i": 0}, 0)
        assert expire_log(str(tmp_path), keep=10) == 0
        assert log.version() == 1
