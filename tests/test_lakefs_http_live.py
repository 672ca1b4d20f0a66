"""HttpCasLakeFS against a REAL S3 implementation — not this repo's
in-file test handler (``test_lakefs_http._Store``) and not the
in-memory MiniObjectStore: every request here crosses a real HTTP
socket, SigV4-signed, and is arbitrated by an independently written
S3 server.

Endpoint sources, in priority order:

1. ``SPARK_GRAFT_S3_ENDPOINT`` (plus ``SPARK_GRAFT_S3_BUCKET``,
   ``SPARK_GRAFT_S3_KEY``, ``SPARK_GRAFT_S3_SECRET``, optional
   ``SPARK_GRAFT_S3_REGION``): any live S3-compatible store — MinIO,
   AWS S3 (conditional-PUT support required, GA since 2024-08), R2,
   GCS-XML. Tests write under a unique per-test prefix and
   best-effort clean up after themselves.
2. moto's ``ThreadedMotoServer`` (baked into this container): a
   full, independently implemented S3 server. This is the default
   path, so the suite runs green in CI without any external service.

Skipped only when neither is available.

What this pins that the in-file handler cannot: the adapter's SigV4
canonicalization against a server that actually parses it, real S3
status/XML shapes (403 on anonymous reads, ListObjectsV2 envelopes,
DELETE-of-missing semantics), and the CAS/lease/commit-log protocols
arbitrated by someone else's If-None-Match implementation.
"""

from __future__ import annotations

import os
import threading
import time
import uuid

import pytest

from dbm_nca_ph_etl_spark.sources.lakefs_http import HttpCasLakeFS
from dbm_nca_ph_etl_spark.sinks.txlog import (
    CommitFenced,
    CommitLog,
    WriterLease,
    compact_keyed_serialized,
    upsert_keyed_serialized,
)

# Gated (r12): slow integration suite — live HTTP-store E2E (in-process S3 twin).
# Skipped by a plain `pytest tests/` (driver budget); SPARK_GRAFT_SLOW_TESTS=1
# (set by tools/gate.py) runs it.
pytestmark = pytest.mark.slow



def _external_conf() -> dict | None:
    ep = os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
    if not ep:
        return None
    bucket = os.environ.get("SPARK_GRAFT_S3_BUCKET", "")
    return {
        "endpoint": ep.rstrip("/") + (f"/{bucket}" if bucket else ""),
        "access_key": os.environ.get("SPARK_GRAFT_S3_KEY"),
        "secret_key": os.environ.get("SPARK_GRAFT_S3_SECRET"),
        "region": os.environ.get("SPARK_GRAFT_S3_REGION", "us-east-1"),
        "kind": "external",
    }


@pytest.fixture(scope="module")
def live():
    conf = _external_conf()
    if conf is not None:
        yield conf
        return
    moto_server = pytest.importorskip(
        "moto.server", reason="no SPARK_GRAFT_S3_ENDPOINT and no moto"
    )
    server = moto_server.ThreadedMotoServer(port=0, verbose=False)
    server.start()
    _, port = server.get_host_and_port()
    bucket = "live-" + uuid.uuid4().hex[:10]
    import urllib.request

    urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{port}/{bucket}", method="PUT"
        )
    )
    yield {
        "endpoint": f"http://127.0.0.1:{port}/{bucket}",
        "access_key": "testing",
        "secret_key": "testing",
        "region": "us-east-1",
        "kind": "moto",
    }
    server.stop()


@pytest.fixture()
def fs(live):
    return HttpCasLakeFS(
        live["endpoint"],
        access_key=live["access_key"],
        secret_key=live["secret_key"],
        region=live["region"],
    )


@pytest.fixture()
def pfx(fs):
    """Unique per-test key prefix; best-effort cleanup (matters only
    on external endpoints — the moto server dies with the module)."""
    p = "/t-" + uuid.uuid4().hex[:10]
    yield p
    try:
        fs.delete_dir(p)
    except OSError:
        pass


class TestAdapterAgainstRealS3:
    def test_round_trip_listing_and_delete(self, fs, pfx):
        assert not fs.exists(f"{pfx}/a/b.json")
        fs.write_bytes(f"{pfx}/a/b.json", b"hello")
        assert fs.read_bytes(f"{pfx}/a/b.json") == b"hello"
        assert fs.size(f"{pfx}/a/b.json") == 5
        fs.write_bytes(f"{pfx}/d/s1/x.json", b"1")
        fs.write_bytes(f"{pfx}/d/s2/x.json", b"2")
        assert fs.ls(f"{pfx}/a", suffixes=[".json"]) == [f"{pfx}/a/b.json"]
        assert fs.ls_dirs(f"{pfx}/d") == [f"{pfx}/d/s1", f"{pfx}/d/s2"]
        assert fs.is_dir(f"{pfx}/d") and not fs.is_dir(f"{pfx}/nope")
        fs.delete_file(f"{pfx}/a/b.json")
        assert not fs.exists(f"{pfx}/a/b.json")
        fs.delete_file(f"{pfx}/a/b.json")  # S3: idempotent

    def test_listing_many_keys(self, fs, pfx):
        for i in range(60):
            fs.write_bytes(f"{pfx}/many/k{i:03d}.json", b"x")
        got = fs.ls(f"{pfx}/many", suffixes=[".json"])
        assert len(got) == 60
        assert got == sorted(got)

    def test_cas_exclusive_under_thread_race(self, fs, live, pfx):
        wins = []
        barrier = threading.Barrier(8)

        def racer(i):
            f = HttpCasLakeFS(
                live["endpoint"],
                access_key=live["access_key"],
                secret_key=live["secret_key"],
                region=live["region"],
            )
            barrier.wait()
            if f.put_if_absent(f"{pfx}/cas", str(i).encode()):
                wins.append(i)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1
        assert fs.read_bytes(f"{pfx}/cas") == str(wins[0]).encode()


class TestTxlogAgainstRealS3:
    def test_commit_log_dense_and_exclusive(self, fs, pfx):
        log = CommitLog(f"{pfx}/tbl", fs=fs)
        assert log.version() == 0
        for i in range(5):
            while True:
                v = log.version()
                if log.try_commit({"i": i}, v):
                    break
        assert log.version() == 5
        assert [e["i"] for e in log.entries()] == list(range(5))

    def test_concurrent_commit_writers_no_loss(self, fs, live, pfx):
        n, m = 4, 5
        errs = []

        def writer(w):
            try:
                f = HttpCasLakeFS(
                    live["endpoint"],
                    access_key=live["access_key"],
                    secret_key=live["secret_key"],
                    region=live["region"],
                )
                log = CommitLog(f"{pfx}/tbl", fs=f)
                for i in range(m):
                    while True:
                        v = log.version()
                        if log.try_commit({"w": w, "i": i}, v):
                            break
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        ts = [threading.Thread(target=writer, args=(w,)) for w in range(n)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        log = CommitLog(f"{pfx}/tbl", fs=fs)
        entries = log.entries()
        assert log.version() == n * m
        assert [e["version"] for e in entries] == list(range(1, n * m + 1))
        per_writer = {
            w: [e["i"] for e in entries if e["w"] == w] for w in range(n)
        }
        assert all(v == list(range(m)) for v in per_writer.values())

    def test_lease_steal_and_fencing(self, fs, pfx):
        a = WriterLease(f"{pfx}/tbl", ttl_s=0.05, fs=fs)
        a.acquire(timeout_s=10.0)
        assert a.is_current()
        time.sleep(0.1)  # a's TTL expires
        b = WriterLease(f"{pfx}/tbl", ttl_s=60.0, fs=fs)
        gen_b = b.acquire(timeout_s=10.0)
        assert gen_b == 2
        assert not a.is_current()  # fenced
        assert b.is_current()
        b.release()

    def test_live_lease_blocks(self, fs, pfx):
        a = WriterLease(f"{pfx}/tbl", ttl_s=60.0, fs=fs)
        a.acquire(timeout_s=10.0)
        b = WriterLease(f"{pfx}/tbl", ttl_s=60.0, fs=fs)
        with pytest.raises(TimeoutError):
            b.acquire(timeout_s=0.3)
        a.release()


class TestSparkMergesAgainstRealS3:
    """The Spark keyed merges with lease/log/meta sidecars flowing
    through the live endpoint (parquet stays on local disk — Spark's
    own IO is not behind the seam, same split as test_lakefs_http)."""

    def _mk_table(self, spark, tmp_path, fs):
        from dbm_nca_ph_etl_spark.sinks.keyed import write_keyed

        path = str(tmp_path / f"tbl-{uuid.uuid4().hex[:6]}")
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k long, v string"
        )
        write_keyed(base, path, ["k"], num_buckets=4, fs=fs)
        return path

    def test_two_writers_no_lost_update(self, spark, tmp_path, fs):
        from dbm_nca_ph_etl_spark.sinks.keyed import read_keyed

        path = self._mk_table(spark, tmp_path, fs)
        errs = []

        def write(k, val):
            try:
                df = spark.createDataFrame([(k, val)], "k long, v string")
                upsert_keyed_serialized(
                    spark, df, path, ["k"], writer=f"w{k}",
                    lease_ttl_s=60, timeout_s=120, fs=fs,
                )
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        ts = [
            threading.Thread(target=write, args=(k, f"new{k}"))
            for k in (1, 2, 3)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        got = {r.k: r.v for r in read_keyed(spark, path, fs=fs).collect()}
        for k in (1, 2, 3):
            assert got[k] == f"new{k}"
        log = CommitLog(path, fs=fs)
        assert log.version() == 3

    def test_compactor_beside_writer(self, spark, tmp_path, fs):
        """compact_keyed_serialized and upsert_keyed_serialized
        interleaved on the SAME live-endpoint lease: no upsert is
        rolled back, the log records both ops."""
        from dbm_nca_ph_etl_spark.sinks.keyed import read_keyed

        path = self._mk_table(spark, tmp_path, fs)
        errs = []

        def upserter():
            try:
                for i in range(3):
                    df = spark.createDataFrame(
                        [(100 + i, f"u{i}")], "k long, v string"
                    )
                    upsert_keyed_serialized(
                        spark, df, path, ["k"], writer="ingest",
                        timeout_s=120.0, fs=fs,
                    )
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        def compactor():
            try:
                for _ in range(2):
                    compact_keyed_serialized(
                        spark, path, writer="opt", timeout_s=120.0, fs=fs
                    )
            except CommitFenced:  # pragma: no cover - legal outcome
                pass
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        ts = [
            threading.Thread(target=upserter),
            threading.Thread(target=compactor),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        got = {r.k: r.v for r in read_keyed(spark, path, fs=fs).collect()}
        for i in range(3):
            assert got[100 + i] == f"u{i}", "compaction rolled back an upsert"
        ops = {e["op"] for e in CommitLog(path, fs=fs).entries()}
        assert "upsert" in ops

    def test_clobber_recovery_playbook_converges_live(
        self, spark, tmp_path, fs, monkeypatch
    ):
        """The post-overwrite clobber RECOVERY drill (see
        tests/conftest.clobber_recovery_drill) with every sidecar and
        listing arbitrated by the live endpoint: lease steal, commit
        log, fencing, re-apply, retry — all over real SigV4 HTTP.
        Spark-written parquet stays on local disk (the suite-wide
        split), so ``resync`` mirrors the local tree into the store to
        keep its listings truthful."""
        from conftest import clobber_recovery_drill

        def resync(path):
            for d, _, files in os.walk(path):
                for x in files:
                    p = os.path.join(d, x)
                    with open(p, "rb") as fh:
                        fs.write_bytes(p, fh.read())

        clobber_recovery_drill(
            spark,
            str(tmp_path / "raced"),
            str(tmp_path / "twin"),
            monkeypatch,
            fs=fs,
            resync=resync,
        )
