"""Process-level races for the CAS + txlog protocols.

The thread suites in test_lakefs_http.py race Python threads inside
one interpreter — the GIL plus a single client process softens the
interleavings a real multi-writer deployment produces. Here every
writer is a separate OS PROCESS (``subprocess`` running a standalone
script, no fork of the pytest/JVM process), all hammering one
MiniObjectStore HTTP server:

- CAS exclusivity: N processes put_if_absent the same key → exactly
  one winner, the stored bytes are the winner's.
- Dense exclusive commit-log versions: N processes × M appends each
  through CommitLog.try_commit → versions 1..N*M dense, each version
  committed by exactly one process.
- Lease-serialized read-modify-write: N processes × M increments of
  a shared counter under WriterLease → no lost update.

Workers synchronize on a GO object in the store itself (poll until
it exists, then race), so process start-up skew cannot serialize the
contention window.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import textwrap

import pytest
from http.server import ThreadingHTTPServer

from test_lakefs_http import BUCKET, _Store, _make_handler

# Gated (r12): slow integration suite — real multi-process lease/commit races (~60 s).
# Skipped by a plain `pytest tests/` (driver budget); SPARK_GRAFT_SLOW_TESTS=1
# (set by tools/gate.py) runs it.
pytestmark = pytest.mark.slow


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(params=["mini", "moto"])
def endpoint(request, monkeypatch):
    """Two arbiters for the same process-level races: the in-file
    MiniObjectStore-style handler, and moto's ThreadedMotoServer — a
    REAL, independently implemented S3 endpoint (SigV4-signed; the
    creds ride env vars into the worker processes). Skips the moto
    leg when moto is absent."""
    if request.param == "mini":
        store = _Store()
        srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_port}/{BUCKET}"
        srv.shutdown()
        return
    moto_server = pytest.importorskip("moto.server")
    import urllib.request
    import uuid as _uuid

    server = moto_server.ThreadedMotoServer(port=0, verbose=False)
    server.start()
    _, port = server.get_host_and_port()
    bucket = "mp-" + _uuid.uuid4().hex[:10]
    urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{port}/{bucket}", method="PUT"
        )
    )
    monkeypatch.setenv("LAKEFS_TEST_AK", "testing")
    monkeypatch.setenv("LAKEFS_TEST_SK", "testing")
    yield f"http://127.0.0.1:{port}/{bucket}"
    server.stop()


def _mk_fs(endpoint):
    from dbm_nca_ph_etl_spark.sources.lakefs_http import HttpCasLakeFS

    return HttpCasLakeFS(
        endpoint,
        access_key=os.environ.get("LAKEFS_TEST_AK"),
        secret_key=os.environ.get("LAKEFS_TEST_SK"),
    )


def _run_workers(script: str, endpoint: str, n: int, extra_args=()):
    """Launch n copies of ``script`` as separate processes, flip the
    GO object once all are up, and return their parsed JSON stdout."""
    env = {**os.environ, "PYTHONPATH": REPO_ROOT}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, endpoint, str(i), *map(str, extra_args)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(n)
    ]
    _mk_fs(endpoint).write_bytes("/go", b"1")
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed:\n{err}\n{out}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


_PRELUDE = textwrap.dedent(
    """
    import json, os, sys, time
    from dbm_nca_ph_etl_spark.sources.lakefs_http import HttpCasLakeFS
    endpoint, wid = sys.argv[1], sys.argv[2]
    fs = HttpCasLakeFS(
        endpoint,
        access_key=os.environ.get("LAKEFS_TEST_AK"),
        secret_key=os.environ.get("LAKEFS_TEST_SK"),
    )
    deadline = time.monotonic() + 60
    while not fs.exists("/go"):
        if time.monotonic() > deadline:
            raise SystemExit("GO never appeared")
        time.sleep(0.001)
    """
)


class TestProcessLevelCas:
    def test_cas_exclusive_across_processes(self, endpoint):
        script = _PRELUDE + textwrap.dedent(
            """
            won = fs.put_if_absent("/race/winner", wid.encode())
            print(json.dumps({"wid": wid, "won": bool(won)}))
            """
        )
        outs = _run_workers(script, endpoint, n=8)
        winners = [o["wid"] for o in outs if o["won"]]
        assert len(winners) == 1, outs
        assert _mk_fs(endpoint).read_bytes("/race/winner") == winners[0].encode()

    def test_commit_log_versions_dense_and_exclusive(self, endpoint):
        n, m = 4, 8
        script = _PRELUDE + textwrap.dedent(
            """
            from dbm_nca_ph_etl_spark.sinks.txlog import CommitLog
            m = int(sys.argv[3])
            log = CommitLog("/tbl", fs=fs)
            mine = []
            for i in range(m):
                while True:
                    v = log.version()
                    if log.try_commit({"w": wid, "i": i}, v):
                        mine.append(v + 1)
                        break
            print(json.dumps({"wid": wid, "versions": mine}))
            """
        )
        outs = _run_workers(script, endpoint, n=n, extra_args=[m])
        all_versions = [v for o in outs for v in o["versions"]]
        # dense 1..n*m, and no version won by two processes
        assert sorted(all_versions) == list(range(1, n * m + 1)), outs
        # the log's own read-back agrees: every entry present, each
        # recording the single writer that committed it
        from dbm_nca_ph_etl_spark.sinks.txlog import CommitLog

        log = CommitLog("/tbl", fs=_mk_fs(endpoint))
        entries = log.entries()
        assert len(entries) == n * m
        owner = {o["wid"]: set(o["versions"]) for o in outs}
        for e in entries:
            assert e["version"] in owner[e["w"]]

    def test_lease_serialized_counter_no_lost_update(self, endpoint):
        """Read-modify-write on a shared counter is only safe if the
        lease actually excludes across processes: 4 writers × 5
        increments must land on exactly 20."""
        n, m = 4, 5
        script = _PRELUDE + textwrap.dedent(
            """
            from dbm_nca_ph_etl_spark.sinks.txlog import WriterLease
            m = int(sys.argv[3])
            for _ in range(m):
                lease = WriterLease("/ctr", ttl_s=30.0, fs=fs)
                lease.acquire(timeout_s=60.0)
                try:
                    cur = int(fs.read_bytes("/ctr/value")) if fs.exists("/ctr/value") else 0
                    fs.write_bytes("/ctr/value", str(cur + 1).encode())
                    assert lease.is_current()
                finally:
                    lease.release()
            print(json.dumps({"wid": wid, "done": m}))
            """
        )
        outs = _run_workers(script, endpoint, n=n, extra_args=[m])
        assert all(o["done"] == m for o in outs)
        assert int(_mk_fs(endpoint).read_bytes("/ctr/value")) == n * m
