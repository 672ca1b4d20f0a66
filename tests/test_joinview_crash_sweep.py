"""Exhaustive crash-point sweep of the join-view commit protocol.

The targeted tests in test_joinview.py cut specific windows (marker
PUT, horizon swap, GC). This sweep is the systematic version: run a
fixed refresh→refresh→compact→refresh scenario, crash at EVERY
mutating filesystem operation in turn (write_bytes / put_if_absent /
delete_file / delete_dir — the full commit-decision surface), replay
the interrupted step to completion, and require the final netted view
to be byte-identical to the never-crashed run. Any window where a
half-applied step leaks state (double-count, lost batch, resurrected
source) fails the equality.

Spark's own data writes are NOT intercepted — a crash between two
parquet task commits is covered by the protocol's coarser guarantee
(uncommitted partitions are invisible until the marker/horizon PUT),
which the sweep exercises by crashing immediately before each PUT.
"""

from __future__ import annotations

import pytest

from dbm_nca_ph_etl_spark.sinks.joinview import MaterializedJoin
from dbm_nca_ph_etl_spark.sources.lakefs import PosixLakeFS

# Gated (r12): slow integration suite — exhaustive crash-point sweep (~210 s).
# Skipped by a plain `pytest tests/` (driver budget); SPARK_GRAFT_SLOW_TESTS=1
# (set by tools/gate.py) runs it.
pytestmark = pytest.mark.slow



class _CountingCrashFS:
    """Disk-backed object-store-semantics fake that raises at the
    n-th mutating call, once."""

    atomic_rename = False

    def __init__(self):
        self._inner = PosixLakeFS()
        self.mutations = 0
        self.crash_at: int | None = None

    def _tick(self):
        self.mutations += 1
        if self.crash_at is not None and self.mutations == self.crash_at:
            self.crash_at = None
            raise RuntimeError(f"injected crash at mutation {self.mutations}")

    # mutating ops ----------------------------------------------------
    def write_bytes(self, path, data):
        self._tick()
        with open(path, "wb") as fh:  # single PUT
            fh.write(data)

    def put_if_absent(self, path, data):
        self._tick()
        return self._inner.put_if_absent(path, data)

    def delete_file(self, path):
        self._tick()
        self._inner.delete_file(path)

    def delete_dir(self, path):
        self._tick()
        self._inner.delete_dir(path)

    # read-only ops ---------------------------------------------------
    def ls(self, path, suffixes=None):
        return self._inner.ls(path, suffixes)

    def is_dir(self, path):
        return self._inner.is_dir(path)

    def read_bytes(self, path):
        return self._inner.read_bytes(path)

    def exists(self, path):
        return self._inner.exists(path)

    def size(self, path):
        return self._inner.size(path)

    def mkdirs(self, path):
        self._inner.mkdirs(path)

    def ls_dirs(self, path):
        return self._inner.ls_dirs(path)


def _scenario(spark, root: str, fs) -> list[tuple]:
    """refresh L → refresh R (join) → CDC retraction → compact →
    post-compact refresh; returns the sorted view rows. Each step is
    retried once on injected crash (the at-least-once redelivery)."""
    def _retry(fn):
        try:
            return fn()
        except RuntimeError as e:
            if "injected crash" not in str(e):
                raise
            return fn()  # the replay the redelivery contract promises

    # the constructor itself PUTs (commits dir, sentinel, meta) — a
    # process that dies there simply reopens the table. Short lease
    # TTL: a holder that "died" mid-step must expire quickly so the
    # replay can steal (production sizes this to the merge duration).
    v = _retry(
        lambda: MaterializedJoin(
            spark, root, ["k"], num_buckets=2, fs=fs,
            lease_ttl_s=0.3, lease_timeout_s=20.0,
        )
    )

    def L(rows, ddl="k long, o string"):
        return spark.createDataFrame(rows, ddl)

    def R(rows, ddl="k long, c string"):
        return spark.createDataFrame(rows, ddl)

    steps = [
        lambda: v.refresh(0, left_delta=L([(1, "o1"), (2, "o2")])),
        lambda: v.refresh(1, right_delta=R([(1, "c1"), (2, "c2")])),
        lambda: v.refresh(
            2,
            left_delta=L([(2, "o2", -1), (2, "o2x", 1)], "k long, o string, w int"),
            sign_col="w",
        ),
        lambda: v.compact(2),
        lambda: v.refresh(4, left_delta=L([(1, "o1b")])),
    ]
    for step in steps:
        _retry(step)
    return sorted((r.k, r.o, r.c) for r in v.read_view().collect())


@pytest.mark.slow
def test_crash_at_every_mutation_converges(spark, tmp_path):
    # reference run: no crashes; also counts the mutation surface
    ref_fs = _CountingCrashFS()
    want = _scenario(spark, str(tmp_path / "ref"), ref_fs)
    assert want == [
        (1, "o1", "c1"),
        (1, "o1b", "c1"),
        (2, "o2x", "c2"),
    ]
    n_ops = ref_fs.mutations
    assert n_ops > 5  # the protocol surface actually exercised

    for crash_at in range(1, n_ops + 1):
        fs = _CountingCrashFS()
        fs.crash_at = crash_at
        got = _scenario(spark, str(tmp_path / f"c{crash_at}"), fs)
        assert got == want, (
            f"crash at mutation {crash_at}/{n_ops} diverged: {got} != {want}"
        )


class _CrashHttpFS:
    """Crash-injecting wrapper around the HTTP CAS adapter: raises
    BEFORE issuing the n-th mutating HTTP call (the request never
    reaches the store — a process death, not a torn write; torn
    writes can't happen on single-PUT object semantics)."""

    atomic_rename = False
    atomic_cas = True

    def __init__(self, inner):
        self._inner = inner
        self.mutations = 0
        self.crash_at: int | None = None

    def _tick(self):
        self.mutations += 1
        if self.crash_at is not None and self.mutations == self.crash_at:
            self.crash_at = None
            raise RuntimeError(f"injected crash at mutation {self.mutations}")

    def write_bytes(self, path, data):
        self._tick()
        self._inner.write_bytes(path, data)

    def put_if_absent(self, path, data):
        self._tick()
        return self._inner.put_if_absent(path, data)

    def delete_file(self, path):
        self._tick()
        self._inner.delete_file(path)

    def delete_dir(self, path):
        self._tick()
        self._inner.delete_dir(path)

    def __getattr__(self, name):  # read-only ops delegate untouched
        return getattr(self._inner, name)


@pytest.mark.slow
def test_http_cas_strided_crash_sweep(spark, tmp_path):
    """The joinview protocol on a store with REAL conditional-PUT
    semantics (server-arbitrated If-None-Match over HTTP, disk-backed
    so Spark and the seam see the same files). Full-density crashing
    is covered by the Posix-semantics sweep above; here the reference
    run plus a stride-5 sweep pins that the protocol's commit
    decisions behave identically when the CAS is the store's."""
    import threading
    from http.server import ThreadingHTTPServer

    import test_lakefs_http as TLH
    from dbm_nca_ph_etl_spark.sources.lakefs_http import HttpCasLakeFS

    store = TLH._Store(root=str(tmp_path))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), TLH._make_handler(store))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = HttpCasLakeFS(
            f"http://127.0.0.1:{srv.server_port}/{TLH.BUCKET}"
        )
        ref = _CrashHttpFS(base)
        want = _scenario(spark, str(tmp_path / "ref"), ref)
        assert want == [
            (1, "o1", "c1"),
            (1, "o1b", "c1"),
            (2, "o2x", "c2"),
        ]
        n_ops = ref.mutations
        assert n_ops > 5
        for crash_at in range(1, n_ops + 1, 5):
            fs = _CrashHttpFS(base)
            fs.crash_at = crash_at
            got = _scenario(spark, str(tmp_path / f"h{crash_at}"), fs)
            assert got == want, (
                f"http crash at mutation {crash_at}/{n_ops} diverged: "
                f"{got} != {want}"
            )
    finally:
        srv.shutdown()
