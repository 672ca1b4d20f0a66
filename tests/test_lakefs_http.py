"""HttpCasLakeFS — the true conditional-PUT object-store adapter —
against an in-process S3-dialect HTTP store whose CAS is arbitrated
SERVER-side (semantics deliberately distinct from POSIX O_EXCL: no
rename, no directories, list-by-prefix, 412 on conditional-PUT
loss). The txlog multi-writer suite (lease, commit log, serialized
keyed upsert under Spark) runs here on the new adapter, closing the
"exactly-once is best-effort off POSIX" caveat."""

from __future__ import annotations

import threading
import time
import urllib.parse
import xml.sax.saxutils as sx
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


def _md5(data: bytes) -> str:
    import hashlib

    return hashlib.md5(data).hexdigest()

from dbm_nca_ph_etl_spark.sinks.txlog import (
    CommitFenced,
    CommitLog,
    WriterLease,
    upsert_keyed_serialized,
)
from dbm_nca_ph_etl_spark.sources.lakefs_http import HttpCasLakeFS

BUCKET = "testbucket"


class _Store:
    """Server state, one lock = the arbitration point. Two backends:
    in-memory dict (default — sidecar-only protocols like txlog/
    matview, where Spark never needs to see the store's objects) and
    DISK-backed (``root=<dir>``: keys are absolute paths under root,
    objects are real files — for protocols like joinview that list
    Spark-written data directories through the seam)."""

    def __init__(self, root: str | None = None):
        self.objects: dict[str, bytes] = {}
        self.root = root.rstrip("/") if root else None
        self.lock = threading.Lock()
        # keys that should fail their FIRST conditional PUT with 409
        # (ConditionalRequestConflict) to exercise the retry path
        self.conflict_once: set[str] = set()
        # keys whose FIRST conditional PUT is APPLIED (or arbitrated)
        # server-side but whose response is dropped (connection cut
        # before the status line) — the dropped-response ambiguity
        # put_if_absent must disambiguate via ETag
        self.drop_response_once: set[str] = set()

    # storage backend (caller holds self.lock) -----------------------
    def _fp(self, key: str) -> str:
        import os

        p = "/" + key
        assert self.root and p.startswith(self.root + "/"), (key, self.root)
        return p

    def get(self, key):
        if self.root is None:
            return self.objects.get(key)
        import os

        p = self._fp(key)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as fh:
            return fh.read()

    def put(self, key, data):
        if self.root is None:
            self.objects[key] = data
            return
        import os

        p = self._fp(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:  # server-side single write
            fh.write(data)

    def has(self, key):
        if self.root is None:
            return key in self.objects
        import os

        return os.path.isfile(self._fp(key))

    def pop(self, key):
        if self.root is None:
            return self.objects.pop(key, None) is not None
        import os

        p = self._fp(key)
        if not os.path.isfile(p):
            return False
        os.remove(p)
        return True

    def keys_with_prefix(self, prefix):
        if self.root is None:
            return sorted(k for k in self.objects if k.startswith(prefix))
        import os

        p = "/" + prefix
        start = p if os.path.isdir(p) else os.path.dirname(p)
        out = []
        for d, _, files in os.walk(start):
            for f in files:
                full = os.path.join(d, f)
                if full.startswith(p):
                    out.append(full.lstrip("/"))
        return sorted(out)


def _make_handler(store: _Store):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence
            pass

        def _key(self):
            path = urllib.parse.urlsplit(self.path).path
            parts = path.lstrip("/").split("/", 1)
            assert parts[0] == BUCKET, f"unknown bucket in {path}"
            return urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""

        def _reply(self, status, body=b"", headers=()):
            self.send_response(status)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        def _drop(self):
            # dropped response: the server DID arbitrate/apply, the
            # client never hears — it sees RemoteDisconnected
            self.close_connection = True
            self.connection.close()

        def do_PUT(self):
            key = self._key()
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            cond = self.headers.get("If-None-Match") == "*"
            with store.lock:
                if cond and key in store.conflict_once:
                    store.conflict_once.discard(key)
                    self._reply(409)
                    return
                drop = cond and key in store.drop_response_once
                if drop:
                    store.drop_response_once.discard(key)
                if cond and store.has(key):
                    if drop:
                        self._drop()
                        return
                    self._reply(412)
                    return
                store.put(key, data)
                if drop:
                    self._drop()
                    return
            self._reply(200, headers=[("ETag", f'"{_md5(data)}"')])

        def finish(self):
            try:
                super().finish()
            except (OSError, ValueError):
                pass  # connection deliberately cut by _drop

        def do_GET(self):
            q = urllib.parse.parse_qs(urllib.parse.urlsplit(self.path).query)
            if q.get("list-type") == ["2"]:
                self._list(q)
                return
            key = self._key()
            with store.lock:
                body = store.get(key)
            if body is None:
                self._reply(404)
            else:
                self._reply(200, body)

        def do_HEAD(self):
            key = self._key()
            with store.lock:
                body = store.get(key)
            if body is None:
                self._reply(404)
            else:
                # real object length, no body (HEAD semantics);
                # non-multipart S3 ETag = quoted md5 of the content
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("ETag", f'"{_md5(body)}"')
                self.end_headers()

        def do_DELETE(self):
            key = self._key()
            with store.lock:
                existed = store.pop(key)
            self._reply(204 if existed else 404)

        def _list(self, q):
            prefix = q.get("prefix", [""])[0]
            delim = q.get("delimiter", [None])[0]
            with store.lock:
                keys = store.keys_with_prefix(prefix)
            contents, prefixes = [], []
            seen = set()
            for k in keys:
                rest = k[len(prefix):]
                if delim and delim in rest:
                    p = prefix + rest.split(delim, 1)[0] + delim
                    if p not in seen:
                        seen.add(p)
                        prefixes.append(p)
                else:
                    contents.append(k)
            xml = ['<?xml version="1.0"?>']
            xml.append(
                '<ListBucketResult '
                'xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
            )
            xml.append("<IsTruncated>false</IsTruncated>")
            for k in contents:
                with store.lock:
                    sz = len(store.get(k) or b"")
                xml.append(
                    f"<Contents><Key>{sx.escape(k)}</Key>"
                    f"<Size>{sz}</Size></Contents>"
                )
            for p in prefixes:
                xml.append(
                    f"<CommonPrefixes><Prefix>{sx.escape(p)}</Prefix>"
                    "</CommonPrefixes>"
                )
            xml.append("</ListBucketResult>")
            self._reply(200, "".join(xml).encode())

    return Handler


@pytest.fixture(scope="module")
def store_and_fs():
    store = _Store()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    fs = HttpCasLakeFS(f"http://127.0.0.1:{srv.server_port}/{BUCKET}")
    yield store, fs
    srv.shutdown()


@pytest.fixture()
def fs(store_and_fs):
    store, fs = store_and_fs
    store.objects.clear()
    store.conflict_once.clear()
    store.drop_response_once.clear()
    return fs


@pytest.fixture()
def store(store_and_fs):
    return store_and_fs[0]


class TestAdapterBasics:
    def test_round_trip_exists_size_delete(self, fs):
        assert not fs.exists("/t/a.json")
        fs.write_bytes("/t/a.json", b"hello")
        assert fs.exists("/t/a.json")
        assert fs.size("/t/a.json") == 5
        assert fs.read_bytes("/t/a.json") == b"hello"
        fs.write_bytes("/t/a.json", b"overwrite")  # unconditional PUT
        assert fs.read_bytes("/t/a.json") == b"overwrite"
        fs.delete_file("/t/a.json")
        assert not fs.exists("/t/a.json")
        fs.delete_file("/t/a.json")  # idempotent on absent
        with pytest.raises(FileNotFoundError):
            fs.read_bytes("/t/a.json")

    def test_ls_prefix_semantics(self, fs):
        fs.write_bytes("/t/_log/00000001.json", b"{}")
        fs.write_bytes("/t/_log/00000002.json", b"{}")
        fs.write_bytes("/t/_log/readme.txt", b"x")
        fs.write_bytes("/t/_log/deep/ignored.json", b"{}")
        got = fs.ls("/t/_log", suffixes=[".json"])
        assert got == ["/t/_log/00000001.json", "/t/_log/00000002.json"]
        # a single "file" path lists itself, honoring the filter
        assert fs.ls("/t/_log/readme.txt") == ["/t/_log/readme.txt"]
        assert fs.ls("/t/_log/readme.txt", suffixes=[".json"]) == []
        assert fs.ls("/t/nope") == []

    def test_ls_with_sizes_spends_no_heads(self, fs):
        """ListObjectsV2 already carries <Size>: a sized listing must
        not degrade into an N+1 HEAD per file (what a whole-table
        compaction pass would pay on compact_keyed's candidate
        loop)."""
        fs.write_bytes("/t/szd/a.parquet", b"x" * 7)
        fs.write_bytes("/t/szd/b.parquet", b"y" * 11)
        fs.write_bytes("/t/szd/readme.txt", b"z")
        orig, heads = fs._request, []

        def spy(method, key, **kw):
            if method == "HEAD":
                heads.append(key)
            return orig(method, key, **kw)

        fs._request = spy
        try:
            got = fs.ls_with_sizes("/t/szd", suffixes=[".parquet"])
        finally:
            del fs._request  # unshadow the class method
        assert got == [("/t/szd/a.parquet", 7), ("/t/szd/b.parquet", 11)]
        # at most the one single-"file"-path probe — never one per file
        assert len(heads) <= 1

    def test_dirs_are_prefixes(self, fs):
        assert not fs.is_dir("/t/v")
        fs.mkdirs("/t/v")  # no-op: still not a "dir" until an object lands
        assert not fs.is_dir("/t/v")
        fs.write_bytes("/t/v/_v-1/part.parquet", b"p")
        fs.write_bytes("/t/v/_v-2/part.parquet", b"p")
        assert fs.is_dir("/t/v")
        assert fs.ls_dirs("/t/v") == ["/t/v/_v-1", "/t/v/_v-2"]
        fs.delete_dir("/t/v/_v-1")
        assert fs.ls_dirs("/t/v") == ["/t/v/_v-2"]

    def test_cas_exclusive_under_thread_race(self, fs):
        wins = []
        barrier = threading.Barrier(8)

        def racer(i):
            barrier.wait()
            if fs.put_if_absent("/t/cas", str(i).encode()):
                wins.append(i)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1
        assert fs.read_bytes("/t/cas") == str(wins[0]).encode()

    def test_cas_conflict_409_is_retried(self, fs, store):
        store.conflict_once.add("t/cas409")
        assert fs.put_if_absent("/t/cas409", b"x") is True  # retried past 409
        assert fs.put_if_absent("/t/cas409", b"y") is False
        assert fs.read_bytes("/t/cas409") == b"x"

    def test_dropped_response_self_win_reclassified(self, fs, store):
        """The conditional PUT is APPLIED server-side but its response
        is dropped; the internal retry sees 412 (the key now exists)
        and must reclassify via ETag: the bytes are ours → win."""
        store.drop_response_once.add("t/casdrop")
        assert fs.put_if_absent("/t/casdrop", b"mine") is True
        assert fs.read_bytes("/t/casdrop") == b"mine"
        # and a later real loser still loses cleanly
        assert fs.put_if_absent("/t/casdrop", b"other") is False

    def test_dropped_response_on_true_loss_stays_loss(self, fs, store):
        """The key already holds ANOTHER writer's bytes; our first
        conditional PUT's 412 response is dropped. The retry's 412 is
        ambiguous, the ETag differs from md5(our data) → loss."""
        assert fs.put_if_absent("/t/caslost", b"theirs") is True
        store.drop_response_once.add("t/caslost")
        assert fs.put_if_absent("/t/caslost", b"mine") is False
        assert fs.read_bytes("/t/caslost") == b"theirs"

    def test_clean_412_never_heads(self, fs, store):
        """An unambiguous loss (no transport error in the call) must
        not spend a HEAD round trip on ETag reclassification — even
        when the stored bytes happen to EQUAL ours (idempotent-looking
        payloads must still report 'someone else created it')."""
        assert fs.put_if_absent("/t/cassame", b"same") is True
        orig = fs._etag
        fs._etag = lambda key: (_ for _ in ()).throw(
            AssertionError("ETag probe on a clean 412")
        )
        try:
            assert fs.put_if_absent("/t/cassame", b"same") is False
        finally:
            fs._etag = orig

    def test_atomicity_flags(self, fs):
        assert fs.atomic_cas is True
        assert fs.atomic_rename is False


class TestTxlogOnHttpCas:
    """The multi-writer protocol suite on a store whose CAS is real."""

    def test_commit_log_dense_and_exclusive(self, fs):
        log = CommitLog("/tbl", fs=fs)
        assert log.version() == 0
        assert log.try_commit({"op": "a"}, 0) is True
        assert log.try_commit({"op": "b"}, 0) is False
        assert log.try_commit({"op": "b"}, 1) is True
        assert [e["op"] for e in log.entries()] == ["a", "b"]

    def test_concurrent_commit_writers_no_loss(self, fs):
        log = CommitLog("/tbl", fs=fs)
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
        assert {(e["w"], e["i"]) for e in entries} == {
            (w, i) for w in range(n_writers) for i in range(per)
        }

    def test_lease_steal_and_fencing(self, fs):
        a = WriterLease("/tbl2", ttl_s=0.05, fs=fs)
        gen_a = a.acquire(timeout_s=2)
        assert a.is_current()
        time.sleep(0.1)  # expire
        b = WriterLease("/tbl2", ttl_s=60, fs=fs)
        gen_b = b.acquire(timeout_s=2)
        assert gen_b == gen_a + 1
        assert b.is_current() and not a.is_current()  # a is fenced
        b.release()

    def test_live_lease_blocks(self, fs):
        a = WriterLease("/tbl3", ttl_s=60, fs=fs)
        a.acquire(timeout_s=2)
        b = WriterLease("/tbl3", ttl_s=60, fs=fs)
        with pytest.raises(TimeoutError):
            b.acquire(timeout_s=0.3)
        a.release()
        b.acquire(timeout_s=2)
        b.release()


class TestSerializedUpsertOnHttpCas:
    """The Spark two-writer keyed merge with lease/log/meta sidecars
    flowing through the HTTP CAS adapter (parquet stays on local disk
    — Spark's own IO is not behind the seam, same split as production
    where executors write the lake directly)."""

    def _mk_table(self, spark, tmp_path, fs):
        from dbm_nca_ph_etl_spark.sinks.keyed import write_keyed

        path = str(tmp_path / "tbl")
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
            for k in (1, 2, 3, 4, 5)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        got = {r.k: r.v for r in read_keyed(spark, path, fs=fs).collect()}
        for k in (1, 2, 3, 4, 5):
            assert got[k] == f"new{k}"
        assert got[10] == "v10"
        log = CommitLog(path, fs=fs)
        assert log.version() == 5
        assert {e["writer"] for e in log.entries()} == {
            "w1", "w2", "w3", "w4", "w5"
        }

    def test_fenced_commit_records_nothing(self, spark, tmp_path, fs, monkeypatch):
        path = self._mk_table(spark, tmp_path, fs)
        real_upsert = __import__(
            "dbm_nca_ph_etl_spark.sinks.keyed", fromlist=["upsert_keyed"]
        ).upsert_keyed

        def slow_upsert(spark_, df_, path_, keys_, **kw):
            out = real_upsert(spark_, df_, path_, keys_, **kw)
            thief = WriterLease(path, ttl_s=0.01, fs=fs)
            time.sleep(0.05)
            thief.acquire(timeout_s=2.0)
            return out

        monkeypatch.setattr(
            "dbm_nca_ph_etl_spark.sinks.keyed.upsert_keyed", slow_upsert
        )
        df = spark.createDataFrame([(1, "x")], "k long, v string")
        with pytest.raises(CommitFenced):
            upsert_keyed_serialized(
                spark, df, path, ["k"], writer="stale", lease_ttl_s=0.01, fs=fs
            )
        assert CommitLog(path, fs=fs).version() == 0


class TestSigV4:
    """The signing path: a verifying server accepts a correctly
    signed request and rejects a wrong secret. The verifier
    recomputes the signature from the canonical request per the
    public SigV4 spec — written independently of the adapter's
    signer (same spec, separate code) so format drift fails."""

    AK, SK = "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

    def _verify(self, handler, store):
        import hashlib
        import hmac as hm

        auth = handler.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return False
        fields = dict(
            kv.strip().split("=", 1) for kv in auth[17:].split(",")
        )
        cred = fields["Credential"].split("/")
        if cred[0] != self.AK:
            return False
        scope_date, region, svc = cred[1], cred[2], cred[3]
        signed = fields["SignedHeaders"].split(";")
        u = urllib.parse.urlsplit(handler.path)
        canon_q = "&".join(
            f"{urllib.parse.quote(k, safe='')}={urllib.parse.quote(v[0], safe='')}"
            for k, v in sorted(urllib.parse.parse_qs(u.query, keep_blank_values=True).items())
        )
        canon_h = "".join(
            f"{h}:{handler.headers.get(h, '').strip()}\n" for h in signed
        )
        payload_hash = handler.headers.get("x-amz-content-sha256", "")
        creq = "\n".join(
            [handler.command, u.path, canon_q, canon_h,
             ";".join(signed), payload_hash]
        )
        amz_date = handler.headers.get("x-amz-date", "")
        scope = f"{scope_date}/{region}/{svc}/aws4_request"
        to_sign = "\n".join(
            ["AWS4-HMAC-SHA256", amz_date, scope,
             hashlib.sha256(creq.encode()).hexdigest()]
        )
        k = f"AWS4{self.SK}".encode()
        for part in (scope_date, region, svc, "aws4_request"):
            k = hm.new(k, part.encode(), hashlib.sha256).digest()
        want = hm.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
        return hm.compare_digest(want, fields["Signature"])

    @pytest.fixture()
    def signed_server(self):
        test = self
        store = _Store()
        base = _make_handler(store)

        class Verifying(base):
            def _authz(self):
                if not test._verify(self, store):
                    self._reply(403)
                    return False
                return True

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                if not test._verify(self, store):
                    self.rfile.read(n)
                    self._reply(403)
                    return
                base.do_PUT(self)

            def do_GET(self):
                if self._authz():
                    base.do_GET(self)

            def do_HEAD(self):
                if self._authz():
                    base.do_HEAD(self)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Verifying)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.shutdown()

    def test_signed_requests_accepted(self, signed_server):
        fs = HttpCasLakeFS(
            f"http://127.0.0.1:{signed_server.server_port}/{BUCKET}",
            access_key=self.AK, secret_key=self.SK,
        )
        fs.write_bytes("/s/x.json", b"payload")
        assert fs.read_bytes("/s/x.json") == b"payload"
        assert fs.put_if_absent("/s/x.json", b"z") is False
        assert fs.ls("/s", suffixes=[".json"]) == ["/s/x.json"]

    def test_wrong_secret_rejected(self, signed_server):
        fs = HttpCasLakeFS(
            f"http://127.0.0.1:{signed_server.server_port}/{BUCKET}",
            access_key=self.AK, secret_key="not-the-secret",
        )
        with pytest.raises(OSError):
            fs.write_bytes("/s/y.json", b"payload")


class TestMatviewRaceOnHttpCas:
    """The matview two-writer refresh race on a store whose lease CAS
    is genuinely atomic (server-arbitrated If-None-Match) — the
    marker-commit protocol's exactly-once claim exercised on real
    conditional-PUT semantics rather than POSIX O_EXCL."""

    def _mk(self, spark, path, fs):
        from dbm_nca_ph_etl_spark.sinks.matview import MaterializedAgg, Measure

        return MaterializedAgg(
            spark,
            path,
            keys=["k"],
            measures=[Measure("n", "v", "count"), Measure("s", "v", "sum")],
            fs=fs,
        )

    def test_two_refreshers_no_shadowed_version(self, spark, tmp_path, fs):
        path = str(tmp_path / "mv")
        batches = {f"b{i}": [("a", i), ("b", 2 * i)] for i in range(6)}
        errs: list[Exception] = []
        applied: list[str] = []

        def worker(ids):
            mv = self._mk(spark, path, fs)  # own lease identity
            for bid in ids:
                df = spark.createDataFrame(batches[bid], "k string, v long")
                try:
                    if mv.refresh(df, bid):
                        applied.append(bid)
                except Exception as e:  # noqa: BLE001 — surfaced below
                    errs.append(e)

        ts = [
            threading.Thread(target=worker, args=(["b0", "b1", "b2"],)),
            threading.Thread(target=worker, args=(["b3", "b4", "b5"],)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        assert sorted(applied) == [f"b{i}" for i in range(6)]
        mv = self._mk(spark, path, fs)
        got = {r.k: (r.n, r.s) for r in mv.read_partials().collect()}
        assert got == {"a": (6, 15), "b": (6, 30)}
        assert [n for n, _, _ in mv._versions()] == [4, 5]


class TestAdapterErrorMapping:
    """Only a 404 means absent; transient failures must raise, never
    read as 'not there' (a wrong absent flips commit/GC decisions)."""

    @pytest.fixture()
    def flaky(self):
        store = _Store()
        base = _make_handler(store)
        state = {"fail_next_head": 0, "truncate_lists": False}

        class Flaky(base):
            def do_HEAD(self):
                if state["fail_next_head"]:
                    state["fail_next_head"] -= 1
                    self._reply(503)
                    return
                base.do_HEAD(self)

            def _list(self, q):
                if state["truncate_lists"]:
                    xml = (
                        '<?xml version="1.0"?><ListBucketResult '
                        'xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
                        "<IsTruncated>true</IsTruncated>"
                        "<Contents><Key>t/x</Key></Contents>"
                        "</ListBucketResult>"
                    ).encode()
                    self._reply(200, xml)
                    return
                base._list(self, q)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        fs = HttpCasLakeFS(f"http://127.0.0.1:{srv.server_port}/{BUCKET}")
        yield fs, state
        srv.shutdown()

    def test_head_5xx_raises_instead_of_absent(self, flaky):
        fs, state = flaky
        fs.write_bytes("/t/committed", b"x")
        state["fail_next_head"] = 1
        with pytest.raises(OSError, match="HTTP 503"):
            fs.exists("/t/committed")
        assert fs.exists("/t/committed") is True  # healthy again
        state["fail_next_head"] = 1
        with pytest.raises(OSError, match="HTTP 503"):
            fs.size("/t/committed")

    def test_truncated_list_without_token_raises(self, flaky):
        fs, state = flaky
        state["truncate_lists"] = True
        with pytest.raises(OSError, match="NextContinuationToken"):
            fs.ls("/t")

    def test_default_port_stripped_from_host(self):
        fs = HttpCasLakeFS("http://example.test:80/b")
        assert fs._host == "example.test"
        fs2 = HttpCasLakeFS("https://example.test:443/b")
        assert fs2._host == "example.test"
        fs3 = HttpCasLakeFS("http://example.test:9000/b")
        assert fs3._host == "example.test:9000"  # non-default kept


class TestOpaqueEtagCas:
    """Stores whose ETag is NOT the content md5 (SSE-KMS, multipart,
    some S3-compatibles): the ambiguous-412 reclassification must fall
    back to a GET-and-compare of the committed bytes, never report a
    dropped-response WIN as a loss (which would, e.g., duplicate a
    CommitLog entry at version+1)."""

    def test_self_win_reclassified_via_byte_compare(self, fs, store):
        store.drop_response_once.add("t/kmsdrop")
        fs._etag = lambda key: "opaque-kms-tag-123"
        assert fs.put_if_absent("/t/kmsdrop", b"mine") is True
        assert fs.read_bytes("/t/kmsdrop") == b"mine"

    def test_true_loss_with_opaque_etag_stays_loss(self, fs, store):
        assert fs.put_if_absent("/t/kmslost", b"theirs") is True
        store.drop_response_once.add("t/kmslost")
        fs._etag = lambda key: "0123456789abcdef-2"  # multipart-shaped
        assert fs.put_if_absent("/t/kmslost", b"mine") is False
        assert fs.read_bytes("/t/kmslost") == b"theirs"

    def test_absent_etag_falls_back_to_byte_compare(self, fs, store):
        store.drop_response_once.add("t/noetag")
        fs._etag = lambda key: None
        assert fs.put_if_absent("/t/noetag", b"mine") is True

    def test_md5_shaped_mismatch_still_byte_compares(self, fs, store):
        """SSE-KMS single-part ETags are 32-hex SHAPED yet NOT the
        content md5 — a shape-based skip would misreport a
        dropped-response WIN as a loss. A mismatching ETag (whatever
        its shape) must fall through to the GET byte-compare."""
        store.drop_response_once.add("t/kmsshaped")
        import hashlib as _h

        # md5-shaped, but of unrelated bytes (a KMS-style opaque tag)
        fs._etag = lambda key: _h.md5(b"not-the-content").hexdigest()
        assert fs.put_if_absent("/t/kmsshaped", b"mine") is True
        assert fs.read_bytes("/t/kmsshaped") == b"mine"

    def test_md5_shaped_mismatch_true_loss_stays_loss(self, fs, store):
        """...and when the committed bytes genuinely differ, the GET
        byte-compare still reports the loss."""
        assert fs.put_if_absent("/t/md5lost", b"theirs") is True
        store.drop_response_once.add("t/md5lost")
        import hashlib as _h

        fs._etag = lambda key: _h.md5(b"theirs").hexdigest()
        assert fs.put_if_absent("/t/md5lost", b"mine") is False
        assert fs.read_bytes("/t/md5lost") == b"theirs"
