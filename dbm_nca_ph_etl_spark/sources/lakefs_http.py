"""True compare-and-swap object-store adapter for the lakefs seam.

:class:`HttpCasLakeFS` speaks the S3 REST protocol (path-style
bucket-in-endpoint) over plain HTTP(S) with **genuine conditional
PUT**: ``put_if_absent`` sends ``If-None-Match: *`` and the STORE
arbitrates the race (HTTP 412 = lost). That closes the gap the base
:class:`~dbm_nca_ph_etl_spark.sources.lakefs.LakeFS` documents —
``ArrowLakeFS`` inherits check-then-write because ``pyarrow.fs``
exposes no conditional write, so every multi-writer commit protocol
built on the CAS (``sinks/txlog`` leases + commit logs, the marker
commits in ``sinks/matview``/``sinks/joinview``) was only
best-effort off POSIX. On this adapter they are exact
(``atomic_cas = True``).

The conditional-PUT dialect is the one S3 standardized (2024-08,
``If-None-Match: *`` → 200 created / 412 exists / 409 concurrent-
conditional-conflict-retry) and MinIO/R2/GCS-XML all honor; GCS's
native form is ``x-goog-if-generation-match: 0`` with the same
three-way outcome. Requests are SigV4-signed when credentials are
given (stdlib hmac — no boto dependency) and anonymous otherwise,
so the same class drives a real bucket or the in-process test store
(``tests/test_lakefs_http.py`` ships a MiniObjectStore HTTP server
whose CAS is serialized server-side — semantics distinct from
POSIX ``O_EXCL``: no rename, no directories, list-by-prefix).

Reference parity: the reference gets its multi-writer atomicity from
Postgres ``on_conflict`` upserts (``supabase_repository.py:59-65``);
this adapter is the lake-native equivalent primitive.

Key model: the seam passes ordinary path strings (the sinks join
with ``/``); this adapter uses them verbatim as object keys, minus
any leading ``/`` (restored on listing so callers round-trip).
Object stores have no directories: ``mkdirs`` is a no-op,
``is_dir``/``ls_dirs`` are prefix+delimiter queries, exactly the
semantics S3 gives Hadoop's S3A.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import http.client
import time
import urllib.parse
import xml.etree.ElementTree as ET

from dbm_nca_ph_etl_spark.sources.lakefs import LakeFS

_NS = "{http://s3.amazonaws.com/doc/2006-03-01/}"

def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


class HttpCasLakeFS(LakeFS):
    """S3-REST adapter with a true conditional PUT.

    ``endpoint`` is scheme://host[:port][/bucket] (path-style). With
    ``access_key``/``secret_key`` every request is SigV4-signed;
    without them requests go anonymous (local/dev stores).

    Verified against a real, independently implemented S3 endpoint:
    ``tests/test_lakefs_http_live.py`` runs the adapter round-trip,
    the CAS thread race, the commit-log/lease protocols, and the
    Spark two-writer + compactor-beside-ingester merges against
    moto's ``ThreadedMotoServer`` (SigV4-signed over real HTTP
    sockets), and ``tests/test_txlog_multiprocess.py`` re-runs its
    process-level races on the same server. Point the live suite at
    any other store (MinIO, AWS S3 — conditional PUT is GA since
    2024-08) via ``SPARK_GRAFT_S3_ENDPOINT`` /
    ``SPARK_GRAFT_S3_BUCKET`` / ``SPARK_GRAFT_S3_KEY`` /
    ``SPARK_GRAFT_S3_SECRET`` (optional ``SPARK_GRAFT_S3_REGION``).
    Required store permissions include ``s3:ListBucket`` (see
    ``ls``/``exists`` notes) and conditional-write support.
    """

    atomic_rename = False  # object store: PUT is the atomicity unit
    atomic_cas = True      # If-None-Match:* — store-arbitrated

    def __init__(
        self,
        endpoint: str,
        *,
        access_key: str | None = None,
        secret_key: str | None = None,
        session_token: str | None = None,
        region: str = "us-east-1",
        timeout_s: float = 30.0,
        cas_conflict_retries: int = 8,
    ) -> None:
        u = urllib.parse.urlsplit(endpoint)
        if u.scheme not in ("http", "https"):
            raise ValueError(f"endpoint must be http(s)://..., got {endpoint!r}")
        self._scheme = u.scheme
        # normalize away the scheme's default port: http.client omits
        # it from the Host header it sends, so signing "host:443"
        # would fail every SigV4 check with SignatureDoesNotMatch
        netloc = u.netloc
        default = ":443" if u.scheme == "https" else ":80"
        if netloc.endswith(default):
            netloc = netloc[: -len(default)]
        self._host = netloc
        self._base = u.path.rstrip("/")  # "" or "/bucket"
        self._ak, self._sk, self._tok = access_key, secret_key, session_token
        self._region = region
        self._timeout = timeout_s
        self._cas_retries = cas_conflict_retries

    # -- transport ---------------------------------------------------

    def _key(self, path: str) -> str:
        return path.lstrip("/")

    def _sign(self, method, uri_path, query, headers, payload_hash):
        """SigV4 per the public AWS signing spec (service=s3)."""
        now = datetime.datetime.now(datetime.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        scope_date = now.strftime("%Y%m%d")
        headers["x-amz-date"] = amz_date
        headers["x-amz-content-sha256"] = payload_hash
        if self._tok:
            headers["x-amz-security-token"] = self._tok
        canon_q = "&".join(
            f"{urllib.parse.quote(k, safe='')}={urllib.parse.quote(v, safe='')}"
            for k, v in sorted(query)
        )
        signed_names = sorted({k.lower() for k in headers} | {"host"})
        hdrmap = {k.lower(): v.strip() for k, v in headers.items()}
        hdrmap["host"] = self._host
        canon_h = "".join(f"{k}:{hdrmap[k]}\n" for k in signed_names)
        signed = ";".join(signed_names)
        canon_req = "\n".join(
            [method, uri_path, canon_q, canon_h, signed, payload_hash]
        )
        scope = f"{scope_date}/{self._region}/s3/aws4_request"
        to_sign = "\n".join(
            ["AWS4-HMAC-SHA256", amz_date, scope, _sha256(canon_req.encode())]
        )
        k = f"AWS4{self._sk}".encode()
        for part in (scope_date, self._region, "s3", "aws4_request"):
            k = hmac.new(k, part.encode(), hashlib.sha256).digest()
        sig = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
        headers["Authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self._ak}/{scope}, "
            f"SignedHeaders={signed}, Signature={sig}"
        )

    def _request(
        self,
        method: str,
        key: str,
        *,
        query: list[tuple[str, str]] | None = None,
        data: bytes | None = None,
        extra_headers: dict | None = None,
    ) -> tuple[int, dict, bytes]:
        query = list(query or [])
        uri_path = self._base + "/" + urllib.parse.quote(key, safe="/~")
        headers = dict(extra_headers or {})
        payload = data or b""
        if self._ak and self._sk:
            self._sign(method, uri_path, query, headers, _sha256(payload))
        url = uri_path
        if query:
            # encode exactly like the SigV4 canonical query (quote,
            # not quote_plus) so the wire form is what was signed
            url += "?" + "&".join(
                f"{urllib.parse.quote(k, safe='')}="
                f"{urllib.parse.quote(v, safe='')}"
                for k, v in sorted(query)
            )
        cls = (
            http.client.HTTPSConnection
            if self._scheme == "https"
            else http.client.HTTPConnection
        )
        conn = cls(self._host, timeout=self._timeout)
        try:
            conn.request(method, url, body=payload if data is not None else None,
                         headers=headers)
            resp = conn.getresponse()
            body = resp.read()
            return resp.status, dict(resp.getheaders()), body
        finally:
            conn.close()

    def _list(self, prefix: str, delimiter: str | None):
        """All (keys, common_prefixes) under ``prefix``, following
        continuation tokens (ListObjectsV2). Sizes from the same
        response are cached per call via :meth:`_list_sized`."""
        entries, prefixes = self._list_sized(prefix, delimiter)
        return [k for k, _ in entries], prefixes

    def _list_sized(self, prefix: str, delimiter: str | None):
        """All ((key, size), common_prefixes) under ``prefix`` —
        ListObjectsV2 carries ``<Size>`` per object, so a sized
        listing costs the same round trips as a bare one."""
        keys: list[tuple[str, int]] = []
        prefixes: list[str] = []
        token = None
        while True:
            q = [("list-type", "2"), ("prefix", prefix)]
            if delimiter:
                q.append(("delimiter", delimiter))
            if token:
                q.append(("continuation-token", token))
            status, _, body = self._request("GET", "", query=q)
            if status != 200:
                raise OSError(f"LIST {prefix!r} -> HTTP {status}")
            root = ET.fromstring(body)
            for c in root.iter(f"{_NS}Contents"):
                sz = c.findtext(f"{_NS}Size")
                keys.append(
                    (c.findtext(f"{_NS}Key"), int(sz) if sz else 0)
                )
            for c in root.iter(f"{_NS}CommonPrefixes"):
                prefixes.append(c.findtext(f"{_NS}Prefix"))
            if root.findtext(f"{_NS}IsTruncated") == "true":
                nxt = root.findtext(f"{_NS}NextContinuationToken")
                if not nxt or nxt == token:
                    # a truncated page without a fresh token would
                    # refetch the same page forever — fail loudly
                    raise OSError(
                        f"LIST {prefix!r} truncated without a usable "
                        "NextContinuationToken"
                    )
                token = nxt
                continue
            return keys, prefixes

    # -- protocol ----------------------------------------------------

    def _restore(self, path: str, key: str) -> str:
        return ("/" + key) if path.startswith("/") else key

    def ls(self, path, suffixes=None):
        key = self._key(path)
        out = []
        if self.exists(path) and (
            suffixes is None or path.lower().endswith(tuple(suffixes))
        ):
            out.append(path)  # a single "file" path lists itself
        keys, _ = self._list(key.rstrip("/") + "/", "/")
        for k in keys:
            if suffixes is None or k.lower().endswith(tuple(suffixes)):
                out.append(self._restore(path, k))
        return sorted(out)

    def ls_with_sizes(self, path, suffixes=None):
        key = self._key(path)
        out = []
        if suffixes is None or path.lower().endswith(tuple(suffixes)):
            try:
                out.append((path, self.size(path)))  # single-"file" path
            except FileNotFoundError:
                pass
        entries, _ = self._list_sized(key.rstrip("/") + "/", "/")
        for k, sz in entries:
            if suffixes is None or k.lower().endswith(tuple(suffixes)):
                out.append((self._restore(path, k), sz))
        return sorted(out)

    def is_dir(self, path):
        keys, prefixes = self._list(self._key(path).rstrip("/") + "/", "/")
        return bool(keys or prefixes)

    def read_bytes(self, path):
        status, _, body = self._request("GET", self._key(path))
        if status == 404:
            raise FileNotFoundError(path)
        if status != 200:
            raise OSError(f"GET {path!r} -> HTTP {status}")
        return body

    def write_bytes(self, path, data):
        status, _, _ = self._request("PUT", self._key(path), data=data)
        if status not in (200, 201):
            raise OSError(f"PUT {path!r} -> HTTP {status}")

    def exists(self, path):
        """ONLY a 404 means absent. Mapping any non-200 (403, 500,
        503...) to False would turn a transient store error into a
        wrong commit/GC decision — e.g. matview GC deleting a
        committed version whose ``_COMMITTED`` HEAD happened to 503,
        or a keyed delete silently no-opping on a flaky meta HEAD.

        Permission requirement: real S3 answers a HEAD on a missing
        key with 403 (not 404) when the credential lacks
        ``s3:ListBucket`` on the bucket — under such a credential
        every absence probe here (keyed ``_META`` checks, lease
        probes) raises instead of returning False. That is the safe
        direction (absence is never fabricated), but it makes the
        adapter unusable for probing: grant ``s3:ListBucket``
        alongside the object permissions."""
        status, _, _ = self._request("HEAD", self._key(path))
        if status == 200:
            return True
        if status == 404:
            return False
        raise OSError(f"HEAD {path!r} -> HTTP {status}")

    def size(self, path):
        status, headers, _ = self._request("HEAD", self._key(path))
        if status == 404:
            raise FileNotFoundError(path)
        if status != 200:
            raise OSError(f"HEAD {path!r} -> HTTP {status}")
        hdr = {k.lower(): v for k, v in headers.items()}
        return int(hdr["content-length"])

    def mkdirs(self, path):
        pass  # object stores have no directories

    def delete_dir(self, path):
        keys, _ = self._list(self._key(path).rstrip("/") + "/", None)
        for k in keys:
            self.delete_file(self._restore(path, k))

    def ls_dirs(self, path):
        base = self._key(path).rstrip("/") + "/"
        _, prefixes = self._list(base, "/")
        return sorted(self._restore(path, p.rstrip("/")) for p in prefixes)

    def delete_file(self, path):
        status, _, _ = self._request("DELETE", self._key(path))
        if status not in (200, 204, 404):
            raise OSError(f"DELETE {path!r} -> HTTP {status}")

    def put_if_absent(self, path, data):
        """Store-arbitrated CAS. 200 → we created it; 412
        (PreconditionFailed) → it exists, we lost; 409
        (ConditionalRequestConflict) → another conditional write is
        in flight on the same key — back off and retry, after which
        the outcome is again a clean win/lose (the retry discipline
        S3's conditional-write documentation prescribes).

        Dropped-response ambiguity: a transport error can arrive
        AFTER the store applied the conditional PUT, so a blind retry
        would see 412 and report a loss even though our payload won.
        Transport errors are therefore retried INSIDE this call, and
        a 412 that follows one is disambiguated by comparing the
        object's ETag against ``md5(data)`` (the non-multipart S3
        ETag) — match → our earlier PUT landed, report the win. If
        another writer raced us with byte-identical content the
        reclassification is still harmless: who "won" is
        unobservable when the committed bytes are ours either way.
        Only a MATCH is conclusive: an ETag that mismatches md5(data)
        proves nothing, because stores exist whose ETag is 32-hex
        SHAPED yet is not the content md5 (AWS SSE-KMS single-part
        PUTs, notably, besides multipart's ``<hex>-N`` and opaque
        S3-compatibles). Any mismatch therefore falls through to a
        GET of the committed object and a direct byte comparison —
        one extra round trip on this already-rare ambiguous path —
        so a dropped-response PUT that actually WON is never
        reported as a loss (which would, e.g., make the CommitLog
        CAS loop append the same entry again at version+1,
        duplicating a commit record).
        A 412 with NO preceding transport error in this call is
        an unambiguous loss and costs no extra round trip. Callers
        that still see a transport exception propagate (all retries
        dead) cannot assume loss OR win — they must re-probe.
        """
        key = self._key(path)
        delay = 0.01
        ambiguous = False  # a transport error may have committed us
        last_exc: Exception | None = None
        for _ in range(self._cas_retries):
            try:
                status, _, _ = self._request(
                    "PUT", key, data=data, extra_headers={"If-None-Match": "*"}
                )
            except (OSError, http.client.HTTPException) as exc:
                ambiguous, last_exc = True, exc
                time.sleep(delay)
                delay = min(delay * 2, 0.5)
                continue
            if status in (200, 201):
                return True
            if status == 412:
                if ambiguous:
                    etag = self._etag(key)
                    if etag == hashlib.md5(data).hexdigest():
                        return True  # our own dropped-response PUT won
                    # A mismatching ETag proves NOTHING: SSE-KMS
                    # single-part ETags are 32-hex shaped yet not the
                    # content md5, so only a match is conclusive.
                    # Compare the committed bytes directly.
                    try:
                        if self.read_bytes(path) == data:
                            return True
                    except (OSError, http.client.HTTPException):
                        pass  # unknown degrades to loss (safe side)
                return False
            if status == 409:
                time.sleep(delay)
                delay = min(delay * 2, 0.5)
                continue
            raise OSError(f"conditional PUT {path!r} -> HTTP {status}")
        if last_exc is not None:
            raise OSError(
                f"conditional PUT {path!r}: transport failed "
                f"{self._cas_retries} times; outcome UNKNOWN — re-probe "
                f"before assuming loss"
            ) from last_exc
        raise OSError(
            f"conditional PUT {path!r} still conflicting after "
            f"{self._cas_retries} retries"
        )

    def _etag(self, key: str) -> str | None:
        """Unquoted ETag of ``key``, or None when absent/unavailable —
        only used to reclassify an ambiguous CAS 412 (see
        ``put_if_absent``), where 'unknown' safely degrades to 'loss'."""
        try:
            status, headers, _ = self._request("HEAD", key)
        except (OSError, http.client.HTTPException):
            return None
        if status != 200:
            return None
        hdr = {k.lower(): v for k, v in headers.items()}
        return hdr.get("etag", "").strip('"') or None
