"""Table-content fingerprinting (replication / migration audit).

The lake sinks (``sinks/keyed.py``, ``sinks/joinview.py``) move data
between snapshots, engines and stores; the operator here answers the
question every migration ends with: *is the copy bit-identical to
the source?* — without ever shipping rows. Each side computes a
bucketed Merkle-style digest table; equal digest tables ⇒ equal
content (up to md5 collision), and a mismatch localizes to the
differing bucket(s), which is what makes repair incremental instead
of full-recopy. The same shape backs the reference's at-least-once
upsert discipline (T6, supabase_repository.py:45-53): replaying a
load must leave the digest table unchanged.

Cross-engine determinism is the whole game, so the canonicalization
is explicit and engine-neutral:

- every column is cast to a canonical STRING form by the CALLER
  (integers as decimal strings, money as bigint cents, timestamps as
  epoch seconds) — float/date formatting is the classic source of
  false mismatches between engines and is banned from the row image;
- each field is LENGTH-PREFIXED into the row image
  (``len:value|``, NULL → the sentinel ``N|``) — a plain
  ``concat_ws`` would both skip NULLs and let a separator character
  inside a value shift field boundaries, so distinct rows like
  ``('a|b','c')`` / ``('a','b|c')`` or ``('a',NULL,'b')`` /
  ``('a','b',NULL)`` would collide to one digest and a corrupted
  copy could verify as identical; the length prefix makes the
  encoding prefix-free, so no value content can forge a boundary;
- row image → md5 (lowercase hex in both Spark and DuckDB);
- bucket = a deterministic function of the PRIMARY KEY (pmod of the
  key, never of the row hash — so a value-only corruption stays in
  its expected bucket and is localized);
- bucket digest = md5 of the row digests concatenated in SORTED
  order — sort-before-fold makes the digest independent of scan,
  shuffle and partition order on any engine.

Scale: the sorted fold holds one bucket's digest strings in one
task; buckets are key-hash-balanced, so memory per task is
|table| · 32 bytes / num_buckets — pick ``num_buckets`` so that is
megabytes (65536 buckets for a 10¹⁰-row table). The digest table
itself is num_buckets rows — metadata-sized, broadcast-joinable for
the diff.

Incremental verification: for tables on the keyed layout
(``sinks/keyed.py``) the digest bucket IS the layout bucket
(``_kb``), so after a merge the digest refresh costs exactly what
the merge cost — :func:`keyed_digest` partition-prunes the scan to
the touched buckets (the ids ``upsert_keyed``/``delete_keyed``/
``scd2_apply_keyed`` return), :func:`refresh_digest` splices the
re-digested buckets into the stored digest table, and
:func:`diff_digest` localizes any mismatch to its bucket(s).
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Optional stamp column carrying the canonicalization fingerprint on
#: a STORED digest table (see :func:`with_canon`). Never emitted by
#: :func:`table_digest`/:func:`keyed_digest` themselves, so catalog
#: queries' digest schemas are unchanged.
CANON_COL = "_canon"


def canon_fingerprint(
    canon_cols: Sequence[Column], spec: str | None = None
) -> str:
    """Deterministic fingerprint of the canonicalization recipe.

    A stored digest is only comparable to a re-digest computed under
    the SAME ``canon_cols`` — e.g. after an ``evolve_schema`` upsert
    adds a column, a partial re-digest that now canonicalizes the new
    column would make every UNTOUCHED bucket diff dirty (bucket-level
    false mismatches with no row actually changed). The fingerprint
    is the md5 of the Column expression strings, which PySpark renders
    deterministically for a given expression tree — for a given
    PySpark runtime. That rendering is NOT pinned across PySpark
    versions (or classic vs Connect), so a stamp also records the
    version it was rendered under (see :func:`with_canon`): a runtime
    upgrade that changes the renderer still fails loudly, but the
    error can then say "renderer changed" instead of masquerading as
    recipe drift. Callers who need a stamp that survives runtime
    upgrades entirely pass ``spec`` — an explicit canonical string
    (column names + canonicalization description) that is fingerprinted
    verbatim, independent of any Column repr."""
    if spec is None:
        spec = "\x1f".join(str(c) for c in canon_cols)
    return hashlib.md5(spec.encode("utf-8")).hexdigest()


def _stamp_version() -> str:
    import pyspark

    return pyspark.__version__


def _split_stamp(stamp: str) -> tuple[str, str | None]:
    """(fingerprint, renderer-version) — version None on legacy
    stamps written before versions were recorded."""
    fp, _, ver = stamp.partition("@")
    return fp, (ver or None)


def with_canon(
    digest: DataFrame,
    canon_cols: Sequence[Column],
    spec: str | None = None,
) -> DataFrame:
    """Stamp a digest table with its canonicalization fingerprint
    (column ``_canon``) before persisting it. :func:`refresh_digest`
    and :func:`diff_digest` then FAIL LOUDLY on recipe drift instead
    of silently reporting every untouched bucket as corrupt —
    mirroring the ``_keyed_meta`` fail-on-drift contract in
    ``sinks/keyed.py``.

    The stamp is ``<fingerprint>@<pyspark-version>``; only the
    fingerprint half participates in equality (a version bump with a
    stable rendering never fails), the version half upgrades the
    drift error's diagnosis when fingerprints DO differ across
    runtimes. Pass ``spec`` to fingerprint an explicit canonical
    string instead of the runtime's Column rendering — the
    upgrade-proof form."""
    stamp = f"{canon_fingerprint(canon_cols, spec=spec)}@{_stamp_version()}"
    return digest.withColumn(CANON_COL, F.lit(stamp))


def _canon_of(df: DataFrame) -> str | None:
    """The (single) fingerprint a stamped digest table carries, or
    None when unstamped. Digest tables are metadata-sized (≤ one row
    per bucket), so the collect here is O(num_buckets).

    Mixedness is judged on the FINGERPRINT half of the stamp only: a
    baseline refreshed across a PySpark upgrade legitimately carries
    rows stamped under two renderer versions with the same
    fingerprint (refresh_digest splices old and new rows) — that is
    one recipe, not a mixed table. Two distinct fingerprints remain
    a hard error whatever the versions."""
    if CANON_COL not in df.columns:
        return None
    vals = [r[0] for r in df.select(CANON_COL).distinct().collect()]
    fps = {_split_stamp(v)[0] for v in vals}
    if len(fps) > 1:
        raise ValueError(
            f"digest table carries {len(fps)} distinct {CANON_COL} "
            f"fingerprints — it was built from mixed canonicalization "
            f"recipes and cannot be trusted: {sorted(vals)}"
        )
    # Newest RENDERER version wins among same-fingerprint stamps, and
    # "newest" is the parsed version tuple, not the lexicographic
    # string ('10.0.0' > '9.9.9'). Legacy unversioned stamps sort
    # oldest; non-numeric segments fall back to string order.
    return max(vals, key=_stamp_sort_key) if vals else None


def _stamp_sort_key(stamp: str) -> tuple:
    ver = _split_stamp(stamp)[1]
    if ver is None:
        return (0,)
    parts: list[tuple[int, int | str]] = []
    for seg in ver.split("."):
        # numeric segments before same-position strings, each
        # comparable only within its kind (mirrors PEP 440 loosely)
        parts.append((1, int(seg)) if seg.isdigit() else (0, seg))
    return (1, parts)


def _check_canon(a: DataFrame, b: DataFrame, op: str) -> None:
    """Raise when either side is stamped and the stamps disagree
    (or only one side is stamped — recipe unknown ≠ recipe equal).
    Only the fingerprint half of a stamp participates in equality;
    the recorded renderer version refines the error's diagnosis."""
    sa, sb = _canon_of(a), _canon_of(b)
    if sa is None and sb is None:
        return
    fa, va = _split_stamp(sa) if sa is not None else (None, None)
    fb, vb = _split_stamp(sb) if sb is not None else (None, None)
    if fa != fb:
        if va is not None and vb is not None and va != vb:
            cause = (
                f"the stamps were rendered under different PySpark "
                f"versions ({va} vs {vb}) — this is likely RENDERER "
                f"drift (Column repr changed across runtimes), not a "
                f"recipe change; re-digest the baseline under the "
                f"current runtime (or stamp with an explicit spec= to "
                f"be upgrade-proof)"
            )
        else:
            cause = (
                "recompute the stored baseline under the current "
                "canon_cols (e.g. after evolve_schema) instead of "
                "diffing across recipes, which would report every "
                "untouched bucket as a mismatch"
            )
        raise ValueError(
            f"{op}: canonicalization drift — digest recipes differ "
            f"({sa!r} vs {sb!r}); {cause}"
        )


def table_digest(
    df: DataFrame,
    canon_cols: Sequence[Column],
    bucket_key: Column,
    num_buckets: int = 64,
) -> DataFrame:
    """Bucketed Merkle-style content digest of a table.

    ``canon_cols`` — already-canonicalized STRING columns (see module
    doc; the caller owns number/time formatting — NULLs and arbitrary
    characters are safe, the length-prefixed field encoding is
    injection-proof). ``bucket_key`` — an integer expression over the
    primary key. Output: one row per non-empty bucket,
    ``(bucket, n_rows, digest)``; equal outputs on two tables ⇔
    identical multisets of row tuples per bucket. SQL twin of the
    field encoding: ``CASE WHEN c IS NULL THEN 'N|' ELSE
    length(c) || ':' || c || '|' END`` concatenated across fields.

    Bucketing is ``pmod`` (always non-negative). An ANSI-SQL twin
    must therefore use ``((key % n) + n) % n`` — NOT plain ``%``,
    whose sign follows the dividend in DuckDB/Postgres, so a
    negative ``bucket_key`` would land the same row in different
    buckets per engine and a clean replica would report spurious
    bucket mismatches.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    rows = df.select(
        F.pmod(bucket_key.cast("long"), F.lit(num_buckets)).alias("bucket"),
        _row_digest(canon_cols).alias("_rd"),
    )
    return _fold_buckets(rows)


def _row_digest(canon_cols: Sequence[Column]) -> Column:
    """md5 of the length-prefixed, prefix-free row image (module doc)."""
    fields = [
        F.when(c.isNull(), F.lit("N|")).otherwise(
            F.concat(F.length(c).cast("string"), F.lit(":"), c, F.lit("|"))
        )
        for c in canon_cols
    ]
    return F.md5(F.concat(*fields))


def _fold_buckets(rows: DataFrame) -> DataFrame:
    """(bucket, _rd) rows → (bucket, n_rows, digest): order-free
    sorted fold per bucket."""
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("_rd")), "")
        ).alias("digest"),
    )


def keyed_digest(
    spark,
    path: str,
    canon_cols: Sequence[Column],
    buckets: Sequence[int] | None = None,
    fs=None,
) -> DataFrame:
    """Content digest of a keyed-layout table (``sinks/keyed.py``)
    bucketed by the LAYOUT's own bucket column ``_kb`` — so the scan
    is partition-PRUNED when ``buckets`` is given: re-digesting the
    buckets an upsert touched reads exactly the directories the
    upsert rewrote, nothing else. ``buckets=None`` digests the whole
    table (the baseline / audit pass). Output schema matches
    :func:`table_digest`: ``(bucket, n_rows, digest)``."""
    from dbm_nca_ph_etl_spark.sinks.keyed import KB_COL, _read_base

    base = _read_base(spark, path, fs)
    if buckets is not None:
        base = base.where(F.col(KB_COL).isin(list(buckets)))
    rows = base.select(
        F.col(KB_COL).cast("long").alias("bucket"),
        _row_digest(canon_cols).alias("_rd"),
    )
    return _fold_buckets(rows)


def refresh_digest(
    stored: DataFrame, partial: DataFrame, touched: Sequence[int]
) -> DataFrame:
    """Splice a re-digested bucket subset into a stored digest table:
    drop the ``touched`` buckets' old rows, union the fresh ones.
    ``partial`` must cover exactly the ``touched`` buckets (a bucket
    emptied by a delete simply has no row — same convention as
    :func:`table_digest`, which only emits non-empty buckets). The
    result equals a full re-digest of the post-merge table — pinned
    by ``tests/test_integrity_incremental.py``.

    When either side carries a ``_canon`` stamp (:func:`with_canon`),
    the stamps must agree — splicing a re-digest computed under a
    DIFFERENT canonicalization (e.g. post-``evolve_schema``) into an
    old baseline raises instead of silently planting rows that will
    diff dirty against every future audit."""
    _check_canon(stored, partial, "refresh_digest")
    kept = stored.where(~F.col("bucket").isin(list(touched)))
    return kept.unionByName(partial)


def diff_digest(expected: DataFrame, actual: DataFrame) -> DataFrame:
    """Buckets where two digest tables disagree — the localization
    step of the audit. Full-outer on bucket id; a bucket present on
    one side only (NULL row-count on the other) is also a mismatch.
    Output: ``(bucket, n_rows_expected, n_rows_actual,
    digest_expected, digest_actual)``, one row per differing bucket;
    empty ⇔ identical content (up to md5 collision). ``_canon``
    stamps, when present, must agree (see :func:`with_canon`) — a
    diff across canonicalization recipes would flag every bucket."""
    _check_canon(expected, actual, "diff_digest")
    e = expected.select(
        "bucket",
        F.col("n_rows").alias("n_rows_expected"),
        F.col("digest").alias("digest_expected"),
    )
    a = actual.select(
        "bucket",
        F.col("n_rows").alias("n_rows_actual"),
        F.col("digest").alias("digest_actual"),
    )
    joined = e.join(a, on="bucket", how="full_outer")
    return joined.where(
        ~(
            F.col("digest_expected").eqNullSafe(F.col("digest_actual"))
            & F.col("n_rows_expected").eqNullSafe(F.col("n_rows_actual"))
        )
    ).select(
        "bucket",
        "n_rows_expected",
        "n_rows_actual",
        "digest_expected",
        "digest_actual",
    )
