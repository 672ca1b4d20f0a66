"""The NCA cleaner as a pure DataFrame transform.

Re-expresses ``clean_raw_data`` (reference:
src/infrastructure/adapters/pd_data_cleaner.py:22-60) — the
reference's entire pandas transform stage — as declarative Spark:

reference step (file:line)                 → engine step
-----------------------------------------------------------------
header promote + project (:62-68)          → promote_header (P1/P2)
spacer insertion on raw rows (:70-97, :28) → boundary-row union (W2)
repeated-header removal (:99-118, :29)     → normalized-equality filter (P3)
""→NaN + ffill nca_number (:31-32)         → last(ignorenulls) window (W1)
groupby + join/identity aggs (:33-45)      → groupBy + ordered collect (A1)
_join_col_to_str leading run (:120-132)    → leading_run_concat (W3)
records: date coerce + dedup (:134-141)    → coerce_timestamp_iso + per-group
spacers on grouped df (:149) + explode
(:151) + reassembly loop (:152-163)        → segment cumsum + ordered concat (W4)
                                             directly over filled rows (the
                                             collect→explode round-trip is a
                                             no-op and is skipped; A3 explode
                                             is exercised by token_frequency /
                                             multimodal instead)
cast + drop invalid (:164-172)             → coerce_double + filters (P9/P10)

Engine-wide conventions (SURVEY §4): every collect is pinned to
``(page_num, row_idx)``; null and ``""`` are both "empty" (pdfplumber
emits None for blank cells, the reference's spacers emit ``""`` —
they behave identically on well-formed data, and the engine treats
them uniformly so partial extraction can't flip semantics).

Divergences (documented, deliberate):
- many releases per call, partitioned by ``release_id`` (the
  reference cleans one release per invocation);
- allocations carry ``release_id`` (the reference relies on the
  FK chain through nca_number);
- group output order is not meaningful (relational output; the
  reference emits pandas-sorted group order).

Scale: one shuffle for the window stage (partition by release_id),
one for the groupBy (release_id, nca_number), one window over
(release_id) for the exploded reassembly. Releases are independent —
perfectly parallel across a 1000-executor cluster; no driver-side
loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.functions.scalars import (
    coerce_double,
    coerce_timestamp_iso,
    norm_header,
)
from dbm_nca_ph_etl_spark.nca.schemas import (
    ALLOC_FIELDS,
    RECORD_FIELDS,
    VALID_COLUMNS,
)
from dbm_nca_ph_etl_spark.operators.windows import (
    forward_fill,
    leading_run_concat,
)


def _is_empty(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == "")


def promote_header(cells_df: DataFrame) -> DataFrame:
    """P1/P2 — header promotion + projection for array-shaped raw rows.

    The first row per release (min page_num, row_idx) carries the
    header; its cells are normalized ``lower().replace(" ", "_")``
    (pd_data_cleaner.py:62-65) and drive a position→name mapping.
    We keep the 8 VALID_COLUMNS (constants.py:35-44) by normalized
    name, dropping approved_date/remarks.

    Implemented as a broadcast join of the per-release header array —
    per-release dynamic layout without any driver-side collect.
    """
    w = Window.partitionBy("release_id").orderBy("page_num", "row_idx")
    with_rank = cells_df.withColumn("_rn", F.row_number().over(w))
    headers = (
        with_rank.where(F.col("_rn") == 1)
        .select(
            "release_id",
            F.transform(
                "cells",
                lambda c: F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), " ", "_"),
            ).alias("_header"),
        )
    )
    data = with_rank.where(F.col("_rn") > 1).join(F.broadcast(headers), "release_id")

    def cell_for(name: str) -> Column:
        pos = F.array_position("_header", F.lit(name)).cast("int")
        return F.when(pos > 0, F.element_at("cells", pos)).otherwise(F.lit(None)).alias(name)

    return data.select(
        "release_id", "page_num", "row_idx", *[cell_for(n) for n in VALID_COLUMNS]
    )


def _with_group_spacers(df: DataFrame) -> DataFrame:
    """W2 — materialize the reference's raw-row spacer insertion
    (pd_data_cleaner.py:70-97, called at :28): an all-empty row is
    added before every row whose raw nca_number is non-empty, differs
    from the previous row's, and the previous is also non-empty.

    Declarative: flag boundary rows with a lag window, generate the
    spacer as a second element of a per-row array, posexplode — no
    row-at-a-time iteration, order preserved via (ord, seq).
    """
    w = Window.partitionBy("release_id").orderBy("page_num", "row_idx")
    prev = F.lag("nca_number").over(w)
    boundary = (
        ~_is_empty(F.col("nca_number"))
        & ~_is_empty(prev)
        & (F.col("nca_number") != prev)
    )
    flagged = df.withColumn("_boundary", F.coalesce(boundary, F.lit(False)))

    spacer = F.struct(
        F.lit(1).alias("_seq"), *[F.lit("").alias(c) for c in VALID_COLUMNS]
    )
    original = F.struct(
        F.lit(2).alias("_seq"), *[F.col(c).alias(c) for c in VALID_COLUMNS]
    )
    rows = F.when(F.col("_boundary"), F.array(spacer, original)).otherwise(
        F.array(original)
    )
    return (
        flagged.select("release_id", "page_num", "row_idx", F.explode(rows).alias("_r"))
        .select(
            "release_id",
            "page_num",
            "row_idx",
            F.col("_r._seq").alias("_seq"),
            *[F.col(f"_r.{c}").alias(c) for c in VALID_COLUMNS],
        )
    )


def _remove_header_rows(df: DataFrame) -> DataFrame:
    """P3 — drop rows equal to the header after normalization
    (lower, strip, collapse whitespace, space→underscore), compared
    element-wise against every column name (pd_data_cleaner.py:99-118).
    """
    is_header = F.lit(True)
    for c in VALID_COLUMNS:
        is_header = is_header & (norm_header(F.coalesce(F.col(c), F.lit(""))) == c)
    return df.where(~is_header)


def clean_raw_rows(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full cleaner: raw named rows → (records, allocations).

    Input schema: RAW_ROWS_SCHEMA (release_id, page_num, row_idx,
    8 VALID_COLUMNS as nullable strings). Output: RECORDS_SCHEMA,
    ALLOCATIONS_SCHEMA.
    """
    filled = _filled(raw)
    return _records(_grouped(filled)), _allocations(filled)


def clean_records(raw: DataFrame) -> DataFrame:
    """Records output only — builds (and analyzes) just the records
    plan; the allocations branch costs real driver time per call."""
    return _records(_grouped(_filled(raw)))


def clean_allocations(raw: DataFrame) -> DataFrame:
    """Allocations output only (see :func:`clean_records`)."""
    return _allocations(_filled(raw))


def _filled(raw: DataFrame) -> DataFrame:
    """Shared prefix: spacers → header removal → ''→null + ffill —
    the ordered row stream both outputs consume."""
    spaced = _with_group_spacers(raw)
    spaced = _remove_header_rows(spaced)

    # W1 — ""→null then forward-fill the NCA key (pd_data_cleaner.py:31-32)
    spaced = spaced.withColumn(
        "nca_number",
        F.when(_is_empty(F.col("nca_number")), None).otherwise(F.trim("nca_number")),
    )
    filled = forward_fill(
        spaced, "nca_number", partition_by=["release_id"], order_by=_ORDER
    )
    # rows before the first NCA have no key — pandas groupby drops NaN
    # groups (pd_data_cleaner.py:33)
    return filled.where(F.col("nca_number").isNotNull())


_ORDER = ["page_num", "row_idx", "_seq"]
_ALLOC_PARTS = ["agency", "operating_unit", "amount"]


def _grouped(filled: DataFrame) -> DataFrame:
    # A1 — groupBy + ordered collects (records side only; allocations
    # stream straight off the filled rows in _allocations). ONE struct
    # collect + one array_sort per group (the order key is unique per
    # row, so the lexicographic struct sort is exactly the row order),
    # then each field is a projection off the sorted array — instead
    # of a collect_list + sort per field. Record fields take the
    # leading-run join (W3).
    okey = F.struct(*[F.col(c) for c in _ORDER])
    rows_arr = F.array_sort(
        F.collect_list(
            F.struct(okey.alias("_o"), *[F.col(f).alias(f) for f in RECORD_FIELDS])
        )
    )

    def _field(f: str):
        # NB: a plain one-parameter lambda — a `lambda s, f=f:` default
        # arg makes pyspark think it's the (element, index) form.
        return F.transform("_rows", lambda s: s.getField(f))

    return (
        filled.groupBy("release_id", "nca_number")
        .agg(rows_arr.alias("_rows"))
        .select(
            "release_id",
            "nca_number",
            *[leading_run_concat(_field(f)).alias(f) for f in RECORD_FIELDS],
        )
    )


def _records(grouped: DataFrame) -> DataFrame:
    # records (pd_data_cleaner.py:134-141): trim, ISO date coerce
    return grouped.select(
        "nca_number",
        F.trim("nca_type").alias("nca_type"),
        coerce_timestamp_iso(F.trim("released_date")).alias("released_date"),
        F.trim("department").alias("department"),
        F.trim("purpose").alias("purpose"),
        "release_id",
    )


def _allocations(filled: DataFrame) -> DataFrame:
    # allocations (pd_data_cleaner.py:143-173), straight off the
    # filled rows. The reference groups, re-runs spacer insertion on
    # the grouped frame (:149 — on grouped rows every adjacent pair
    # differs, so every group opens with a boundary), explodes, and
    # reassembles segments (:152-163). That per-group leading spacer
    # plus the per-row cumsum means: segment_id = 1 + (# of all-empty
    # rows at-or-before this row within the group) — computable as a
    # W4 window directly over the SAME filled rows the collect would
    # have gathered, in the same order. Dropping the collect→explode
    # round-trip removes a full-width ObjectHashAggregate shuffle of
    # every cell; output is row-for-row identical (oracle-checked).
    all_empty = (
        _is_empty(F.col("agency"))
        & _is_empty(F.col("operating_unit"))
        & _is_empty(F.col("amount"))
    )
    wseg = (
        Window.partitionBy("release_id", "nca_number")
        .orderBy(*_ORDER)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = filled.withColumn(
        "segment_id", F.sum(all_empty.cast("int")).over(wseg) + 1
    )

    # ONE struct collect + one array_sort per segment (okey is unique
    # per row, so the lexicographic struct sort is exactly the row
    # order), then each field is a projection off the sorted array —
    # same single-collect shape as _grouped, instead of a collect_list
    # + array_sort per field (3× the ObjectHashAggregate work).
    okey = F.struct(*[F.col(c) for c in _ORDER])
    rows_arr = F.array_sort(
        F.collect_list(
            F.struct(
                okey.alias("_o"),
                *[F.coalesce(F.col(f), F.lit("")).alias(f) for f in _ALLOC_PARTS],
            )
        )
    )

    def joined(f: str) -> Column:
        # NB: plain one-parameter lambda (see _grouped)
        return F.trim(
            F.concat_ws(" ", F.transform("_rows", lambda s: s.getField(f)))
        )

    assembled = (
        seg.groupBy("release_id", "nca_number", "segment_id")
        .agg(rows_arr.alias("_rows"))
        .select(
            "release_id",
            "nca_number",
            *[joined(f).alias(f) for f in _ALLOC_PARTS],
        )
    )
    # P10 — drop fully-empty reassemblies; P9/F10 — amount coerce, drop
    # unparseable (pd_data_cleaner.py:164-172)
    return (
        assembled.where(
            ~(
                _is_empty(F.col("agency"))
                & _is_empty(F.col("operating_unit"))
                & _is_empty(F.col("amount"))
            )
        )
        .select(
            "nca_number",
            "agency",
            "operating_unit",
            coerce_double(F.col("amount")).alias("amount"),
            "release_id",
        )
        .where(F.col("amount").isNotNull())
    )
