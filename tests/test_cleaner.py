"""Golden tests for the NCA cleaner (FIXTURES.md §1 row patterns).

Every fixture row pattern from FIXTURES.md drives a cleaner branch;
expected outputs are hand-derived from the reference semantics
(pd_data_cleaner.py:22-60) — ffill, leading-run joins, spacer
segmentation, coerce casts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dbm_nca_ph_etl_spark.nca import RAW_ROWS_SCHEMA, clean_raw_rows, promote_header
from dbm_nca_ph_etl_spark.nca.schemas import RAW_CELLS_SCHEMA, VALID_COLUMNS


def raw(spark, rows):
    """rows: list of (page, idx, nca, type, date, dept, agency, ou, amount, purpose)"""
    data = [
        Row(
            release_id="id_2024",
            page_num=p,
            row_idx=i,
            nca_number=nca,
            nca_type=t,
            released_date=d,
            department=dept,
            agency=ag,
            operating_unit=ou,
            amount=am,
            purpose=pu,
        )
        for (p, i, nca, t, d, dept, ag, ou, am, pu) in rows
    ]
    return spark.createDataFrame(data, RAW_ROWS_SCHEMA)


def clean(spark, rows):
    rec, alloc = clean_raw_rows(raw(spark, rows))
    recs = {r.nca_number: r.asDict() for r in rec.collect()}
    allocs = sorted(
        (a.nca_number, a.agency, a.operating_unit, a.amount) for a in alloc.collect()
    )
    return recs, allocs


def test_single_record_single_allocation(spark):
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "Regular", "January 5, 2024", "DepEd", "AG1", "OU1", "1,234.56", "To cover salaries"),
        ],
    )
    assert recs["NCA-1"]["nca_type"] == "Regular"
    assert recs["NCA-1"]["released_date"] == "2024-01-05T00:00:00"
    assert recs["NCA-1"]["department"] == "DepEd"
    assert recs["NCA-1"]["purpose"] == "To cover salaries"
    assert recs["NCA-1"]["release_id"] == "id_2024"
    assert allocs == [("NCA-1", "AG1", "OU1", 1234.56)]


def test_ffill_continuation_lines(spark):
    """Pattern 2: continuation lines inherit the NCA above (W1)."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "Regular", "01/05/2024", "DepEd", "AG one", "OU1", "", "To cover"),
            (0, 1, "", "", "", "", "line two", "", "999.99", "the requirements"),
        ],
    )
    assert set(recs) == {"NCA-1"}
    # wrapped allocation text joins with spaces across continuation lines
    assert allocs == [("NCA-1", "AG one line two", "OU1", 999.99)]
    # record fields join leading runs across lines
    assert recs["NCA-1"]["purpose"] == "To cover the requirements"


def test_leading_run_break(spark):
    """Pattern 3: leading-run join stops at first empty (W3) — stray
    text after a blank does NOT belong to the record."""
    recs, _ = clean(
        spark,
        [
            (0, 0, "NCA-1", "Regular", "01/05/2024", "DepEd", "AG", "OU", "10", "To cover"),
            (0, 1, "", "", "", "", "", "", "", "requirements of"),
            (0, 2, "", "", "", "", "", "", "", ""),
            (0, 3, "", "", "", "", "", "", "", "stray text"),
        ],
    )
    assert recs["NCA-1"]["purpose"] == "To cover requirements of"


def test_multiple_allocations_split_by_blank_rows(spark):
    """Pattern 4: all-empty allocation cells split allocations (W4)."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "Regular", "01/05/2024", "DepEd", "AG1", "OU1", "100.50", "P"),
            (0, 1, "", "", "", "", "", "", "", ""),
            (0, 2, "", "", "", "", "AG2", "OU2", "200.25", ""),
        ],
    )
    assert allocs == [("NCA-1", "AG1", "OU1", 100.5), ("NCA-1", "AG2", "OU2", 200.25)]


def test_amount_coercion_and_drop(spark):
    """Pattern 6: comma-strip + coerce; junk amounts drop the row (P9/F10)."""
    _, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "R", "01/05/2024", "D", "AG1", "OU1", "1,234,567.89", "P"),
            (0, 1, "", "", "", "", "", "", "", ""),
            (0, 2, "", "", "", "", "AG2", "OU2", "N/A", ""),
        ],
    )
    assert allocs == [("NCA-1", "AG1", "OU1", 1234567.89)]


def test_adjacent_ncas_no_blank_line(spark):
    """Pattern 7: adjacent distinct NCAs — spacer insertion (W2)
    prevents the second NCA's allocation from merging into the first."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "R", "01/05/2024", "D1", "AG1", "OU1", "100", "P1"),
            (0, 1, "NCA-2", "S", "01/06/2024", "D2", "AG2", "OU2", "200", "P2"),
        ],
    )
    assert set(recs) == {"NCA-1", "NCA-2"}
    assert allocs == [("NCA-1", "AG1", "OU1", 100.0), ("NCA-2", "AG2", "OU2", 200.0)]


def test_repeated_header_rows_removed(spark):
    """Pattern 1: repeated header lines (any case/whitespace) drop (P3)."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "R", "01/05/2024", "D", "AG1", "OU1", "100", "P"),
            (1, 1, "NCA Number", "NCA  Type", "Released Date", "Department", "Agency", "Operating  Unit", "Amount", "Purpose"),
            (1, 2, "", "", "", "", "more ag", "", "", ""),
        ],
    )
    assert set(recs) == {"NCA-1"}
    # Reference subtlety: the spacer inserted BEFORE the header row
    # (raw nca "NCA Number" is non-empty and differs) lands at the end
    # of NCA-1's group after ffill, so "more ag" starts a NEW
    # allocation — whose empty amount then drops it (P9). The engine
    # reproduces this exactly.
    assert allocs == [("NCA-1", "AG1", "OU1", 100.0)]


def test_leading_junk_rows_dropped(spark):
    """Pattern 8: rows before the first NCA have no key after ffill
    and vanish (NaN-group drop, P5)."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "", "", "", "", "orphan", "", "42", ""),
            (0, 1, "NCA-1", "R", "01/05/2024", "D", "AG1", "OU1", "100", "P"),
        ],
    )
    assert set(recs) == {"NCA-1"}
    assert allocs == [("NCA-1", "AG1", "OU1", 100.0)]


def test_whitespace_trim(spark):
    """Pattern 10: leading/trailing whitespace trims everywhere (P7)."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "  Regular  ", " 01/05/2024 ", " DepEd ", " AG1 ", " OU1 ", " 100 ", " P "),
        ],
    )
    assert recs["NCA-1"]["nca_type"] == "Regular"
    assert recs["NCA-1"]["department"] == "DepEd"
    assert recs["NCA-1"]["released_date"] == "2024-01-05T00:00:00"
    assert allocs == [("NCA-1", "AG1", "OU1", 100.0)]


def test_unparseable_date_coerces_to_null(spark):
    recs, _ = clean(
        spark,
        [(0, 0, "NCA-1", "R", "not a date", "D", "AG", "OU", "1", "P")],
    )
    assert recs["NCA-1"]["released_date"] is None


def test_cross_page_group(spark):
    """Pattern 9: an NCA spanning a page boundary stays one group —
    the engine cleans whole releases, fixing the reference's
    batch-boundary duplication hazard (SURVEY §2.9 T6)."""
    recs, allocs = clean(
        spark,
        [
            (0, 0, "NCA-1", "R", "01/05/2024", "D", "AG1", "OU1", "100", "P"),
            (0, 1, "", "", "", "", "", "", "", ""),
            (1, 2, "", "", "", "", "AG2", "OU2", "200", ""),
        ],
    )
    assert set(recs) == {"NCA-1"}
    assert allocs == [("NCA-1", "AG1", "OU1", 100.0), ("NCA-1", "AG2", "OU2", 200.0)]


def test_multi_release_independence(spark):
    """Engine extension: many releases in one pass, partitioned."""
    df1 = raw(spark, [(0, 0, "NCA-1", "R", "01/05/2024", "D", "A", "O", "1", "P")])
    df2 = df1.withColumn("release_id", df1.release_id.substr(0, 0))  # dummy, replaced below
    import pyspark.sql.functions as F

    df2 = df1.withColumn("release_id", F.lit("id_2025"))
    rec, alloc = clean_raw_rows(df1.unionByName(df2))
    assert rec.count() == 2
    assert alloc.count() == 2
    assert set(r.release_id for r in rec.collect()) == {"id_2024", "id_2025"}


def test_promote_header(spark):
    rows = [
        Row(release_id="id_2024", page_num=0, row_idx=0,
            cells=["NCA Number", "NCA Type", "Approved Date", "Released Date",
                   "Department", "Agency", "Operating Unit", "Amount", "Purpose", "Remarks"]),
        Row(release_id="id_2024", page_num=0, row_idx=1,
            cells=["NCA-1", "Regular", "01/01/2024", "01/05/2024",
                   "DepEd", "AG1", "OU1", "100", "salaries", "n/a"]),
    ]
    df = spark.createDataFrame(rows, RAW_CELLS_SCHEMA)
    out = promote_header(df)
    assert out.columns == ["release_id", "page_num", "row_idx"] + VALID_COLUMNS
    r = out.collect()[0]
    # approved_date and remarks projected away (P2)
    assert r.nca_number == "NCA-1" and r.released_date == "01/05/2024"
    assert r.agency == "AG1" and r.purpose == "salaries"


def test_empty_input(spark):
    rec, alloc = clean_raw_rows(
        spark.createDataFrame([], RAW_ROWS_SCHEMA)
    )
    assert rec.count() == 0 and alloc.count() == 0
