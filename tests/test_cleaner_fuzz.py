"""Differential fuzz: the Spark cleaner vs an independent row-loop
model of the reference semantics.

The catalog's nca_clean_* oracle is one (large, adversarial) synthetic
document; this test closes the remaining gap with *arbitrary* small
documents: a ~60-line pure-Python interpreter of the reference
cleaning rules (pd_data_cleaner.py:22-173 — spacer insertion, header
removal, forward-fill, leading-run joins, segment reassembly, coerce
casts), written from the SURVEY §2 semantics, is hypothesis-compared
against ``clean_records``/``clean_allocations`` on randomized raw
documents. Any divergence in group boundaries, run-breaking, spacer
interaction, or cast edge cases shows up as a counterexample document.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbm_nca_ph_etl_spark.nca.cleaner import clean_allocations, clean_records

# Gated (r12): slow integration suite — hypothesis fuzz vs the reference model (~20 s).
# Skipped by a plain `pytest tests/` (driver budget); SPARK_GRAFT_SLOW_TESTS=1
# (set by tools/gate.py) runs it.
pytestmark = pytest.mark.slow


COLS = [
    "nca_number", "nca_type", "released_date", "department",
    "agency", "operating_unit", "amount", "purpose",
]
RECORD_FIELDS = ["nca_type", "released_date", "department", "purpose"]
ALLOC_FIELDS = ["agency", "operating_unit", "amount"]

HEADER_ROW = {
    "nca_number": "NCA Number", "nca_type": "NCA  Type",
    "released_date": "released date", "department": "Department",
    "agency": "AGENCY", "operating_unit": "Operating Unit",
    "amount": "Amount", "purpose": " Purpose ",
}


def _empty(v) -> bool:
    return v is None or str(v).strip() == ""


def _model(rows):
    """Reference-semantics interpreter: rows (ordered dicts) →
    (records, allocations) as sorted tuple lists."""
    # spacer insertion (pd_data_cleaner.py:70-97)
    spaced = []
    prev_nca = None
    for r in rows:
        nca = r["nca_number"]
        if (
            not _empty(nca)
            and prev_nca is not None
            and not _empty(prev_nca)
            and nca != prev_nca
        ):
            spaced.append({c: "" for c in COLS})
        spaced.append(dict(r))
        prev_nca = nca
    # header-row removal (:99-118)
    def norm(v):
        return " ".join(str(v or "").lower().split()).replace(" ", "_")

    spaced = [
        r for r in spaced if not all(norm(r[c]) == c for c in COLS)
    ]
    # ''→None + forward-fill the key, drop keyless (:31-33)
    filled = []
    cur = None
    for r in spaced:
        if not _empty(r["nca_number"]):
            cur = str(r["nca_number"]).strip()
        if cur is not None:
            filled.append((cur, r))
    # group in document order
    groups: dict[str, list[dict]] = {}
    for key, r in filled:
        groups.setdefault(key, []).append(r)

    records = []
    allocations = []
    for nca, grp in groups.items():
        # records: leading-run join per field (:120-132)
        rec = {}
        for f in RECORD_FIELDS:
            run = []
            for r in grp:
                if _empty(r[f]):
                    break
                run.append(str(r[f]))
            rec[f] = " ".join(run).strip()
        # date coerce to ISO (:135-137); generator emits MM/dd/yyyy or junk
        try:
            d = datetime.datetime.strptime(rec["released_date"], "%m/%d/%Y")
            iso = d.strftime("%Y-%m-%dT%H:%M:%S")
        except ValueError:
            iso = None
        records.append(
            (nca, rec["nca_type"], iso, rec["department"], rec["purpose"], "rel_1")
        )
        # allocations: segment on all-empty alloc cells (:149-163)
        segs: dict[int, list[dict]] = {}
        seg_id = 0
        for r in grp:
            if all(_empty(r[f]) for f in ALLOC_FIELDS):
                seg_id += 1
            segs.setdefault(seg_id, []).append(r)
        for seg in segs.values():
            parts = {
                f: " ".join(str(r[f]) if r[f] is not None else "" for r in seg).strip()
                for f in ALLOC_FIELDS
            }
            if all(v == "" for v in parts.values()):
                continue
            try:
                amount = float(parts["amount"].replace(",", ""))
            except ValueError:
                continue
            allocations.append(
                (nca, parts["agency"], parts["operating_unit"], amount, "rel_1")
            )
    return sorted(records), sorted(
        allocations, key=lambda t: (t[0], t[1], t[2], t[3])
    )


nca_cell = st.sampled_from(["", "NCA-1", "NCA-2", "NCA-3", None])
text_cell = st.sampled_from(["", "x", "y y", " z ", "wrapped text", None])
date_cell = st.sampled_from(["", "06/15/2021", "01/02/2020", "junk", None])
amount_cell = st.sampled_from(
    ["", "1,234.50", "7.25", "N/A", "0", "-3.5", None]
)

row_strategy = st.one_of(
    st.just(dict(HEADER_ROW)),
    st.fixed_dictionaries(
        {
            "nca_number": nca_cell,
            "nca_type": text_cell,
            "released_date": date_cell,
            "department": text_cell,
            "agency": text_cell,
            "operating_unit": text_cell,
            "amount": amount_cell,
            "purpose": text_cell,
        }
    ),
)


@settings(max_examples=12, deadline=None)
@given(rows=st.lists(row_strategy, min_size=0, max_size=12))
def _check_doc(spark, rows):
    data = [
        ("rel_1", 0, i, *[r[c] for c in COLS]) for i, r in enumerate(rows)
    ]
    schema = (
        "release_id string, page_num int, row_idx long, "
        + ", ".join(f"{c} string" for c in COLS)
    )
    raw = spark.createDataFrame(data, schema)
    got_records = sorted(tuple(r) for r in clean_records(raw).collect())
    got_allocs = sorted(
        (tuple(r) for r in clean_allocations(raw).collect()),
        key=lambda t: (t[0], t[1], t[2], t[3]),
    )
    want_records, want_allocs = _model(rows)
    assert got_records == want_records
    assert got_allocs == want_allocs


def test_cleaner_matches_reference_model(spark):
    _check_doc(spark)
