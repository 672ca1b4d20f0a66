"""NCA table schemas (reference parity: constants.py:23-53,
supabase_schema.sql:6-41, FIXTURES.md §1-3).

The raw-rows schema makes document order EXPLICIT via
``(page_num, row_idx)`` — the reference relies on implicit pandas row
order; Spark has none, so order is data. ``release_id`` is the
partition key: the engine cleans many releases in one job (the
reference cleans one per Lambda invocation).
"""

from __future__ import annotations

from pyspark.sql import types as T

# physical PDF columns (constants.py:23-34) and the 8 kept after
# projection (constants.py:35-44)
TABLE_COLUMNS = [
    "nca_number",
    "nca_type",
    "approved_date",
    "released_date",
    "department",
    "agency",
    "operating_unit",
    "amount",
    "purpose",
    "remarks",
]
VALID_COLUMNS = [
    "nca_number",
    "nca_type",
    "released_date",
    "department",
    "agency",
    "operating_unit",
    "amount",
    "purpose",
]
RECORD_COLUMNS = [
    "nca_number",
    "nca_type",
    "released_date",
    "department",
    "purpose",
    "release_id",
]
ALLOCATION_COLUMNS = ["nca_number", "agency", "operating_unit", "amount"]

RECORD_FIELDS = ["nca_type", "released_date", "department", "purpose"]
ALLOC_FIELDS = ["agency", "operating_unit", "amount"]

RAW_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("release_id", T.StringType(), False),
        T.StructField("page_num", T.IntegerType(), False),
        T.StructField("row_idx", T.LongType(), False),
    ]
    + [T.StructField(c, T.StringType(), True) for c in VALID_COLUMNS]
)

# raw extraction output: line-ordered rows of nullable cells
RAW_CELLS_SCHEMA = T.StructType(
    [
        T.StructField("release_id", T.StringType(), False),
        T.StructField("page_num", T.IntegerType(), False),
        T.StructField("row_idx", T.LongType(), False),
        T.StructField("cells", T.ArrayType(T.StringType(), True), True),
    ]
)

RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("nca_number", T.StringType(), False),
        T.StructField("nca_type", T.StringType(), True),
        T.StructField("released_date", T.StringType(), True),
        T.StructField("department", T.StringType(), True),
        T.StructField("purpose", T.StringType(), True),
        T.StructField("release_id", T.StringType(), False),
    ]
)

ALLOCATIONS_SCHEMA = T.StructType(
    [
        T.StructField("nca_number", T.StringType(), True),
        T.StructField("agency", T.StringType(), True),
        T.StructField("operating_unit", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("release_id", T.StringType(), False),
    ]
)
