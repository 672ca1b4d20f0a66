"""NCA pipeline: the reference's transform stage as pure DataFrame ops."""

from dbm_nca_ph_etl_spark.nca.cleaner import clean_raw_rows, promote_header
from dbm_nca_ph_etl_spark.nca.schemas import (
    ALLOCATION_COLUMNS,
    RAW_ROWS_SCHEMA,
    RECORD_COLUMNS,
    VALID_COLUMNS,
)

__all__ = [
    "ALLOCATION_COLUMNS",
    "RAW_ROWS_SCHEMA",
    "RECORD_COLUMNS",
    "VALID_COLUMNS",
    "clean_raw_rows",
    "promote_header",
]
