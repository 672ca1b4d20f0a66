"""Scalar function kernel (SURVEY.md §2.8, F1-F14).

Every scalar transform the reference performs, as JVM-side column
expressions — no Python UDFs anywhere in this module, so all of it
stays inside whole-stage codegen.
"""

from dbm_nca_ph_etl_spark.functions.scalars import (
    coerce_double,
    coerce_timestamp_iso,
    collapse_ws,
    filename_from_url,
    hash64,
    hash_bucket,
    norm_header,
    release_id_for_year,
    year_from_filename,
)

__all__ = [
    "coerce_double",
    "coerce_timestamp_iso",
    "collapse_ws",
    "filename_from_url",
    "hash64",
    "hash_bucket",
    "norm_header",
    "release_id_for_year",
    "year_from_filename",
]
