from dbm_nca_ph_etl_spark.sinks.merge import (
    NCAStore,
    append_parquet,
    delete_by_keys,
    upsert_parquet,
)

__all__ = ["NCAStore", "append_parquet", "delete_by_keys", "upsert_parquet"]
