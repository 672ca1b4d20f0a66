"""Sources: testdata catalog, release derivation, PDF table source."""

from dbm_nca_ph_etl_spark.sources.catalog import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
