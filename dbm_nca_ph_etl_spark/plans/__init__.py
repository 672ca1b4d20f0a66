"""Query catalog: named (Spark callable, DuckDB oracle SQL) pairs."""

from dbm_nca_ph_etl_spark.plans.queries import QUERIES, Query

__all__ = ["QUERIES", "Query"]
