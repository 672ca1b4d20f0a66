"""Bucketed parquet layout — co-located joins/aggs without a shuffle.

At 100 TB the dominant cost of the star-schema joins (orders ⋈
customer, lineitem ⋈ orders) and of any repeated groupBy on the same
key is the hash exchange of the fact table: every query re-shuffles
hundreds of terabytes to co-locate keys. Bucketing spends that
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows
into ``n`` files per write-task by key, and records the layout in the
table catalog. Catalyst then plans joins/aggregations between tables
bucketed on the same key with the same bucket count as
exchange-free — the SortMergeJoin (or hash agg) reads matching
buckets pairwise.

This is the lake equivalent of the reference's FK-key carriage
(SURVEY §2.5 J2): `record.release_id` / `allocation.nca_number` are
always joined on the same keys, so the NCA store's natural layout is
record+allocation bucketed by ``nca_number``.

Sizing rule for 100 TB: pick ``num_buckets`` so one bucket of the
biggest table ≈ 128-256 MB compressed (e.g. 100 TB fact → ~500k
buckets is wrong — cap at ~32k and accept multi-file buckets; Spark
only needs bucket-count equality between join sides, not tiny files).
Every writer task emits one file per non-empty bucket, so repartition
by the bucket key first to keep file counts = num_buckets.

Requires ``saveAsTable`` (bucket metadata lives in the catalog, not
in parquet), so callers name tables; ``path=`` pins the data to an
external location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers compose filters)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet catalog table.

    ``sort_cols`` (default: the bucket key) pre-sorts rows inside each
    bucket file, letting a later SortMergeJoin skip its sort stage and
    giving min/max row-group pruning on the sort key.

    The ``repartition`` on the bucket key makes writer-task count ==
    key-partition count so each bucket is written by exactly one task
    (num_buckets files total, not tasks × buckets).
    """
    writer = (
        df.repartition(num_buckets, *bucket_cols)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table. Must go through the catalog —
    ``spark.read.parquet(path)`` on the same files would DROP the
    bucket metadata and re-shuffle on every join."""
    return spark.table(table)


def cobucket_tables(
    spark: SparkSession,
    frames: dict[str, tuple[DataFrame, list[str]]],
    num_buckets: int,
    base_path: str | None = None,
) -> dict[str, DataFrame]:
    """Bucket a set of tables for mutual co-located joins.

    ``frames`` maps table name → (df, join key cols). All tables get
    the SAME ``num_buckets`` — bucket-join planning requires it (a
    2-bucket × 4-bucket join still shuffles the smaller side).
    Returns the catalog-backed DataFrames.
    """
    out: dict[str, DataFrame] = {}
    for name, (df, keys) in frames.items():
        write_bucketed(
            df,
            name,
            keys,
            num_buckets,
            path=None if base_path is None else f"{base_path}/{name}",
        )
        out[name] = read_bucketed(spark, name)
    return out
