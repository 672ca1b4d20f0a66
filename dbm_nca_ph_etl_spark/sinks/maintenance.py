"""Lake maintenance: small-file compaction + sort-clustered layout.

Micro-batch loaders (streaming/nca_stream.py appends one directory of
part files per batch) and fine-grained task parallelism both produce
small-file sprawl; at 100 TB the scan's task count — and the
NameNode/object-store listing cost — is driven by file count, so
periodic compaction is part of the engine, not an ops afterthought
(the reference's Postgres sink has no analog: supabase_repository.py
chunks INSERTS, the database owns the layout).
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def _local_path(uri: str) -> str:
    p = urlparse(uri)
    return p.path if p.scheme in ("file", "") else uri


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` with ~target-sized files.

    Returns the output file count. The write goes to a NEW directory —
    Spark cannot overwrite a path it is lazily reading, and a
    fresh-directory + rename swap is the atomic pattern on object
    stores anyway (the caller owns the swap; a table format's commit
    log would subsume this).

    File count = ceil(current_bytes / target): compaction math uses
    the real on-disk (compressed) size via the scan's file listing,
    not row counts — row width varies, bytes are what the next scan
    pays for. ``repartition`` (not ``coalesce``): coalesce chains
    narrow dependencies and would make the WRITE tasks read many
    source files each without rebalancing skew; a real shuffle gives
    uniformly sized outputs, which is the point of compacting.
    """
    df = spark.read.parquet(src_path)
    files = df.inputFiles()
    total = sum(os.path.getsize(_local_path(f)) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n_out).write.mode("error").parquet(dst_path)
    return n_out


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Sort-clustered parquet write: range-partition by ``sort_cols``
    then sort within each task, so every part file holds a contiguous
    key range and its parquet footer min/max stats are TIGHT.

    Why it matters at 100 TB: a point/range predicate on the sort key
    then skips whole files (and row groups within the survivors) from
    footer stats alone — the scan reads O(matching range), not
    O(table). This is the 1-D clustering analog of Z-ordering; for
    multi-column predicates prefer the leading column with the most
    selective workload filters (same reasoning as index prefix
    choice). The layout property (pairwise-disjoint per-file ranges)
    is asserted by test_sinks directly from the parquet footers.

    One extra range shuffle per write — amortized over every future
    read that prunes. Combine with hive partitioning
    (sinks/partitioned.py) for the coarse cut + this for intra-
    partition clustering.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
