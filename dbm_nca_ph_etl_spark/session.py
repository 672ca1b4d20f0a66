"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every config here is chosen for
the 1000-executor / 100 TB deployment and merely *also* behaves well
locally:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — at 100 TB the static plan is always wrong
  somewhere; AQE repairs it from runtime stats.
- Arrow on — every pandas-UDF boundary (the PDF extractor, the
  multimodal decoders) pays per-batch, not per-row.
- shuffle partitions sized by env so bench/tests pick a value that
  matches the core count; on a real cluster this would be
  ~2-3x total cores and AQE coalesces the rest.
- broadcast threshold left at default (10 MB) — dimension tables
  (region/nation/supplier and the NCA `release` table) broadcast;
  fact-fact joins shuffle on their keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbm-nca-ph-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else all
    cores); on a cluster the caller passes the real master / lets
    spark-submit decide by passing ``master=""``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def thread_target(spark: SparkSession, fn):
    """Wrap ``fn`` for submission from a driver thread pool
    (guide §2.6 job overlap), robust to the py4j gateway mode.

    ``pyspark.inheritable_thread_target(session)`` is only a
    decorator under pinned-thread mode (the ClientServer gateway,
    PySpark's default); with ``PYSPARK_PIN_THREAD=false`` the
    fallback branch returns the session itself, so calling it with
    ``fn`` raises TypeError. In that mode JVM thread-locals are
    shared process-wide anyway, so the bare ``fn`` is already
    correct — fall through to it.
    """
    from pyspark.util import inheritable_thread_target

    wrapped = inheritable_thread_target(spark)
    if isinstance(wrapped, SparkSession) or not callable(wrapped):
        return fn
    return wrapped(fn)
