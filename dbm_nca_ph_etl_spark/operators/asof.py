"""As-of (point-in-time) join and range/interval join.

Neither exists as a Spark built-in (the reference has no joins at all
— SURVEY §2.5; these are north-star extension operators, the "as-of
join, range join" family a training-data pipeline needs for
point-in-time feature lookup and event-window attribution).

Both are implemented as compositions of existing DataFrame ops — no
UDFs, no driver loops — with shapes chosen for 100 TB:

- :func:`asof_join` — the naive formulation is a range join (for
  every left row, the max right ts ≤ left ts), which Spark executes
  as BroadcastNestedLoop or a skew-prone theta join. Instead: tag
  both sides, union them, and run ONE ``last(ignorenulls)`` window
  per key ordered by (ts, side) — every left row sees the latest
  right payload at-or-before it. One shuffle on the key, linear in
  rows, no candidate blow-up, AQE-friendly. Equal timestamps match
  (inclusive), matching DuckDB's ``ASOF JOIN`` which is the oracle.
- :func:`range_join_buckets` — event-to-interval join. A raw
  ``BETWEEN`` theta join is quadratic per key; bucketing the time
  axis at ``bucket_width`` (≥ the max interval length) turns it into
  an equi-join on (key, bucket) with each interval replicated to the
  ≤2 buckets it spans, then an exact range filter. Candidate pairs
  are bounded by bucket co-residency instead of |left|×|intervals|
  per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the payload of the closest right row
    at-or-before (``backward``) / at-or-after (``forward``) its
    timestamp, per ``on`` key — pandas ``merge_asof`` semantics, as a
    single keyed window pass.

    ``ts_col`` must be numeric (epoch); ``tolerance`` is in the same
    unit — matches farther away than it are nulled, like merge_asof.
    Right payload columns arrive as ``{prefix}{col}`` plus
    ``{prefix}ts`` (null when no match). Left rows and columns are
    preserved.

    Ties: right rows sort before left rows at equal ts (inclusive
    match); among equal-ts right rows the LAST in (ts, payload)
    order wins — deterministic for unique (key, ts) right sides.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload_cols = list(payload_cols)

    payload = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    # side orders right (0) before left (1) at equal ts for backward —
    # and after it for forward (where the scan order is reversed).
    r = right.select(
        *on,
        F.col(ts_col).alias("_ats"),
        F.lit(0 if direction == "backward" else 2).alias("_aside"),
        payload.alias("_apayload"),
    )
    l = left.select(
        "*",
        F.col(ts_col).alias("_ats"),
        F.lit(1).alias("_aside"),
        F.lit(None).cast(r.schema["_apayload"].dataType).alias("_apayload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    order = [F.col("_ats").asc(), F.col("_aside").asc()]
    if direction == "forward":
        order = [F.col("_ats").desc(), F.col("_aside").desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_amatch", F.last("_apayload", ignorenulls=True).over(w)
    ).where(F.col("_aside") == 1)

    if tolerance is not None:
        dist = (
            F.col("_ats") - F.col("_amatch.ts")
            if direction == "backward"
            else F.col("_amatch.ts") - F.col("_ats")
        )
        matched = matched.withColumn(
            "_amatch", F.when(dist <= F.lit(tolerance), F.col("_amatch"))
        )

    out_cols = [c for c in left.columns] + [
        F.col("_amatch.ts").alias(f"{prefix}ts"),
        *[F.col(f"_amatch.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    ]
    return matched.select(*out_cols)


def range_join_buckets(
    left: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of left rows to every interval containing their
    timestamp (``start ≤ ts ≤ end``, per ``on`` key), as a bucketed
    equi-join.

    ``bucket_width`` must be ≥ the longest interval so each interval
    spans ≤ 2 buckets; intervals are exploded to their buckets
    (``sequence`` — no driver loop), left rows map to exactly one
    bucket, and the equi-join on (key, bucket) bounds candidates
    before the exact ``BETWEEN`` filter. No duplicate pairs: a left
    row lives in one bucket, and an interval appears once per bucket.
    """
    on = list(on)
    b_start = (F.col(start_col) / bucket_width).cast("long")
    b_end = (F.col(end_col) / bucket_width).cast("long")
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(b_start, b_end)))
    lt = left.withColumn("_bucket", (F.col(ts_col) / bucket_width).cast("long"))
    joined = lt.join(iv, on + ["_bucket"]).where(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")
