"""Stream-stream interval (attribution) join — the two-feed event
correlation the reference's single-queue pipeline never needed
(§2.9 is one SQS feed), and the canonical Structured Streaming
stream-stream join shape: impressions join clicks that land on the
same key within a bounded event-time window.

Spark's requirements for an inner stream-stream join — a watermark
on BOTH inputs plus a time-RANGE join condition — are exactly what
bounds the state store: each side buffers only rows younger than
(watermark + interval), so a 100 TB/day two-feed correlation holds
hours of state, not history. The same function runs identically on
batch DataFrames (the watermark no-ops, the range condition is just
a join predicate), which is what makes the semantics
oracle-checkable: the catalog's ``view_click_attribution`` runs the
batch twin against DuckDB and the streaming test asserts
stream == batch on the same feed.

Equality on the key rides the range condition into a regular hash
join (state keyed by ``key``); at scale the state store partitions
by key like any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    left_cols: tuple[str, ...] = ("event_id",),
    right_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Inner join ``right`` rows onto ``left`` rows with the same
    ``key`` where ``left_ts <= right_ts <= left_ts + within`` —
    click-attribution semantics (every qualifying pair is emitted;
    dedup-to-first is a downstream ``row_number`` the caller owns).

    Output: ``(key, l_<left_cols...>, r_<right_cols...>,
    lag_seconds)``. Works on two streams (watermarked, bounded
    state), two batch frames (oracle twin), or a mix.
    """
    lw = (
        left.withWatermark(left_ts, watermark) if left.isStreaming else left
    ).select(
        F.col(key).alias("_lk"),
        F.col(left_ts).alias("_lts"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
    )
    rw = (
        right.withWatermark(right_ts, watermark) if right.isStreaming else right
    ).select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond).select(
        F.col("_lk").alias(key),
        *[f"l_{c}" for c in left_cols],
        *[f"r_{c}" for c in right_cols],
        (F.unix_timestamp("_rts") - F.unix_timestamp("_lts")).alias(
            "lag_seconds"
        ),
    )
