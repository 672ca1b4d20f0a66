"""Attribution-shaped facade over the stream-stream interval join.

The core operator is :func:`streaming.events.stream_stream_interval_
join` (watermark on BOTH inputs + a time-range predicate — the
combination that lets Spark evict buffered state, so each side holds
≈ (watermark + interval) of history instead of forever; see its
docstring for the 100 TB state-store analysis). This module adds the
click-attribution PROJECTION a pipeline actually consumes — key +
chosen id columns + integer lag — which is also what makes the
semantics oracle-checkable: the catalog's ``view_click_attribution``
runs the batch twin against DuckDB (floor-epoch lag, exact hash) and
the streaming test asserts stream == batch on the same feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.streaming.events import stream_stream_interval_join


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    left_cols: tuple[str, ...] = ("event_id",),
    right_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Inner join ``right`` rows onto ``left`` rows with the same
    ``key`` where ``left.ts <= right.ts <= left.ts + within`` —
    click-attribution semantics (every qualifying pair is emitted;
    dedup-to-first is a downstream ``row_number`` the caller owns).

    Output: ``(key, l_<left_cols...>, r_<right_cols...>,
    lag_seconds)`` with lag as floor-epoch second difference (the
    integer both engines compute identically on sub-second event
    times). Works on two streams (bounded state), two batch frames
    (the oracle twin), or a mix — delegation to the core operator
    keeps one join implementation.
    """
    j = stream_stream_interval_join(
        left.select(key, ts_col, *left_cols),
        right.select(key, ts_col, *right_cols),
        key=key,
        ts_col=ts_col,
        within=within,
        watermark=watermark,
    )
    lts, rts = f"l_{ts_col}", f"r_{ts_col}"
    return j.select(
        F.col(f"l_{key}").alias(key),
        *[F.col(f"l_{c}") for c in left_cols],
        *[F.col(f"r_{c}") for c in right_cols],
        (F.unix_timestamp(rts) - F.unix_timestamp(lts)).alias("lag_seconds"),
    )
