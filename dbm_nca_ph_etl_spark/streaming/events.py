"""Event-time window operators (north-star extension; SURVEY §2.11).

The reference has no event-time engine (its "streaming" is SQS
micro-batching, §2.9) — these operators are the extension surface the
`events` testdata exists for. Each works identically on batch and
streaming DataFrames; on a stream the watermark bounds state so a
100 TB/day event feed ages out window state instead of accumulating
it. All pure built-ins (``window`` / ``session_window`` generate
expressions inside codegen; the aggregation is a hash agg partial →
final on the window+key shuffle).

Timestamps are emitted as formatted strings so oracle comparison is
timezone/precision-proof (catalog convention, plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FMT = "yyyy-MM-dd HH:mm:ss"


def _watermarked(events: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Apply the watermark only on streams (batch plans don't need
    one). Spark requires the event-time column to be LTZ `timestamp`
    on streams — cast NTZ columns before streaming (the catalog's
    batch `events.ts` is NTZ for oracle timezone-proofing; a real feed
    arrives as epoch/LTZ anyway)."""
    return events.withWatermark(ts_col, delay) if events.isStreaming else events


def tumbling_window_counts(
    events: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
    key: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(window, key) count + value sum over fixed windows."""
    w = F.window(ts_col, width)
    return (
        _watermarked(events, ts_col, watermark)
        .groupBy(w.alias("w"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            key,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping-window counts: each event lands in width/slide
    windows (Spark expands this without a self-join)."""
    w = F.window(ts_col, width, slide)
    return (
        _watermarked(events, ts_col, watermark)
        .groupBy(w.alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            key,
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessions per key via ``session_window`` — the
    streaming-native twin of the batch lag/cumsum sessionizer
    (operators/windows.sessionize); state is merged incrementally
    instead of re-sorted, so an always-on stream needs no full-key
    shuffle history."""
    w = F.session_window(ts_col, gap)
    return (
        _watermarked(events, ts_col, watermark)
        .groupBy(w.alias("w"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col(key),
            F.date_format("w.start", _FMT).alias("session_start"),
            F.date_format("w.end", _FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def daily_active_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 day",
) -> DataFrame:
    """EXACT daily distinct active users at ingest — the streaming
    twin of the batch ``rolling_dau_7d`` discipline: deduplicate down
    to the (user, event-time day window) GRID first, then count the
    grid. ``dropDuplicates`` keyed on the window column (event-time
    derived, so it carries the watermark) lets Spark EVICT dedup
    state once a day closes — state is one entry per (user, open
    day), never the raw stream. Works identically on batch frames
    (no watermark, plain distinct-then-count semantics). Use update
    output mode on streams: a day's count grows as its batches land
    and stops changing one watermark past day end."""
    day = F.window(ts_col, "1 day")
    grid = (
        _watermarked(events, ts_col, watermark)
        .select(F.col(user_col), day.alias("w"))
        .dropDuplicates([user_col, "w"])
    )
    return (
        grid.groupBy("w")
        .agg(F.count(F.lit(1)).alias("dau"))
        .select(F.date_format("w.start", _FMT).alias("day_start"), "dau")
    )


def daily_active_users_approx(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 day",
    rsd: float = 0.02,
) -> DataFrame:
    """APPROXIMATE daily distinct actives — ``approx_count_distinct``
    (HyperLogLog++) per event-time day. The scale contrast with the
    exact twin is the state shape: exact keeps one dedup entry per
    (user, open day) — O(users/day), real memory at 10⁹ users —
    while the sketch keeps O(2^p) registers per open day regardless
    of cardinality, the same estimate-vs-exact trade the hll matview
    measure makes at rest. ``rsd`` is the target relative standard
    deviation (0.02 ≈ 2^12 registers)."""
    day = F.window(ts_col, "1 day")
    return (
        _watermarked(events, ts_col, watermark)
        .groupBy(day.alias("w"))
        .agg(F.approx_count_distinct(user_col, rsd).alias("dau_approx"))
        .select(
            F.date_format("w.start", _FMT).alias("day_start"), "dau_approx"
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "5 minutes",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with the
    right events of the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + within]`` — the click→error attribution /
    impression→conversion shape.

    Both sides carry watermarks and the join condition bounds the
    time skew, which is what lets Spark EVICT buffered state: without
    the interval bound a stream-stream equi-join must hold both
    streams forever. State per side ≈ (watermark + within) of data —
    at 100 TB/day this is the difference between a bounded state
    store and an unbounded one. Works identically on batch frames
    (no watermark applied; same join condition) so the streaming
    result is directly testable against the batch answer.

    Output columns are prefixed (``l_``/``r_``) — stream-stream joins
    forbid post-join renames of the event-time columns, so the
    projection happens before the join.
    """
    lcols = [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    lw = _watermarked(left, ts_col, watermark).select(*lcols)
    rw = _watermarked(right, ts_col, watermark).select(*rcols)
    lts, rts = f"{left_prefix}{ts_col}", f"{right_prefix}{ts_col}"
    cond = (
        (F.col(f"{left_prefix}{key}") == F.col(f"{right_prefix}{key}"))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Cross-batch exact deduplication with BOUNDED state —
    ``dropDuplicatesWithinWatermark``: the at-least-once ingestion
    answer (the reference's SQS redelivery, T6) when the replay
    horizon is known.

    Plain ``dropDuplicates`` on a stream keeps every key seen FOREVER
    (state grows with the corpus — unusable at 100 TB/day); this
    keeps a key only until the watermark passes its first-seen event
    time + ``delay``, so state ≈ one replay horizon of keys.
    Contract: duplicates arriving within ``delay`` of the first copy
    are dropped exactly; a redelivery after eviction would pass — so
    size ``delay`` to the queue's max redelivery window (the
    reference's SQS visibility timeout is 600 s, initialize_aws.py),
    and keep the downstream sink idempotent (sinks/merge.py) as the
    backstop. Unlike full dropDuplicates, the event-time column
    itself may differ between copies (redeliveries re-stamp); only
    ``keys`` participate in identity.
    """
    return _watermarked(events, ts_col, delay).dropDuplicatesWithinWatermark(keys)
