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
