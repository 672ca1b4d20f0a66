"""Custom stateful streaming operators (``applyInPandasWithState``).

The LLM-pipeline dedup operators (operators/dedup.py) are batch
passes; on an always-on ingest feed dedup must remember what it has
seen *across micro-batches*. ``streaming_dedup`` keeps one boolean
per key in the state store and emits only each key's first-ever
arrival — exact dedup over an unbounded stream with O(distinct keys)
state, the streaming twin of ``dropDuplicates``. (Stock streaming
``dropDuplicates`` holds whole rows and offers no per-key emission
hook; the pandas-with-state form is the extension point where
fingerprint/MinHash variants slot in — swap the key extractor, keep
the state machine.)

State is partitioned by key hash, so a 10^10-key corpus spreads its
state across the cluster; pair with watermark-based state TTL
(``GroupStateTimeout``) when keys age out (e.g. URL dedup over a
crawl window). This op is genuinely non-SQL-expressible — it is
verified by streaming tests (tests/test_streaming.py), not a DuckDB
oracle (SURVEY §5 weaker-check note).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame,
    key_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Emit the first row seen per ``key_col`` across the stream's
    lifetime. Within one micro-batch, ``order_col`` (ascending, if
    given) picks the winner; otherwise arrival order.
    """
    schema = stream.schema

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(order_col) if order_col else pdf
            head = cand.head(1)
            if first is None:
                first = head
            elif order_col is not None:
                both = pd.concat([first, head]).sort_values(order_col)
                first = both.head(1)
        if first is not None:
            state.update((True,))
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _quota_gate(
    tokens_col: str,
    order_col: str,
    budget: int,
    declared: list[str],
    ttl_ms: int | None,
):
    """The quota state machine, factored out so tests can drive it
    with a fake GroupState (processing-time timeouts are impractical
    to trigger deterministically inside an availableNow test run)."""

    def gate(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # rolling window expired: forget the counter — the key's
            # budget refills for the next window
            state.remove()
            return
        total = int(state.get[0]) if state.exists else 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
            accepted, used_after = [], []
            for n in pdf[tokens_col].astype("int64"):
                ok = total + int(n) <= budget
                if ok:
                    total += int(n)
                accepted.append(ok)
                used_after.append(total)
            pdf["key"] = key[0]
            pdf["accepted"] = accepted
            pdf["used_after"] = pd.Series(used_after, dtype="int64")
            yield pdf[declared]
        state.update((total,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return gate


def streaming_source_quota(
    stream: DataFrame,
    key_col: str,
    tokens_col: str,
    order_col: str,
    budget: int,
    payload_cols: Iterable[str] = (),
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key token-budget admission gate over an unbounded stream
    (``applyInPandasWithState``, same arbitrary-state extension point
    as ``streaming_dedup`` above — one cumulative-long value state per
    key).

    Corpus-mixing enforcement at ingest time: every key (source /
    domain / language) may contribute at most ``budget`` tokens to
    the output mix; once a source's cumulative accepted tokens would
    exceed the budget, further documents are emitted with
    ``accepted=false`` (audit trail, not silent drop). The cumulative
    counter is a single long per key — O(#keys) state, partitioned by
    key hash across the cluster. ``ttl_ms`` turns the lifetime budget
    into a ROLLING-WINDOW quota: each batch a key appears in re-arms a
    processing-time timeout; once the key stays quiet for ``ttl_ms``,
    its counter is dropped and the budget refills (also the state-GC
    story — idle keys age out instead of accumulating forever).

    Rows are processed in ``order_col`` order within each micro-batch
    (deterministic admission under replay; cross-batch order is
    arrival order, as with any streaming gate).

    .. note:: Spark 4's ``transformWithStateInPandas`` would also
       express this, but its Python worker requires ``protobuf`` at
       runtime; ``applyInPandasWithState`` has no extra dependency and
       the state machine is identical (one bigint per key).
    """
    out_cols = [order_col, tokens_col, *payload_cols]
    declared = ["key", *out_cols, "accepted", "used_after"]
    out_schema = ", ".join(
        [f"key {stream.schema[key_col].dataType.simpleString()}"]
        + [f"{c} {stream.schema[c].dataType.simpleString()}" for c in out_cols]
        + ["accepted boolean", "used_after bigint"]
    )

    return (
        stream.select(key_col, *out_cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            _quota_gate(tokens_col, order_col, budget, declared, ttl_ms),
            outputStructType=out_schema,
            stateStructType="used bigint",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def streaming_simhash_dedup(
    stream: DataFrame,
    hash_col: str,
    order_col: str | None = None,
    bits: int = 32,
    prefix_bits: int = 12,
    max_hamming: int = 3,
) -> DataFrame:
    """Cross-batch NEAR-duplicate dedup — the fingerprint variant of
    :func:`streaming_dedup` (same state machine, swapped key
    extractor, as the module docstring promises).

    Rows carry a precomputed SimHash fingerprint (``hash_col``;
    ``operators.dedup.simhash`` computes one per row in codegen —
    ``stream.withColumn("simhash", simhash(col("text")))`` upstream).
    The stream is bucketed by the fingerprint's top ``prefix_bits``;
    within a bucket a row is emitted only if every previously-seen
    fingerprint differs by more than ``max_hamming`` bits, otherwise
    it is a near-dup of an earlier document and is dropped. State per
    bucket is the array of accepted fingerprints — O(survivors), hash
    partitioned across the cluster by bucket.

    LSH caveat (same trade as the batch banding operators): near-dups
    whose fingerprints differ inside the prefix land in different
    buckets and are missed; lower ``prefix_bits`` (bigger buckets,
    more state scanned) or run multi-table prefixes for higher
    recall. Within one micro-batch, ``order_col`` ascending decides
    survivor order (deterministic replay), else arrival order.
    """
    out_schema = stream.schema

    def gate(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if pdf.empty:
                continue
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            keep = []
            for pos, h in zip(pdf.index, pdf[hash_col].astype("int64")):
                h = int(h)
                if all(bin(h ^ s).count("1") > max_hamming for s in seen):
                    seen.append(h)
                    keep.append(pos)
            if keep:
                yield pdf.loc[keep].drop(columns=["_bucket"])
        state.update((seen,))

    bucket = F.shiftrightunsigned(
        F.col(hash_col).bitwiseAND(F.lit((1 << bits) - 1)), bits - prefix_bits
    )
    return (
        stream.withColumn("_bucket", bucket)
        .groupBy("_bucket")
        .applyInPandasWithState(
            gate,
            outputStructType=out_schema,
            stateStructType="seen array<bigint>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_last_touch(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
    campaign_col: str = "campaign",
    value_col: str = "cents",
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
) -> DataFrame:
    """Attribution at ingest — the streaming twin of the batch
    ``attribution_last_touch`` catalog query: each conversion is
    emitted once, credited to the campaign of the SAME user's latest
    campaign-bearing touch seen so far (at-or-before the conversion
    in (ts, id) order; a touch whose campaign is NULL is skipped,
    matching the batch twin's ``last(..., ignorenulls=True)``).
    State per user is ``(campaign int, touch_ts long)`` — still
    O(users), hash-partitioned by user across the cluster. The
    stored touch timestamp is the out-of-order guard: a touch
    arriving in a LATER micro-batch with an OLDER ts than the
    state's cannot regress the attribution (newest-by-ts wins;
    equal ts defers to the newer arrival, matching the batch twin's
    ``last()`` over (ts, id) order within a batch).

    Ordering contract: rows are sorted by (ts, id) WITHIN each
    micro-batch; ACROSS batches state updates are ts-guarded, so a
    late-arriving stale touch is dropped rather than mis-attributing
    every subsequent conversion. What the guard canNOT do is
    retroactive: a touch that arrives after its conversion's batch
    does not re-attribute the already-emitted row (immutable
    emission, the same at-least-once discipline as every append-mode
    stateful op here), and a late CONVERSION is credited to the
    newest state touch even if that touch's ts is after the
    conversion's — single-(campaign, ts) state keeps no history to
    answer at-or-before for the past. Conversions with no prior
    touch emit a NULL campaign, matching the batch query's NULL
    bucket.

    The caller extracts ``campaign_col``/``value_col`` upstream
    (codegen expressions, e.g. get_json_object on the message body)
    so the stateful kernel only routes typed columns.
    """
    out_schema = (
        f"{user_col} long, {id_col} long, {ts_col} long, "
        f"{value_col} long, {campaign_col} int"
    )

    def attribute(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        camp, camp_ts = None, None
        if state.exists:
            camp, camp_ts = state.get
        chunks = [p for p in pdfs if len(p)]
        out: list[tuple] = []
        if chunks:
            rows = pd.concat(chunks).sort_values([ts_col, id_col])
            for r in rows.itertuples(index=False):
                rd = r._asdict()
                if rd[type_col] in touch_types:
                    c = rd[campaign_col]
                    # a touch with a NULL campaign is SKIPPED, not a
                    # reset — the batch twin's last(IGNORE NULLS)
                    # retains the previous campaign past it; and a
                    # touch OLDER than the state's is a stale
                    # out-of-order arrival — dropping it is the
                    # newest-by-ts guard (docstring)
                    if not pd.isna(c) and (
                        camp_ts is None or int(rd[ts_col]) >= camp_ts
                    ):
                        camp = int(c)
                        camp_ts = int(rd[ts_col])
                elif rd[type_col] == conversion_type:
                    out.append(
                        (key[0], rd[id_col], rd[ts_col], rd[value_col], camp)
                    )
        state.update((camp, camp_ts))
        if out:
            yield pd.DataFrame(
                out,
                columns=[user_col, id_col, ts_col, value_col, campaign_col],
            )

    return stream.groupBy(user_col).applyInPandasWithState(
        attribute,
        outputStructType=out_schema,
        stateStructType=f"{campaign_col} int, touch_ts long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_new_vs_returning(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "cents",
    conversion_type: str = "purchase",
    us_per_day: int = 86_400_000_000,
) -> DataFrame:
    """Acquisition-vs-retention classification at ingest — the
    streaming twin of the batch ``new_vs_returning_revenue`` catalog
    query: each conversion row is emitted once, flagged ``is_new`` =
    (its epoch day == the user's FIRST-ever conversion day). State
    per user is one long (first conversion day) — O(users),
    hash-partitioned across the cluster; downstream a plain
    per-(day, is_new) aggregation reproduces the batch query's
    new/returning cents split incrementally.

    Semantics notes, matching the batch twin: every conversion on the
    user's first day is NEW (the batch form compares days, not row
    order), later days are RETURNING. The state update keeps the MIN
    day seen, so within-feed reordering across batches cannot move
    the first day forward; what it canNOT do is retroactive — rows
    already emitted as RETURNING are not re-flagged if an EARLIER
    first day only arrives later (immutable emission, the same
    at-least-once discipline as ``streaming_last_touch``). Non-
    conversion events pass through unclassified (filtered out).
    """
    out_schema = (
        f"{user_col} long, {id_col} long, day long, "
        f"{value_col} long, is_new boolean"
    )

    def classify(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first_day = None
        if state.exists:
            (first_day,) = state.get
        chunks = [p for p in pdfs if len(p)]
        out: list[tuple] = []
        if chunks:
            rows = pd.concat(chunks)
            rows = rows[rows[type_col] == conversion_type]
            if len(rows):
                rows = rows.sort_values([ts_col, id_col])
                for r in rows.itertuples(index=False):
                    rd = r._asdict()
                    day = int(rd[ts_col]) // us_per_day
                    if first_day is None or day < first_day:
                        first_day = day
                    out.append(
                        (
                            key[0],
                            rd[id_col],
                            day,
                            rd[value_col],
                            day == first_day,
                        )
                    )
        state.update((first_day,))
        if out:
            yield pd.DataFrame(
                out, columns=[user_col, id_col, "day", value_col, "is_new"]
            )

    return stream.groupBy(user_col).applyInPandasWithState(
        classify,
        outputStructType=out_schema,
        stateStructType="first_day long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(
    stream: DataFrame,
    key_col: str,
    order_cols: tuple[str, str],
    value_col: str,
    terms: int = 40,
) -> DataFrame:
    """Streaming twin of ``operators/windows.ewma_scaled`` — per-key
    exact integer EWMA (alpha = 1/2) maintained across micro-batches,
    emitting the refreshed ``(key, n_obs, ewma_scaled)`` row for every
    key a batch touches (update semantics).

    EXACTLY equal to the batch operator on the union of all batches,
    under ANY arrival order: the retained state is each key's
    newest-``terms`` observations by ``order_cols``, and a top-k-by-
    order set is ASSOCIATIVE — re-truncating (state ∪ batch) per
    trigger yields the same set as one global pass, so a late row
    within the window displaces exactly what it would have displaced
    in batch, and a row older than all 40 retained is ignored exactly
    as batch ignores it. The scaled sum is pure Python int arithmetic
    (no floats), term-for-term the batch formula.

    State per key is bounded: 3 x ``terms`` int64s + one counter —
    independent of stream length (the applyInPandasWithState
    discipline: never the key's history). Full (o1, o2) ties break by
    value here (deterministic); give a unique tiebreak column for
    batch-equality on pathological inputs. Non-SQL-expressible
    (cross-batch state); verified by the streaming-vs-batch equality
    test, not a DuckDB oracle (SURVEY §5 weaker-check note).
    """
    o1, o2 = order_cols
    out_schema = f"{key_col} long, n_obs long, ewma_scaled long"
    state_schema = "o1 array<long>, o2 array<long>, v array<long>, n long"

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[int, int, int]] = []
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            rows.extend(
                (int(a), int(b), int(c))
                for a, b, c in zip(pdf[o1], pdf[o2], pdf[value_col])
            )
        if state.exists:
            so1, so2, sv, n_seen = state.get
            rows.extend(
                (int(a), int(b), int(c)) for a, b, c in zip(so1, so2, sv)
            )
            n_total = int(n_seen) + n_new
        else:
            n_total = n_new
        rows.sort()
        tail = rows[-terms:]
        s = sum(
            v * (1 << (terms - 1 - age))
            for age, (_, _, v) in enumerate(reversed(tail))
        )
        state.update(
            (
                [a for a, _, _ in tail],
                [b for _, b, _ in tail],
                [v for _, _, v in tail],
                n_total,
            )
        )
        yield pd.DataFrame(
            {key_col: [int(key[0])], "n_obs": [n_total], "ewma_scaled": [s]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
