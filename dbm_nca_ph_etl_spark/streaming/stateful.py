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

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


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


class _QuotaProcessor(StatefulProcessor):
    """Per-key token-budget gate (see :func:`streaming_source_quota`)."""

    def __init__(self, tokens_col: str, order_col: str, budget: int):
        self._tokens_col = tokens_col
        self._order_col = order_col
        self._budget = budget

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._used = handle.getValueState("used", "used bigint")

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        used = self._used.get()
        total = int(used[0]) if used is not None else 0
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(self._order_col, kind="mergesort").reset_index(drop=True)
        accepted, used_after = [], []
        for n in pdf[self._tokens_col].astype("int64"):
            ok = total + int(n) <= self._budget
            if ok:
                total += int(n)
            accepted.append(ok)
            used_after.append(total)
        self._used.update((total,))
        pdf["accepted"] = accepted
        pdf["used_after"] = pd.Series(used_after, dtype="int64")
        pdf["key"] = key[0]
        yield pdf

    def close(self) -> None:
        pass


def streaming_source_quota(
    stream: DataFrame,
    key_col: str,
    tokens_col: str,
    order_col: str,
    budget: int,
    payload_cols: Iterable[str] = (),
) -> DataFrame:
    """Per-key token-budget admission gate over an unbounded stream —
    ``transformWithStateInPandas`` (the Spark 4 arbitrary-state API;
    ``streaming_dedup`` above uses its ``applyInPandasWithState``
    predecessor, the engine exercises both extension points).

    Corpus-mixing enforcement at ingest time: every key (source /
    domain / language) may contribute at most ``budget`` tokens to
    the output mix; once a source's cumulative accepted tokens would
    exceed the budget, further documents are emitted with
    ``accepted=false`` (audit trail, not silent drop). The cumulative
    counter is a single value-state long per key — O(#keys) state,
    partitioned by key hash across the cluster, and TTL-able via the
    API's ``ttlDurationMs`` for rolling-window quotas.

    Rows are processed in ``order_col`` order within each micro-batch
    (deterministic admission under replay; cross-batch order is
    arrival order, as with any streaming gate).
    """
    out_cols = [order_col, tokens_col, *payload_cols]
    out_schema = ", ".join(
        [f"key {stream.schema[key_col].dataType.simpleString()}"]
        + [f"{c} {stream.schema[c].dataType.simpleString()}" for c in out_cols]
        + ["accepted boolean", "used_after bigint"]
    )
    proc = _QuotaProcessor(tokens_col, order_col, budget)
    return (
        stream.select(key_col, *out_cols)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
        .select("key", *out_cols, "accepted", "used_after")
    )
