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


def streaming_source_quota(
    stream: DataFrame,
    key_col: str,
    tokens_col: str,
    order_col: str,
    budget: int,
    payload_cols: Iterable[str] = (),
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
    key hash across the cluster; pair with ``GroupStateTimeout``
    state TTL for rolling-window quotas.

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

    def gate(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
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

    return (
        stream.select(key_col, *out_cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            gate,
            outputStructType=out_schema,
            stateStructType="used bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
