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
