"""Exact heavy hitters at scale: candidate generation + recount.

Finding every item with frequency ≥ φ·N over 100 TB has a classic
two-pass shape that avoids shuffling the full key space:

1. **Candidate generation, partition-local.** Each task counts its
   own partition (vectorized ``value_counts``) and emits items with
   *local* share ≥ φ. Weighted pigeonhole guarantees no false
   negatives: if an item's global share is ≥ φ, its share is ≥ φ in
   at least one partition — so every true heavy hitter appears in
   some task's candidate list. Output is O(#partitions / φ) rows —
   model-sized, broadcastable — while the full distinct-key space
   (the thing a naive groupBy shuffles) can be billions.
2. **Exact recount.** One broadcast semi-join keeps only candidate
   rows, a tiny groupBy counts them exactly, and the global-count
   filter drops the false positives. The N in φ·N rides along as a
   broadcast one-row aggregate — the whole query is lazy, no driver
   action.

Result: EXACT (item, count) for every item with count ≥ φ·N —
deterministic, oracle-checkable — at the cost of two scans and a
shuffle of only candidate-matching rows. The same shape (sketch →
broadcast → exact verify) as probe_near_dup_pairs and the
decontamination query; this is the frequency instance.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def local_share_candidates(
    items: DataFrame, item_col: str, phi: float
) -> DataFrame:
    """Distinct items whose share within ANY partition is ≥ ``phi``
    (superset of the global-share-≥-phi set; see module docstring)."""

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            c = pdf[item_col].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is None:
            return
        keep = counts[counts >= phi * counts.sum()]
        yield pd.DataFrame({item_col: keep.index.astype(str)})

    # one output column; mapInPandas sees the whole partition as a
    # batch iterator, so the local count is exact per task
    return (
        items.select(item_col)
        .mapInPandas(per_partition, f"{item_col} string")
        .dropDuplicates([item_col])
    )


def exact_heavy_hitters(
    items: DataFrame,
    item_col: str,
    phi_denom: int,
    count_col: str = "cnt",
) -> DataFrame:
    """All items with global count ≥ N / ``phi_denom`` and their EXACT
    counts (φ = 1/phi_denom kept as integer arithmetic so the
    threshold compare is overflow- and rounding-free on every
    engine)."""
    cand = local_share_candidates(items, item_col, 1.0 / phi_denom)
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        items.join(F.broadcast(cand), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col(count_col) * phi_denom >= F.col("_n"))
        .select(item_col, count_col)
    )
