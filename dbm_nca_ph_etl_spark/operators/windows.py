"""Ordered / window kernel (SURVEY §2.3, W1-W4).

The reference's cleaning semantics depend on implicit pandas row
order; Spark has no implicit order, so every operator here takes
explicit ordering columns and is partition-invariant by construction
(property-tested in tests/test_windows.py).

Scale notes: all four operators are single-shuffle window functions
partitioned by a group key (release / user). At 100 TB the window
partition is the unit of parallelism — groups (one PDF release, one
user's event stream) are small and numerous, so the shuffle is
well-balanced and no group ever exceeds executor memory. None of
these collect to the driver.
"""

from __future__ import annotations

import decimal as _decimal
import functools
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.functions.scalars import floor_div_sql


def _window(partition_by: Sequence[str], order_by: Sequence[str]) -> Window:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def forward_fill(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str | None = None,
) -> DataFrame:
    """W1 — forward-fill nulls from the last non-null value above.

    Parity: pd_data_cleaner.py:31-32 (``""→NaN`` then ``ffill()``);
    empty-string→null conversion is the caller's job (P6).
    ``last(ignorenulls)`` over an unbounded-preceding row frame is a
    single window pass — no self-join, no driver loop.
    """
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col or col, F.last(F.col(col), ignorenulls=True).over(w))


def segment_by_change(
    df: DataFrame,
    key_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "segment_id",
) -> DataFrame:
    """W2 — change-point segmentation: a new segment id whenever
    ``key_col`` differs from the previous row's value.

    Parity: the reference *inserts spacer rows* at group boundaries
    (pd_data_cleaner.py:70-97); we reproduce the downstream effect
    (group delimiting) without row insertion — lag + running sum.
    """
    w = _window(partition_by, order_by)
    changed = (
        F.lag(F.col(key_col)).over(w).isNull()
        | (F.lag(F.col(key_col)).over(w) != F.col(key_col))
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(changed).over(wsum))


def segment_by_flag(
    df: DataFrame,
    flag: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "segment_id",
) -> DataFrame:
    """W4 segmentation step — start a new segment on rows where
    ``flag`` is true (the reference's all-empty spacer rows,
    pd_data_cleaner.py:152-156). Running sum of the boundary flag.
    """
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(flag.cast("int")).over(w))


def sessionize(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap: int = 1800,
    out_col: str = "session_id",
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Time-gap sessionization: a new session when the gap since the
    previous event exceeds ``gap``, expressed in the unit of
    ``ts_col`` (seconds for epoch-second columns, µs for ``ts_us``).
    Same lag+cumsum pattern as W2 — the reference's spacer logic
    generalized to event time (north-star events workload).
    ``order_by`` defaults to the timestamp; pass extra tiebreak
    columns for determinism when timestamps can collide.
    """
    w = _window(partition_by, list(order_by) if order_by else [ts_col])
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > F.lit(gap))
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(new_session).over(wsum))


def ordered_collect(value: str | Column, order_by: str | Column) -> Column:
    """Collect values into an array pinned to explicit order.

    Spark's ``collect_list`` is partition-order-dependent; collecting
    ``struct(order, value)`` + ``array_sort`` + field projection makes
    order deterministic — the engine-wide convention called out in
    SURVEY §4 ("custom #2").
    """
    o = F.col(order_by) if isinstance(order_by, str) else order_by
    v = F.col(value) if isinstance(value, str) else value
    arr = F.array_sort(F.collect_list(F.struct(o.alias("o"), v.alias("v"))))
    return F.transform(arr, lambda s: s["v"])


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
    cuts: Sequence[float] | None = None,
) -> DataFrame:
    """Distributed exclusive prefix sum over a global total order.

    A naive global window (``Window.orderBy(...)`` with no partition
    key) funnels the whole table through ONE task — correct at sf0.1,
    dead at 100 TB. This is the classic two-phase scan instead:

    1. split the total order into ``n`` contiguous blocks by the
       FIRST order column. Boundaries come from one driver-side
       ``approxQuantile`` pass and are baked into the plan as
       LITERALS, so the block id is a pure deterministic column
       function — both plan branches below compute identical blocks
       no matter how many physical exchanges Catalyst plants or
       whether ReuseExchange fires (a ``spark_partition_id()`` after
       ``repartitionByRange`` is NOT deterministic that way: range
       boundaries are re-sampled per physical exchange, and a
       divergent re-plan could silently mis-offset boundary rows);
    2. per-block running sums via a window keyed on the block id
       (one hash shuffle — the window's own);
    3. per-block totals — an n-row aggregate — become cumulative
       *offsets* via a single-partition window over that
       metadata-sized frame (one long per block, NOT data rows),
       broadcast-joined back.

    ``out_col`` is the EXCLUSIVE prefix (sum of all strictly-preceding
    rows in ``order_by`` order) — the form shard packing and offset
    assignment want. ``order_by`` must be a total order for the result
    to be deterministic (its first column must be numeric — it feeds
    ``approxQuantile``; rows equal on it always share a block, so a
    heavily-duplicated first key skews blocks but never breaks
    correctness). Partition-invariance is property-tested.

    EAGER ACTION WARNING: unless ``cuts`` is supplied, building this
    DataFrame runs a Spark job *at call time* — the block boundaries
    come from a driver-side ``approxQuantile`` over ``df`` (n−1
    doubles of driver state; that eagerness is what makes the block
    id a literal-baked deterministic function, immune to exchange
    re-sampling). Repeated calls over the same table should sample
    once and pass ``cuts=`` back in — any sorted numeric boundary
    list is CORRECT (boundaries only balance block sizes), so cached
    or even stale cuts never change the result, only the skew. The
    same ``cuts`` always yield bit-identical plans and results.
    """
    return prefix_sums(
        df,
        [value_col],
        order_by,
        out_cols=[out_col],
        num_partitions=num_partitions,
        cuts=cuts,
    )


def prefix_sums(
    df: DataFrame,
    value_cols: Sequence[str],
    order_by: Sequence[str],
    out_cols: Sequence[str],
    num_partitions: int | None = None,
    cuts: Sequence[float] | None = None,
) -> DataFrame:
    """Multi-column form of :func:`prefix_sum`: exclusive prefix sums
    for EVERY ``value_cols[i]`` → ``out_cols[i]`` over ONE shared
    block window and ONE offsets pass. Callers needing several
    running sums over the same total order (pareto's cumulative
    revenue + rank, grid_cumsums' unbounded route) previously chained
    :func:`prefix_sum` per column, which re-sorted and re-joined the
    table once per column; every added column here costs only one
    more aggregate inside the same Window/HashAggregate operators —
    the per-column algebra (and its bit-exact result) is unchanged.
    Same eager-``approxQuantile``-unless-``cuts`` contract as
    :func:`prefix_sum`.
    """
    if len(value_cols) != len(out_cols):
        raise ValueError("value_cols and out_cols must align")
    first = order_by[0]
    if cuts is None:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        cuts = df.stat.approxQuantile(
            first, [i / n for i in range(1, n)], 0.001
        )
    blk = F.lit(0)
    for c in sorted(set(cuts)):
        blk = blk + (F.col(first) > F.lit(c)).cast("int")
    with_blk = df.withColumn("_blk", blk)
    w = (
        Window.partitionBy("_blk")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_blk.select(
        "*",
        *[
            F.sum(F.col(v)).over(w).alias(f"_li_{o}")
            for v, o in zip(value_cols, out_cols)
        ],
    )
    woff = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = with_blk.groupBy("_blk").agg(
        *[F.sum(F.col(v)).alias(f"_t_{o}") for v, o in zip(value_cols, out_cols)]
    )
    offsets = offsets.select(
        "_blk",
        *[
            F.coalesce(F.sum(f"_t_{o}").over(woff), F.lit(0)).alias(f"_off_{o}")
            for o in out_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "_blk")
    for v, o in zip(value_cols, out_cols):
        out = out.withColumn(
            o,
            (F.col(f"_off_{o}") + F.col(f"_li_{o}") - F.col(v)).cast("long"),
        )
    return out.drop(
        "_blk", *[f"_li_{o}" for o in out_cols], *[f"_off_{o}" for o in out_cols]
    )


def grid_cumsums(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    *,
    inclusive: bool = True,
    total_cols: Sequence[str] | None = None,
    max_window_rows: int = 1_000_000,
    cum_prefix: str = "cum_",
    tot_prefix: str = "tot_",
) -> DataFrame:
    """Cumulative sums (plus grand totals) over a DISTINCT-value
    grid, with the single-partition-window escape hatch enforced in
    CODE rather than prose.

    The two-sample statistics (ks_drift, mann_whitney) aggregate the
    data down to one row per distinct value and then need running
    sums over that grid in value order. When the grid is
    domain-bounded (cents of a capped price: ≤49k rows at ANY corpus
    scale) a global window is metadata-sized and optimal. But the
    same code called on an unbounded-domain column (microsecond
    timestamps, free floats) would silently funnel billions of rows
    through ONE window task. This helper is the guard: it counts the
    grid (one job over the already-aggregated frame — the eager
    action is the price of the guarantee, same trade as
    :func:`prefix_sum`'s approxQuantile) and routes grids past
    ``max_window_rows`` through the two-phase :func:`prefix_sum`
    scan, with grand totals broadcast-joined back on a constant key
    (a broadcast hash join on a 1-row frame, never a cartesian).

    Output: the input columns plus ``cum_<v>`` for each value column
    (INCLUSIVE of the current row by default; ``inclusive=False``
    gives the strictly-preceding sum, 0 on the first row) and
    ``tot_<c>`` grand totals for ``total_cols`` (default: the value
    columns). Both branches are deterministic and bit-identical —
    pinned by tests/test_windows.py.

    ``order_col`` must be numeric and distinct per row (it is a grid)
    — it feeds approxQuantile on the distributed path.

    The input is materialized (``localCheckpoint``) before the
    count: without it the guard's count job would run the upstream
    aggregation once and the returned plan would recompute it on
    collect — doubling the dominant scan+shuffle cost of every
    caller. The checkpoint holds only the post-agg grid.
    """
    total_cols = list(value_cols if total_cols is None else total_cols)
    df = df.localCheckpoint(eager=True)
    n_grid = df.count()
    if n_grid <= max_window_rows:
        upper = Window.currentRow if inclusive else -1
        wc = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, upper
        )
        wa = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        out = df
        for v in value_cols:
            out = out.withColumn(
                cum_prefix + v,
                F.coalesce(F.sum(v).over(wc), F.lit(0)).cast("long"),
            )
        for c in total_cols:
            out = out.withColumn(
                tot_prefix + c, F.sum(c).over(wa).cast("long")
            )
        return out
    # unbounded-domain path: two-phase distributed prefix scan.
    # Sample block boundaries ONCE and share them across columns —
    # prefix_sum guarantees any sorted cuts are correct.
    n_blk = df.sparkSession.sparkContext.defaultParallelism
    cuts = df.stat.approxQuantile(
        order_col, [i / n_blk for i in range(1, n_blk)], 0.001
    )
    out = prefix_sums(
        df,
        list(value_cols),
        [order_col],
        out_cols=[cum_prefix + v for v in value_cols],
        cuts=cuts,
    )
    if inclusive:
        for v in value_cols:
            out = out.withColumn(
                cum_prefix + v,
                (F.col(cum_prefix + v) + F.col(v)).cast("long"),
            )
    totals = df.agg(
        *[F.sum(c).cast("long").alias(tot_prefix + c) for c in total_cols]
    ).withColumn("_j", F.lit(1))
    return (
        out.withColumn("_j", F.lit(1))
        .join(F.broadcast(totals), "_j")
        .drop("_j")
    )


def grid_rank_picks(
    grid: DataFrame,
    order_col: str,
    weight_col: str,
    partition_by: Sequence[str] = (),
):
    """Shared scaffolding for exact nearest-rank statistics over a
    (possibly partitioned) VALUE GRID: augments ``grid`` — one row
    per (partition, distinct value) with a ``weight_col`` count —
    with ``cum`` (running weight in ``order_col`` order) and ``tot``
    (partition total), and returns a pick factory mapping an integer
    percent to the nearest-rank value column
    (``min value with cum ≥ ceil(p·tot/100)`` — the percentile_disc
    definition, integer-exact for non-negative counts).

    The window partition is a partition's value grid — domain-
    bounded, metadata-sized at any corpus scale (the grid_cumsums
    discipline; callers aggregate to the grid FIRST, this never
    sorts row-scale data). Used by value_percentiles_by_type and
    ship_latency_sla; their SQL twins spell the same cum/tot/pick
    algebra inline.

    Returns ``(augmented_df, pick)`` where ``pick(p)`` is an
    AGGREGATE column — use inside a groupBy over ``partition_by``.
    """
    wc = (
        Window.partitionBy(*partition_by)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wa = Window.partitionBy(*partition_by)
    out = grid.withColumn("cum", F.sum(weight_col).over(wc)).withColumn(
        "tot", F.sum(weight_col).over(wa)
    )

    def pick(p: int) -> Column:
        rank = F.expr(f"(tot * {int(p)} + 99) div 100")
        return F.min(
            F.when(F.col("cum") >= rank, F.col(order_col))
        ).cast("long")

    return out, pick


#: Largest bucket the multi-select below will hand to a single window
#: task before refining it further: ~4M rows sort in-task in seconds
#: and bound the task's memory regardless of total table size.
_SELECT_CAP = 1 << 22


def _bucket_counts(df: DataFrame, key: Column) -> dict[int, int]:
    """Exact per-bucket row counts, collected — callers only pass
    bounded-cardinality keys (≤127 octaves / ≤1024 sub-ranges), so
    the driver state is metadata-sized by construction."""
    return {
        r["k"]: r["n"]
        for r in df.groupBy(key.alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def quantile_thresholds(
    df: DataFrame,
    metric: str,
    qs: Sequence[int],
    *,
    bounded: bool,
    tie_break: str | None = None,
    names: Sequence[str] | None = None,
) -> DataFrame:
    """ONE-row DataFrame of exact nearest-rank thresholds over
    ``metric``: threshold for percent ``q`` = the value at rank
    ``ceil(q·n/100)`` in ascending order (the percentile_disc
    definition; ties land on one side by construction). Output
    columns default to ``t1..tk`` in ``qs`` order.

    This is THE shared home of the nearest-rank threshold idiom —
    the scale route is picked by the metric's SHAPE, the same split
    rfm_segmentation's docstring argues:

    - ``bounded=True`` — the metric lives on a DOMAIN-BOUNDED grid
      (epoch days, per-entity counts, enum codes): aggregate to the
      (value, count) grid first (one map-side-combining shuffle over
      data rows), then rank-pick over the metadata-sized grid via
      :func:`grid_rank_picks`. Never sorts row-scale data.
    - ``bounded=False`` — the metric is DATA-SIZED (distinct values
      grow with the corpus, e.g. per-customer cent sums): an exact
      distributed k-way SELECTION — octave-bucket counts locate each
      rank's bucket, over-``_SELECT_CAP`` buckets refine through
      capped integer sub-ranges, and the (metric, tie_break) window
      runs over ONLY the ≤k surviving buckets (never a global
      window, never a sort of the full table; a bucket that
      collapses to one value IS its threshold with no window at
      all); ``tie_break`` (required) must complete ``(metric,
      tie_break)`` into a total order so the rank — and therefore
      the threshold — is deterministic.

    The partitioned form of the same algebra (per-group thresholds
    plus extra grid aggregates) stays on :func:`grid_rank_picks`
    directly — see value_percentiles_by_type / ship_latency_sla.

    The 1-row result is meant to be broadcast-joined back against
    the data (the guarded scalar-subquery pattern); thresholds are
    cast to long (exact-integer metrics are the engine-wide digest
    convention).
    """
    names = list(names) if names is not None else [
        f"t{i + 1}" for i in range(len(qs))
    ]
    if len(names) != len(qs):
        raise ValueError("names and qs must align")
    if bounded:
        g = df.groupBy(metric).agg(
            F.count(F.lit(1)).cast("long").alias("_qt_n")
        )
        c, pick = grid_rank_picks(g, metric, "_qt_n")
        return c.agg(
            *[pick(q).alias(nm) for q, nm in zip(qs, names)]
        )
    if tie_break is None:
        raise ValueError(
            "unbounded metrics need tie_break to make (metric, tie_break) "
            "a total order — without it the threshold at a tied rank is "
            "partitioning-dependent"
        )
    # SELECTION, not ranking: k order statistics don't need a per-row
    # global rank (what prefix_sum builds — a window over EVERY row).
    # Exact distributed multi-select instead:
    #   1. one counts pass over OCTAVE buckets of the (integer)
    #      metric — an exact, data-independent, monotone blocking
    #      (63 long comparisons, no doubles, no approxQuantile
    #      pre-job), collected to ≤127 driver longs;
    #   2. each target rank lands in exactly one bucket at a known
    #      local rank; buckets holding more than ``_SELECT_CAP`` rows
    #      are REFINED (one filtered counts pass per round, splitting
    #      the bucket into ≤1024 equal integer sub-ranges) until every
    #      pick's bucket is single-task-sortable or single-valued —
    #      the per-round cap is what keeps the final window from
    #      sorting a 100 TB hot bucket in one task, and a bucket that
    #      collapses to ONE value IS its threshold (no window at all,
    #      however many duplicate rows it holds);
    #   3. only the surviving ≤k buckets get the (metric, tie_break)
    #      row_number window — k small slices of the table, never a
    #      global sort.
    # Driver state is bounded (≤1024 counts per round, ~6 rounds worst
    # case for a 2^62 range); the counts pass makes this call EAGER,
    # like the approxQuantile pass the earlier rank route paid anyway.
    # Exact-integer metrics are the engine-wide digest convention
    # (thresholds are cast to long on return).
    sess = df.sparkSession
    m = F.col(metric).cast("long")
    # sign-mirrored octave: 0 for m==0, ±(1+floor(log2(|m|))) else.
    # Monotone in m even under double rounding (long→double, log2,
    # floor all preserve order), which is all correctness needs: the
    # octave's nominal bounds only SEED refinement, whose integer
    # `div` sub-ranges are exact for whatever rows the bucket really
    # holds; the single-value shortcut applies only to b ∈ {-1,0,1},
    # where doubles are exact.
    octave = (
        F.when(m > 0, (F.floor(F.log2(m)) + 1).cast("int"))
        .when(m < 0, (-F.floor(F.log2(-m)) - 1).cast("int"))
        .otherwise(F.lit(0))
    )
    counts = _bucket_counts(df, octave)
    tot = sum(counts.values())
    if tot == 0:
        return sess.range(1).select(
            *[F.lit(None).cast("long").alias(nm) for nm in names]
        )

    def _octave_bounds(b: int) -> tuple[int, int]:
        if b == 0:
            return (0, 0)
        if b > 0:  # m in [2^(b-1), 2^b)
            return (1 << (b - 1), (1 << b) - 1)
        return (-(1 << (-b)) + 1, -(1 << (-b - 1)))  # mirror

    # (name, cond, lo, hi, local_rank, bucket_count)
    picks: list[tuple[str, Column, int, int, int, int]] = []
    for q, nm in zip(qs, names):
        rank = (tot * int(q) + 99) // 100  # ceil(q·n/100), 1-based
        off = 0
        for b in sorted(counts):
            if rank <= off + counts[b]:
                lo, hi = _octave_bounds(b)
                picks.append(
                    (nm, octave == F.lit(b), lo, hi, rank - off, counts[b])
                )
                break
            off += counts[b]
    # refinement rounds: split any too-big multi-valued bucket into
    # ≤1024 equal integer sub-ranges and re-locate the rank (picks
    # sharing a bucket share the pass — conditions compare equal by
    # construction only when (lo, hi) match, so group on bounds)
    while True:
        todo = {
            (lo, hi): cond
            for (_, cond, lo, hi, _, n) in picks
            if n > _SELECT_CAP and lo < hi
        }
        if not todo:
            break
        for (lo, hi), cond in todo.items():
            width = hi - lo + 1
            step = (width + 1023) // 1024
            # integer floor-div (SQL `div`): within the bucket m ≥ lo,
            # so the numerator is non-negative — no toward-zero bias
            from dbm_nca_ph_etl_spark.functions.scalars import quote_ident

            sub = F.expr(
                f"(cast({quote_ident(metric)} as bigint) - ({lo})) div ({step})"
            )
            sub_counts = _bucket_counts(df.where(cond), sub.cast("int"))
            for i, (nm, c0, l0, h0, r0, n0) in enumerate(picks):
                if (l0, h0) != (lo, hi) or n0 <= _SELECT_CAP:
                    continue
                off = 0
                for s in sorted(sub_counts):
                    if r0 <= off + sub_counts[s]:
                        nlo = lo + s * step
                        nhi = min(lo + (s + 1) * step - 1, hi)
                        picks[i] = (
                            nm,
                            c0 & (sub == F.lit(s)),
                            nlo,
                            nhi,
                            r0 - off,
                            sub_counts[s],
                        )
                        break
                    off += sub_counts[s]
    exprs: dict[str, Column] = {}  # name -> aggregate expression
    # picks sharing a bucket share ONE tag (a row carries a single
    # tag, so per-pick tags would shadow each other) and differ only
    # in local rank
    buckets: dict[tuple[int, int], tuple[int, Column]] = {}
    windowed: list[tuple[str, int, int]] = []  # (name, bucket_id, rank)
    for nm, cond, lo, hi, r, _n in picks:
        if lo == hi:  # single-valued bucket IS the threshold
            exprs[nm] = F.max(F.lit(lo)).cast("long").alias(nm)
        else:
            if (lo, hi) not in buckets:
                buckets[(lo, hi)] = (len(buckets), cond)
            windowed.append((nm, buckets[(lo, hi)][0], r))
    if not windowed:
        return sess.range(1).select(
            *[F.lit(lo).cast("long").alias(nm)
              for nm, _, lo, _, _, _ in picks]
        )
    # one window job over the surviving buckets (disjoint by
    # construction), partitioned by the bucket tag
    tag = F.lit(None).cast("int")
    for i, cond in buckets.values():
        tag = F.when(cond, F.lit(i)).otherwise(tag)
    w = Window.partitionBy("_qt_tag").orderBy(metric, tie_break)
    ranked = (
        df.withColumn("_qt_tag", tag)
        .where(F.col("_qt_tag").isNotNull())
        .withColumn("_qt_rn", F.row_number().over(w))
        .where(
            functools.reduce(
                lambda a, b: a | b,
                [
                    (F.col("_qt_tag") == F.lit(i)) & (F.col("_qt_rn") == F.lit(r))
                    for _, i, r in windowed
                ],
            )
        )
    )
    for nm, i, r in windowed:
        exprs[nm] = (
            F.min(
                F.when(
                    (F.col("_qt_tag") == F.lit(i))
                    & (F.col("_qt_rn") == F.lit(r)),
                    F.col(metric),
                )
            )
            .cast("long")
            .alias(nm)
        )
    return ranked.agg(*[exprs[nm] for nm in names])  # qs order


def leading_run_concat(arr: Column, sep: str = " ") -> Column:
    """W3 — join array items with ``sep``, stopping at the first
    null/empty item (keep only the *leading* run).

    Parity: ``_join_col_to_str`` (pd_data_cleaner.py:120-132) — the
    break-at-first-empty is load-bearing: trailing stray text after a
    blank line does NOT belong to the record field.
    Pure array HOFs: position-of-first-empty → slice → concat_ws.
    """
    is_empty = lambda x: x.isNull() | (F.trim(x) == "")  # noqa: E731
    # index of first empty element, 0 if none
    first_empty = F.coalesce(
        F.array_position(
            F.transform(arr, lambda x: is_empty(x)), F.lit(True)
        ),
        F.lit(0),
    )
    keep_n = F.when(first_empty > 0, first_empty - 1).otherwise(F.size(arr))
    return F.concat_ws(sep, F.slice(arr, 1, keep_n))


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """2-D skyline (Pareto frontier): rows no other row dominates,
    where B dominates A iff B is <= A on ``minimize`` AND >= A on
    ``maximize`` with at least one comparison strict. The classic
    multi-criteria shortlist (cheapest-for-the-capacity, price vs
    quality) the reference's top-1/top-k orderings can't express.

    Plan (the textbook sort-filter skyline, two-phase for scale):

    1. ``distinct`` over the two criteria — dominance only depends on
       the value pair, so the frontier of the distinct pairs is the
       frontier of the table. Map-side combine shrinks the shuffle to
       the value-domain cardinality.
    2. LOCAL skylines: within each shuffle partition, sort by
       (minimize asc, maximize desc) and keep a pair iff its
       ``maximize`` strictly exceeds the running max of all preceding
       rows (a preceding row has <= minimize; within an equal
       minimize group the first row carries the group's best
       maximize, so equal-pair ties survive and intra-group dominated
       rows don't). One window, no self-join.
    3. GLOBAL pass: the same predicate over the union of local
       survivors. Sound because dominance is transitive: a globally
       dominated row either meets its dominator in the global pass,
       or that dominator lost locally to a row that dominates both
       and DID survive. Survivor sets are tiny (the frontier of n
       uniform pairs is ~O(log n) in 2-D), so the single-task global
       window is metadata-sized at any scale.
    4. Broadcast-join the frontier pairs back to the table — every
       row carrying a frontier value pair is on the frontier.

    Deterministic: dominance is a pure value predicate; no ranks or
    row_numbers reach the output.
    """
    mn, mx = F.col(minimize), F.col(maximize)
    pairs = df.select(minimize, maximize).distinct()

    def _sky(pdf: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(mn.asc(), mx.desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        best = F.max(maximize).over(w)
        return (
            pdf.withColumn("_pm", best)
            .where(F.col("_pm").isNull() | (mx > F.col("_pm")))
            .drop("_pm")
        )

    local = _sky(pairs.withColumn("_pid", F.spark_partition_id()), ["_pid"]).drop(
        "_pid"
    )
    frontier = _sky(local, [])
    return df.join(F.broadcast(frontier), [minimize, maximize])


def time_grid_interpolate(
    observed: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    val_col: str,
    step: int,
) -> DataFrame:
    """Dense-grid LINEAR interpolation of an integer-valued series —
    the resampling step between raw events and model-ready features
    (forward_fill answers "carry the last reading"; this answers
    "estimate between readings", the right semantic for continuous
    signals like balances, gauges, rates).

    Input: one row per (keys, ts) observation; ``ts_col`` an integer
    epoch (µs convention), ``val_col`` an integer measure (e6-scaled
    convention). Output: one row per (keys, grid tick) spanning each
    key's [min, max] observation range at ``step`` spacing, with:

    - ``interp`` — the observation when the tick is observed, else
      v0 + (v1−v0)·(t−t0)/(t1−t0) between the bracketing
      observations, computed ENTIRELY in decimal(38,0) integer
      arithmetic with one final floor-half-up division: exact, so
      the result is partition- and engine-invariant (the µs·e6
      products overflow int64; decimals don't).
    - ``observed`` — 1 for real points, 0 for interpolated ones.

    Every tick interpolates: grid ends are observation min/max, so a
    bracketing pair always exists (edge ticks are themselves
    observed). Plan: per-key grid explode (bounded by the key's own
    span), one left join and two directional IGNORE NULLS window
    passes sharing a single shuffle+sort on (keys, tick) — the
    hourly_grid_ffill shape plus the backward frame.
    """
    k = [F.col(c) for c in keys]
    span = observed.groupBy(*keys).agg(
        F.min(ts_col).alias("_h0"), F.max(ts_col).alias("_h1")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(int(step)))
        ).alias(ts_col),
    )
    j = grid.join(observed, [*keys, ts_col], "left")
    v = F.col(val_col).cast("decimal(38,0)")
    t = F.col(ts_col).cast("decimal(38,0)")
    before = (
        Window.partitionBy(*k)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    after = (
        Window.partitionBy(*k)
        .orderBy(F.col(ts_col))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v0 = F.last(v, ignorenulls=True).over(before)
    t0 = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(before)
    v1 = F.first(v, ignorenulls=True).over(after)
    t1 = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(after)
    # round-half-up(N/D) = floor((2N + D) / (2D)) for N ≥ 0, D > 0 —
    # the shift C keeps N positive for negative-valued series so
    # floor division behaves identically on both engines; it cancels
    # exactly because C·D/D is exact: N = u0·(D−dt) + u1·dt with
    # u = v + C, both addends ≥ 0. C = 2^63 covers the ENTIRE int64
    # value domain (long min + C ≥ 0 — a 2^41 shift silently broke
    # floor for values < −2^41), which is why the floor must be the
    # all-decimal exact-multiple form (num − num%den)/den rather than
    # Spark's `div`: IntegralDivide returns LONG, and the shifted
    # quotient C + interp overflows it for any C ≥ 2^62. The decimal
    # division is of an exact multiple, so the quotient is bit-exact;
    # decimal(38,0) still leaves dur ≤ ~2.7e18 µs (~87k years) of
    # headroom before the 2·(v+C)·dur product overflows.
    C = F.lit(_decimal.Decimal(1 << 63)).cast("decimal(38,0)")
    dt, dur = t - t0, t1 - t0
    num = F.lit(2) * ((v0 + C) * (dur - dt) + (v1 + C) * dt) + dur
    half_up = (
        j.withColumn("_num", num)
        # null (not 0) when the tick is itself observed: dur = 0
        # there, and division by null is null while div-by-zero would
        # throw under ANSI — the observed branch never reads _q
        .withColumn("_den", F.when(dur > 0, F.lit(2) * dur))
        .withColumn(
            "_q",
            (
                (F.col("_num") - F.col("_num") % F.col("_den"))
                / F.col("_den")
                - C
            ).cast("long"),
        )
    )
    interp = F.when(v.isNotNull(), v.cast("long")).otherwise(F.col("_q"))
    return half_up.select(
        *keys,
        F.col(ts_col),
        interp.cast("long").alias("interp"),
        F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("observed"),
    )


def match_sequence(
    events: DataFrame,
    steps: Sequence[Column],
    gap: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Greedy earliest-completion SEQUENCE match per key — the
    MATCH_RECOGNIZE shape (A then B then C, each within ``gap`` time
    units of the previous stage) as relational algebra, no per-key
    UDF scan. ``steps`` are boolean predicate Columns over the event
    row; output is one row per key that completes every step:
    (key, t1, …, tk) with the matched stage timestamps.

    Semantics (pinned, SQL-replayable): t₁ = the key's earliest
    step-1 event; tᵢ₊₁ = the earliest step-(i+1) event with
    tᵢ < t ≤ tᵢ + gap. Greedy-earliest is the standard funnel
    convention; it is NOT a backtracking NFA — a key where waiting
    for a later t₁ would have satisfied the gaps does not match
    (that variant needs a per-key sequential scan; this one needs k
    broadcast joins).

    Scale shape (the event_funnel discipline): the event fact is
    scanned once per stage with the predicate pushed down, and only
    KEY-LEVEL FRONTIERS (one row per surviving key) move between
    stages — broadcast, with the time bounds as non-equi residuals;
    no window over the whole stream, no per-key state.
    """
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    if gap <= 0:
        raise ValueError(f"gap must be positive, got {gap}")
    frontier = None
    ts = []
    for i, pred in enumerate(steps):
        s = events.where(pred)
        if frontier is not None:
            prev_t = f"_t{i - 1}"
            s = s.join(
                F.broadcast(frontier),
                (F.col(key_col) == F.col("_pk"))
                & (F.col(ts_col) > F.col(prev_t))
                & (F.col(ts_col) <= F.col(prev_t) + F.lit(int(gap))),
            ).drop("_pk")
        cur = s.groupBy(key_col).agg(
            F.min(ts_col).alias(f"_t{i}"),
            *[F.first(t).alias(t) for t in ts],
        )
        ts.append(f"_t{i}")
        frontier = cur.select(
            F.col(key_col).alias("_pk"), *[F.col(t) for t in ts]
        )
    return cur.select(
        key_col, *[F.col(f"_t{i}").alias(f"t{i + 1}") for i in range(len(steps))]
    )


def cusum_scan(
    df: DataFrame,
    value_col: str,
    target: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided CUSUM drift statistic per key, as two window scans.

    The textbook recursive form S₀=0, Sᵢ = max(0, Sᵢ₋₁ + (xᵢ − k))
    looks inherently sequential, but it has a closed prefix form:
    with Qᵢ = Σ_{t≤i}(xₜ − k),  Sᵢ = Qᵢ − min(0, min_{j≤i} Qⱼ).
    Both the prefix sum and the running min are associative scans, so
    the whole statistic is TWO stacked window frames over one
    per-key ordered pass — no per-key Python loop, no UDF, stays in
    whole-stage codegen. The lower-side CUSUM is the same statistic
    over the negated deviations.

    ``value_col`` and ``target`` should be integers (e.g. cents) —
    then every Qᵢ/Sᵢ is integer-exact and oracle-replayable. Keys
    are expected to be plentiful (user × metric), so the single
    shuffle is well balanced; at 100 TB an ocean of small ordered
    groups is exactly the shape Spark's window operator wants.
    Monitoring semantics: Page's CUSUM (Page 1954), the standard
    sequential change-point detector.
    """
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = F.col(value_col).cast("long") - F.lit(int(target))
    q = F.sum(dev).over(w)
    run_min = F.min(q).over(w)
    return df.withColumn(
        out_col, (q - F.least(F.lit(0).cast("long"), run_min)).cast("long")
    )


def interval_union_length(
    df: DataFrame,
    start_col: str,
    end_col: str,
    partition_by: Sequence[str],
) -> DataFrame:
    """Total length of the UNION of (possibly overlapping) intervals
    per key — the sweep-line classic as one window pass + one agg.

    Sorted by (start, end), the right frontier of everything already
    swept is the running max of ``end`` over strictly-preceding rows;
    a row's new coverage is max(0, end − max(start, frontier)).
    Summing per key gives exact union length with no interval
    flattening, no self-join, no explode of unit steps. Inputs are
    integer positions (epoch seconds) → integer-exact output.

    Scale: one hash shuffle on the key; per-key ordered scan. The
    degenerate one-giant-key case is the same skew story as any
    keyed window (salt by coarse time bucket and merge frontiers).
    """
    order = [start_col, end_col]
    w_prev = _window(partition_by, order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = F.max(F.col(end_col).cast("long")).over(w_prev)
    covered = F.greatest(
        F.lit(0).cast("long"),
        F.col(end_col).cast("long")
        - F.greatest(
            F.col(start_col).cast("long"),
            F.coalesce(frontier, F.col(start_col).cast("long")),
        ),
    )
    return (
        df.withColumn("_new_cover", covered)
        .groupBy(*partition_by)
        .agg(
            F.sum("_new_cover").cast("long").alias("covered"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Time-weighted average per key: each observation holds until
    the next one (step/zero-order-hold semantics); the last
    observation has no successor and carries no weight.

    Emits the EXACT integer numerator/denominator (Σ value·duration,
    Σ duration) plus the integer FLOOR mean — no float ratio can
    drift between engines. The mean uses the sign-safe pmod floor
    form (``functions.scalars.floor_div_sql``): int64 end-to-end
    (cents·µs numerators exceed 2^53, where double division is off
    by ±1) AND identical across engines for NEGATIVE numerators —
    refund/adjustment cents — where bare Spark ``div`` (truncates)
    and DuckDB ``//`` (floors from 1.1) would disagree. ``ts_col``
    in integer units (epoch µs), ``value_col`` integer (cents). One
    lead() window + one agg = single shuffle; the standard
    irregular-time-series downsample (TWAP) every metrics/pricing
    pipeline needs.
    """
    order = list(order_by) if order_by else [ts_col]
    w = _window(partition_by, order)
    dur = F.lead(F.col(ts_col).cast("long")).over(w) - F.col(ts_col).cast("long")
    return (
        df.withColumn("_dur", dur)
        .where(F.col("_dur").isNotNull())
        .groupBy(*partition_by)
        .agg(
            F.sum(F.col(value_col).cast("long") * F.col("_dur"))
            .cast("long")
            .alias("twa_num"),
            F.sum("_dur").cast("long").alias("twa_den"),
        )
        .withColumn(
            "twa_value",
            F.when(
                F.col("twa_den") > 0,
                floor_div_sql("twa_num", "twa_den"),
            ).otherwise(F.lit(None).cast("long")),
        )
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket: Column,
    partition_by: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """OHLC resampling: per (key, time-bucket) the opening value
    (first by (ts, tiebreak)), high, low, close (last), row count and
    sum — the canonical irregular→bar downsample.

    first_value/last_value over the full per-bar frame, then one
    group-by: all rows of a bar agree on open/close so the agg takes
    min() of an already-constant column (deterministic regardless of
    agg input order). One shuffle; bars are numerous and bounded so
    the window partition balance is the good kind. The explicit
    ``tiebreak`` makes equal-timestamp bars deterministic — the same
    convention as ordered_collect (SURVEY §4 custom #2).
    """
    order = [ts_col, *tiebreak]
    keys = [*partition_by]
    wfull = (
        Window.partitionBy(*keys, "_bar")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    with_bar = df.withColumn("_bar", bucket)
    v = F.col(value_col)
    opened = F.first(v).over(wfull)
    closed = F.last(v).over(wfull)
    return (
        with_bar.withColumn("_open", opened)
        .withColumn("_close", closed)
        .groupBy(*keys, "_bar")
        .agg(
            F.min("_open").alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.min("_close").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(v.cast("long")).cast("long").alias("volume"),
        )
        .withColumnRenamed("_bar", "bar")
    )


def ewma_scaled(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value: str,
    terms: int = 40,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (alpha = 1/2) of
    an int64 ``value``, in EXACT integer arithmetic — the smoothing
    primitive behind anomaly baselines and rate limiters.

    EWMA is a recursion (s_t = a*x_t + (1-a)*s_{t-1}) that SQL window
    frames cannot express directly; with a = 1/2 the expansion
    ``s_t = sum_j x_{t-j} / 2^(j+1)`` has exactly representable
    weights, and truncating at ``terms`` lags (the tail beyond 40
    halvings contributes < 2^-40 — sub-cent on any realistic scale)
    makes it a FIXED window:

        ewma_scaled_t = sum_{j=0..terms-1} x_{t-j} * 2^(terms-1-j)

    i.e. the EWMA numerator scaled by 2^terms, a pure int64 sum (no
    floating point), identical on every engine and partitioning —
    divide by 2^terms to read it as a value. Keys with fewer than
    ``terms`` rows use the natural truncated expansion (missing lags
    contribute 0), matching the SQL twin of ``terms`` coalesced
    ``lag`` columns term for term.

    Returns one row per key at its LAST event: keys + ``n_obs``
    (total rows for the key) + ``ewma_scaled``. Scale shape: one
    shuffle on the key; the window pass prunes each key's history to
    its newest ``terms`` rows (row_number over the same partitioning
    — Catalyst reuses the exchange for the final groupBy), each row
    is pre-weighted by its rank's power of two, and the numerator is
    a plain map-side-combined SUM — executor state per key is one
    int64 accumulator, never the key's history.

    Overflow: |value| * 2^terms must fit int64 — for terms=40 that is
    |value| < 2^23 cents per observation; pre-scale or lower
    ``terms`` beyond that.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by]
    )
    pruned = (
        df.select(*keys, *order_by, F.col(value).cast("bigint").alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
        .where(F.col("_rn") <= terms)
    )
    # each row's weight is a pure function of its row_number (1 =
    # newest -> 2^(terms-1)), so the EWMA numerator is a plain SUM of
    # pre-weighted rows — whole-stage-codegen'd, map-side-combined,
    # and commutative (int64 addition), no collect_list/HOF needed.
    weighted = pruned.withColumn(
        "_wv", F.expr(f"_v * shiftleft(CAST(1 AS BIGINT), {int(terms)} - _rn)")
    )
    return weighted.groupBy(*keys).agg(
        F.max("_n").cast("long").alias("n_obs"),
        F.sum("_wv").cast("bigint").alias("ewma_scaled"),
    )
