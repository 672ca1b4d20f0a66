"""Incremental JOIN-view maintenance (delta rules over the keyed lake).

``sinks/matview.py`` keeps AGGREGATES fresh without re-reading the
world; this module does the same for an equi-JOIN view — the other
half of classic incremental view maintenance. The insert-only delta
rule (Blakeley et al. 1986):

    Δ(R ⋈ S) = ΔR ⋈ S_pre  ∪  R_pre ⋈ ΔS  ∪  ΔR ⋈ ΔS

so a refresh touches work proportional to the DELTAS, never |R ⋈ S|.

The 100 TB leg: both base tables live in the key-bucketed layout
(``sinks/keyed.key_bucket`` — md5-prefix buckets, hive-partitioned),
so ``ΔR ⋈ S_pre`` partition-PRUNES the stored side to the buckets
containing ΔR's join keys (bounded driver state: ≤ min(|ΔR|, n)
bucket ids) — a day's delta joins against a day's worth of touched
buckets, not a 100 TB scan. The view itself is batch-partitioned
append-only.

Exactly-once over at-least-once delivery WITHOUT a commit log: every
write in a refresh is a DYNAMIC PARTITION OVERWRITE keyed by the
batch id (``_b=<id>`` — the epoch-overwrite pattern
``streaming/dedup_stream.py`` proves), and every base read EXCLUDES
the refreshing batch's own partition (``_b != id``). A replayed or
half-crashed refresh therefore recomputes the identical delta from
the identical pre-state and overwrites the same three partitions
byte-for-byte — idempotent regardless of which subset of the three
writes survived the crash.

Updates and deletes are SIGNED deltas (differential-dataflow / CDF
multiset algebra): a delta row carries weight +1 (insert) or −1
(retract an earlier insert), an update is retract+insert in one
batch. The delta-join rule is LINEAR in the weights, so joining a
delta against the raw signed history — no pre-netting — produces
view rows whose weights sum to exactly the net join delta:
``w(r⋈s) = w(r)·w(s)``. Reads net the multiset at the end
(groupBy → Σw > 0 → restore multiplicity), which is view-sized
register math. Same algebra as matview's retractable sums, extended
to join multiplicities.

Reference parity: the reference has no join materialization at all
(its repository joins are per-request lookups, supabase_repository.py
— S12/J2); this is north-star extension surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.sinks.keyed import KB_COL, key_bucket

_META = "_joinview_meta.json"
B_COL = "_b"
S_COL = "_s"


def _net_multiset(df: DataFrame) -> DataFrame:
    """Collapse a signed row multiset to its net contents: group the
    payload, keep positive net weights, restore multiplicity. The
    one non-linear step of the algebra — runs at READ time on
    view-sized data, never inside a refresh."""
    payload = [c for c in df.columns if c != S_COL]
    net = df.groupBy(*payload).agg(F.sum(S_COL).cast("int").alias("_m")).where(
        F.col("_m") > 0
    )
    return net.select(
        *payload, F.explode(F.sequence(F.lit(1), F.col("_m"))).alias("_i")
    ).drop("_i")


def _overwrite_batch(df: DataFrame, path: str, parts: list[str]) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*parts)
        .parquet(path)
    )


class MaterializedJoin:
    """An incrementally-maintained equi-join view: ``refresh`` folds
    per-batch inserts for either or both sides; ``read_view`` scans
    the materialized join rows. Non-key column names of the two
    sides must be disjoint (validated on first refresh)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: list[str],
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key = list(key)
        self.left_path = os.path.join(path, "left")
        self.right_path = os.path.join(path, "right")
        self.view_path = os.path.join(path, "view")
        meta_path = os.path.join(path, _META)
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as fh:
                meta = json.load(fh)
            if meta["key"] != self.key or (
                num_buckets is not None and meta["num_buckets"] != num_buckets
            ):
                raise ValueError(
                    f"join view at {path} was created with key={meta['key']} "
                    f"num_buckets={meta['num_buckets']}; opening with "
                    f"key={self.key} num_buckets={num_buckets} would route "
                    "keys to the wrong buckets — match the layout"
                )
            self.num_buckets = int(meta["num_buckets"])
        else:
            self.num_buckets = int(num_buckets)
            os.makedirs(path, exist_ok=True)
            with open(meta_path, "w", encoding="utf-8") as fh:
                json.dump({"key": self.key, "num_buckets": self.num_buckets}, fh)

    # -- internals ----------------------------------------------------

    def _bucketed(self, df: DataFrame, batch_id: int) -> DataFrame:
        return df.withColumn(KB_COL, key_bucket(self.key, self.num_buckets)).withColumn(
            B_COL, F.lit(int(batch_id))
        )

    def _read_base(self, path: str, exclude_batch: int) -> DataFrame:
        # a bucket dir can exist with no batch partitions left after
        # full-retraction compaction — schema-less, same as absent
        kbs = [
            d
            for d in (os.listdir(path) if os.path.exists(path) else [])
            if d.startswith(f"{KB_COL}=")
        ]
        if not any(
            b.startswith(f"{B_COL}=")
            for kb in kbs
            for b in os.listdir(os.path.join(path, kb))
        ):
            return None
        return self.spark.read.parquet(path).where(F.col(B_COL) != int(exclude_batch))

    def _pruned(self, base: DataFrame, delta: DataFrame) -> DataFrame:
        """Partition-prune ``base`` to the buckets containing
        ``delta``'s join keys — ≤ min(|delta keys|, num_buckets)
        ids of driver state, the lookup_keyed discipline."""
        buckets = [
            r[KB_COL]
            for r in delta.select(
                key_bucket(self.key, self.num_buckets).alias(KB_COL)
            )
            .distinct()
            .collect()
        ]
        return base.where(F.col(KB_COL).isin(buckets))

    @staticmethod
    def _payload(df: DataFrame, key: list[str]) -> list[str]:
        return [c for c in df.columns if c not in (*key, KB_COL, B_COL, S_COL)]

    @staticmethod
    def _signed(df: DataFrame, sign_col: str | None) -> DataFrame:
        if sign_col is None:
            return df.withColumn(S_COL, F.lit(1))
        return df.withColumn(S_COL, F.col(sign_col).cast("int")).drop(sign_col)

    # -- API ----------------------------------------------------------

    def refresh(
        self,
        batch_id: int,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
        sign_col: str | None = None,
    ) -> None:
        """Fold one batch of signed deltas (all +1 inserts when
        ``sign_col`` is None; ±1 weights otherwise — a retraction
        must restate the retracted row exactly). Replay-idempotent:
        see module doc (batch-keyed dynamic overwrites +
        own-batch-excluding reads)."""
        dl = None if left_delta is None else self._signed(left_delta, sign_col)
        dr = None if right_delta is None else self._signed(right_delta, sign_col)
        if dl is not None and dr is not None:
            clash = (set(self._payload(dl, self.key)) & set(self._payload(dr, self.key)))
            if clash:
                raise ValueError(
                    f"non-key columns must be disjoint across sides, got {sorted(clash)}"
                )
        l_pre = self._read_base(self.left_path, batch_id)
        r_pre = self._read_base(self.right_path, batch_id)

        def piece(left: DataFrame, right: DataFrame) -> DataFrame:
            # weights multiply through the join — the linearity that
            # lets deltas join the raw signed history un-netted
            l = left.withColumnRenamed(S_COL, "_sl")
            r = right.withColumnRenamed(S_COL, "_sr")
            return (
                l.join(r, self.key)
                .withColumn(S_COL, F.col("_sl") * F.col("_sr"))
                .drop("_sl", "_sr")
            )

        pieces = []
        if dl is not None and r_pre is not None:
            pieces.append(piece(dl, self._pruned(r_pre, dl).drop(KB_COL, B_COL)))
        if dr is not None and l_pre is not None:
            pieces.append(piece(self._pruned(l_pre, dr).drop(KB_COL, B_COL), dr))
        if dl is not None and dr is not None:
            pieces.append(piece(dl, dr))
        view_delta = None
        for p in pieces:
            view_delta = p if view_delta is None else view_delta.unionByName(
                p, allowMissingColumns=False
            )
        if view_delta is not None:
            _overwrite_batch(
                view_delta.withColumn(B_COL, F.lit(int(batch_id))),
                self.view_path,
                [B_COL],
            )
        # (a batch whose deltas join nothing writes no view partition —
        # a replay recomputes the same empty delta and is a no-op)
        if dl is not None:
            _overwrite_batch(
                self._bucketed(dl, batch_id), self.left_path, [KB_COL, B_COL]
            )
        if dr is not None:
            _overwrite_batch(
                self._bucketed(dr, batch_id), self.right_path, [KB_COL, B_COL]
            )

    def compact(self, up_to_batch: int) -> None:
        """Fold every partition with ``_b ≤ up_to_batch`` into one
        netted partition at ``_b = up_to_batch`` (view and both
        bases) and drop the older directories — the small-file /
        unbounded-partition maintenance a batch-per-refresh layout
        otherwise accumulates. Netting the signed history changes no
        net content, so reads before and after are identical.

        Contract: call only for batches the UPSTREAM checkpoint has
        committed (a replay of a compacted-away batch would re-apply
        it — the same horizon rule as any log-compaction scheme).
        The swap is crash-safe in the dedup_stream sense: the netted
        partition is dynamic-overwritten FIRST at ``up_to_batch``
        (idempotent), and stale older directories are removed after —
        a crash between the two leaves extra partitions whose rows
        are now double-counted ONLY until the rerun completes, which
        is why compact itself must also be replayed to completion
        after a crash (rerunning is safe: the netted write re-derives
        from whatever partitions remain)."""
        import shutil

        hz = int(up_to_batch)

        def _stale_dirs(path: str, kept: set[str]) -> list[str]:
            """Every _b ≤ hz partition directory not just rewritten —
            including a pre-existing _b=hz one whose content netted to
            zero (dynamic overwrite replaces only partitions PRESENT
            in the new data, so 'netted away' must be deleted, not
            assumed overwritten)."""
            out = []
            for root, dirs, _ in os.walk(path):
                for d in dirs:
                    if not d.startswith(f"{B_COL}="):
                        continue
                    full = os.path.join(root, d)
                    rel = os.path.relpath(full, path)
                    if int(d.split("=")[1]) <= hz and rel not in kept:
                        out.append(full)
            return out

        for path, parts in (
            (self.view_path, [B_COL]),
            (self.left_path, [KB_COL, B_COL]),
            (self.right_path, [KB_COL, B_COL]),
        ):
            if not os.path.exists(path):
                continue
            df = self.spark.read.parquet(path).where(F.col(B_COL) <= hz)
            payload = [c for c in df.columns if c not in (S_COL, B_COL)]
            netted = (
                df.groupBy(*payload)
                .agg(F.sum(S_COL).cast("int").alias(S_COL))
                .where(F.col(S_COL) != 0)
                .withColumn(B_COL, F.lit(hz))
                # the overwrite below reads-then-replaces this path:
                # cut lineage first (the sinks/keyed discipline)
                .localCheckpoint(eager=True)
            )
            if KB_COL in parts:
                kept = {
                    f"{KB_COL}={r[KB_COL]}/{B_COL}={hz}"
                    for r in netted.select(KB_COL).distinct().collect()
                }
            else:
                kept = {f"{B_COL}={hz}"} if not netted.isEmpty() else set()
            if kept:
                _overwrite_batch(netted, path, parts)
            for full in _stale_dirs(path, kept):
                shutil.rmtree(full)

    def read_view(self) -> DataFrame:
        if not os.path.exists(self.view_path) or not any(
            d.startswith(f"{B_COL}=") for d in os.listdir(self.view_path)
        ):
            # schema unknowable before the first joined batch — and a
            # fully-retracted-then-compacted view is the same state
            raise ValueError(f"join view at {self.path} has no materialized rows yet")
        return _net_multiset(self.spark.read.parquet(self.view_path).drop(B_COL))

    def read_view_signed(self) -> DataFrame:
        """The raw signed view rows (``_s`` = ±1 weight) — the feed
        for DOWNSTREAM incremental aggregation: Σ(_s·x) / Σ(_s) over
        these rows are exactly the retraction-native sum/count
        partials of ``sinks/matview``, so an aggregate OVER the join
        stays fresh at view-delta cost with no netting step at all
        (netting is only needed when row identity matters)."""
        if not os.path.exists(self.view_path):
            raise ValueError(f"join view at {self.path} has no materialized rows yet")
        return self.spark.read.parquet(self.view_path).drop(B_COL)

    def read_left(self) -> DataFrame:
        return _net_multiset(
            self.spark.read.parquet(self.left_path).drop(KB_COL, B_COL)
        )

    def read_right(self) -> DataFrame:
        return _net_multiset(
            self.spark.read.parquet(self.right_path).drop(KB_COL, B_COL)
        )
