"""MaterializedJoin: delta-rule incremental equi-join maintenance —
folded view == direct join under any batch interleaving, replay
idempotence, bucket-pruned stored-side reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.sinks.joinview import MaterializedJoin


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k long, o string")


def _custs(spark, rows):
    return spark.createDataFrame(rows, "k long, c string")


def _view_rows(v):
    return sorted((r.k, r.o, r.c) for r in v.read_view().collect())


class TestMaterializedJoin:
    def test_folded_equals_direct_any_interleaving(self, spark, tmp_path):
        lrows = [(i, f"o{i}") for i in range(30)]
        rrows = [(i % 10, f"c{j}") for j, i in enumerate(range(20))]
        direct = sorted(
            (lk, lo, rc)
            for lk, lo in lrows
            for rk, rc in rrows
            if lk == rk
        )
        # interleaving A: left then right then mixed
        va = MaterializedJoin(spark, str(tmp_path / "a"), ["k"])
        va.refresh(1, left_delta=_orders(spark, lrows[:10]))
        va.refresh(2, right_delta=_custs(spark, rrows[:5]))
        va.refresh(
            3,
            left_delta=_orders(spark, lrows[10:]),
            right_delta=_custs(spark, rrows[5:]),
        )
        assert _view_rows(va) == direct
        # interleaving B: everything in one batch
        vb = MaterializedJoin(spark, str(tmp_path / "b"), ["k"])
        vb.refresh(
            7, left_delta=_orders(spark, lrows), right_delta=_custs(spark, rrows)
        )
        assert _view_rows(vb) == direct

    def test_replay_idempotent(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        v.refresh(1, left_delta=_orders(spark, [(1, "o1"), (2, "o2")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c1"), (1, "c1b")]))
        once = _view_rows(v)
        # re-deliver batch 2 (same payload): overwrites its own
        # partitions byte-identically, view unchanged
        v.refresh(2, right_delta=_custs(spark, [(1, "c1"), (1, "c1b")]))
        assert _view_rows(v) == once
        assert sorted((r.k, r.c) for r in v.read_right().collect()) == [
            (1, "c1"),
            (1, "c1b"),
        ]

    def test_no_join_batch_then_later_match(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        v.refresh(1, left_delta=_orders(spark, [(5, "o5")]))
        with pytest.raises(ValueError, match="no materialized rows"):
            v.read_view()
        v.refresh(2, right_delta=_custs(spark, [(5, "c5")]))
        assert _view_rows(v) == [(5, "o5", "c5")]

    def test_payload_clash_guard(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        with pytest.raises(ValueError, match="disjoint"):
            v.refresh(
                1,
                left_delta=_orders(spark, [(1, "x")]),
                right_delta=spark.createDataFrame([(1, "y")], "k long, o string"),
            )

    def test_meta_drift_guard(self, spark, tmp_path):
        MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=8)
        with pytest.raises(ValueError, match="wrong buckets"):
            MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=16)

    def test_stored_side_read_is_bucket_pruned(self, spark, tmp_path):
        """The ΔR ⋈ S_pre scan must touch only buckets containing
        ΔR's keys — asserted at the plan level via the partition
        filter on _kb."""
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=8)
        v.refresh(1, right_delta=_custs(spark, [(i, f"c{i}") for i in range(64)]))
        delta = _orders(spark, [(3, "o3")])
        pruned = v._pruned(v._read_base(v.right_path, v._committed_ids()), delta)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "_kb" in plan
        n_parts = pruned.select("_kb").distinct().count()
        assert n_parts == 1  # one key -> one bucket survives the scan


class TestSignedDeltas:
    """±1-weight deltas: updates and deletes flow through the linear
    join algebra; reads net the multiset."""

    def test_update_and_delete_converge_to_final_state(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        v.refresh(1, left_delta=_orders(spark, [(1, "o1"), (2, "o2"), (3, "o3")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c1"), (2, "c2"), (3, "c3")]))
        # batch 3: update o2 -> o2x (retract + insert), delete o3
        upd = spark.createDataFrame(
            [(2, "o2", -1), (2, "o2x", 1), (3, "o3", -1)], "k long, o string, w int"
        )
        v.refresh(3, left_delta=upd, sign_col="w")
        assert _view_rows(v) == [(1, "o1", "c1"), (2, "o2x", "c2")]
        assert sorted((r.k, r.o) for r in v.read_left().collect()) == [
            (1, "o1"),
            (2, "o2x"),
        ]

    def test_right_side_retraction_cascades(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        v.refresh(
            1,
            left_delta=_orders(spark, [(7, "a"), (7, "b")]),
            right_delta=_custs(spark, [(7, "c7")]),
        )
        assert _view_rows(v) == [(7, "a", "c7"), (7, "b", "c7")]
        gone = spark.createDataFrame([(7, "c7", -1)], "k long, c string, w int")
        v.refresh(2, right_delta=gone, sign_col="w")
        assert _view_rows(v) == []

    def test_duplicate_multiplicity_preserved(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        v.refresh(1, left_delta=_orders(spark, [(1, "same"), (1, "same")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c")]))
        assert _view_rows(v) == [(1, "same", "c"), (1, "same", "c")]
        one_less = spark.createDataFrame([(1, "same", -1)], "k long, o string, w int")
        v.refresh(3, left_delta=one_less, sign_col="w")
        assert _view_rows(v) == [(1, "same", "c")]

    def test_signed_replay_idempotent(self, spark, tmp_path):
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"])
        v.refresh(
            1,
            left_delta=_orders(spark, [(1, "o1")]),
            right_delta=_custs(spark, [(1, "c1")]),
        )
        d = spark.createDataFrame([(1, "o1", -1)], "k long, o string, w int")
        v.refresh(2, left_delta=d, sign_col="w")
        v.refresh(2, left_delta=d, sign_col="w")  # re-delivery
        assert _view_rows(v) == []
        v.refresh(3, left_delta=_orders(spark, [(1, "o1b")]))
        assert _view_rows(v) == [(1, "o1b", "c1")]


class TestCompact:
    def test_compact_preserves_net_content_and_drops_dirs(self, spark, tmp_path):
        import os

        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4)
        v.refresh(1, left_delta=_orders(spark, [(1, "o1"), (2, "o2")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c1"), (2, "c2")]))
        upd = spark.createDataFrame(
            [(2, "o2", -1), (2, "o2x", 1)], "k long, o string, w int"
        )
        v.refresh(3, left_delta=upd, sign_col="w")
        before = _view_rows(v)
        lbefore = sorted((r.k, r.o) for r in v.read_left().collect())
        v.compact(3)
        assert _view_rows(v) == before
        assert sorted((r.k, r.o) for r in v.read_left().collect()) == lbefore
        # one batch partition left per surviving bucket / in the view —
        # the fresh reserved compaction-output id, never an in-place fold
        vdirs = [d for d in os.listdir(v.view_path) if d.startswith("_b=")]
        assert vdirs == ["_b=-1"]
        for kb in os.listdir(v.left_path):
            if kb.startswith("_kb="):
                bs = os.listdir(os.path.join(v.left_path, kb))
                assert all(b == "_b=-1" for b in bs if b.startswith("_b="))

    def test_compact_removes_fully_retracted_content(self, spark, tmp_path):
        import os

        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4)
        v.refresh(
            1,
            left_delta=_orders(spark, [(1, "o1")]),
            right_delta=_custs(spark, [(1, "c1")]),
        )
        v.refresh(
            2,
            left_delta=spark.createDataFrame(
                [(1, "o1", -1)], "k long, o string, w int"
            ),
            sign_col="w",
        )
        v.compact(2)
        # fully-retracted + compacted == never materialized
        with pytest.raises(ValueError, match="no materialized rows"):
            v.read_view()
        # nothing nets positive on the left: all its batch dirs gone
        for kb in os.listdir(v.left_path):
            if kb.startswith("_kb="):
                assert not [
                    d
                    for d in os.listdir(os.path.join(v.left_path, kb))
                    if d.startswith("_b=")
                ]
        # and refreshes keep working after compaction
        v.refresh(5, left_delta=_orders(spark, [(1, "o1b")]))
        assert _view_rows(v) == [(1, "o1b", "c1")]


class _CrashFS:
    """Disk-backed fake with OBJECT-STORE semantics plus fault
    injection: raises once at an armed path substring, so tests can
    cut a refresh/compact at an exact protocol step and replay it."""

    atomic_rename = False

    def __init__(self):
        from dbm_nca_ph_etl_spark.sources.lakefs import PosixLakeFS

        self._inner = PosixLakeFS()
        self.puts: list[str] = []
        self._crash_at: str | None = None

    def arm(self, path_substr: str) -> None:
        self._crash_at = path_substr

    def _maybe_crash(self, path: str) -> None:
        if self._crash_at is not None and self._crash_at in path:
            self._crash_at = None
            raise RuntimeError(f"injected crash at {path}")

    def ls(self, path, suffixes=None):
        return self._inner.ls(path, suffixes)

    def is_dir(self, path):
        return self._inner.is_dir(path)

    def read_bytes(self, path):
        return self._inner.read_bytes(path)

    def write_bytes(self, path, data):
        self._maybe_crash(path)
        self.puts.append(path)
        with open(path, "wb") as fh:  # single PUT, no tmp+rename
            fh.write(data)

    def put_if_absent(self, path, data):
        self._maybe_crash(path)
        self.puts.append(path)
        return self._inner.put_if_absent(path, data)

    def exists(self, path):
        return self._inner.exists(path)

    def size(self, path):
        return self._inner.size(path)

    def mkdirs(self, path):
        self._inner.mkdirs(path)

    def delete_dir(self, path):
        self._inner.delete_dir(path)

    def delete_file(self, path):
        self._inner.delete_file(path)

    def ls_dirs(self, path):
        return self._inner.ls_dirs(path)


class TestExactlyOnceCommitProtocol:
    """The dual-writer crash interleaving that own-batch-exclusion
    schemes double-count, and crash-safe compaction roll-forward —
    all through the object-store fake (atomic_rename=False), proving
    the layout never relies on rename atomicity."""

    def test_crashed_refresh_is_invisible_and_replay_does_not_double_count(
        self, spark, tmp_path
    ):
        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        # left epoch 0 writes its data partitions but crashes before
        # the commit marker PUT
        fs.arm("_commits/b0.json")
        with pytest.raises(RuntimeError, match="injected crash"):
            v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        # the half-written batch is invisible: a right batch that runs
        # meanwhile must NOT join it ...
        v.refresh(3, right_delta=_custs(spark, [(1, "c1")]))
        with pytest.raises(ValueError, match="no materialized rows"):
            v.read_view()
        # ... so when left's checkpoint replays epoch 0, the pair is
        # counted exactly once (by the replay, which now sees right's
        # committed batch) — not once per writer
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        assert _view_rows(v) == [(1, "o1", "c1")]

    def test_committed_refresh_replay_is_skipped(self, spark, tmp_path):
        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        v.refresh(1, right_delta=_custs(spark, [(1, "c1")]))
        n_puts = len(fs.puts)
        # redelivery of a committed epoch: no reads, no writes, no
        # dependence on the other side's CURRENT state
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        assert len(fs.puts) == n_puts
        assert _view_rows(v) == [(1, "o1", "c1")]

    def test_compact_crash_before_swap_rolls_forward(self, spark, tmp_path):
        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(1, left_delta=_orders(spark, [(1, "o1"), (2, "o2")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c1"), (2, "c2")]))
        before = _view_rows(v)
        # crash AFTER the netted output partitions are written but
        # BEFORE the horizon swap publishes them
        fs.arm("_horizon.json")
        with pytest.raises(RuntimeError, match="injected crash"):
            v.compact(2)
        # readers still see the old state, exactly once (the netted
        # output is on disk but uncommitted)
        assert _view_rows(v) == before
        # the rerun rolls the pinned intent forward: same content,
        # sources GC'd, one reserved-id output partition
        v.compact(2)
        assert _view_rows(v) == before
        import os

        vdirs = [d for d in os.listdir(v.view_path) if d.startswith("_b=")]
        assert vdirs == ["_b=-1"]

    def test_compact_crash_during_gc_finishes_on_rerun(self, spark, tmp_path):
        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(1, left_delta=_orders(spark, [(1, "o1")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c1")]))
        before = _view_rows(v)
        # the swap landed; crash while deleting retired markers
        fs.arm("_commits/b1.json")

        orig = fs.delete_file

        def crashing_delete(path):
            fs._maybe_crash(path)
            orig(path)

        fs.delete_file = crashing_delete
        with pytest.raises(RuntimeError, match="injected crash"):
            v.compact(2)
        # post-swap state is already live and single-counted
        assert _view_rows(v) == before
        v.compact(2)  # finishes the GC; content unchanged
        assert _view_rows(v) == before

    def test_sidecar_io_flows_through_injected_fs(self, spark, tmp_path):
        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(1, left_delta=_orders(spark, [(1, "o1")]))
        v.refresh(2, right_delta=_custs(spark, [(1, "c1")]))
        v.compact(2)
        joined = "\n".join(fs.puts)
        assert "_joinview_meta.json" in joined
        assert "_commits/b1.json" in joined
        assert "_commits/_intent.json" in joined
        assert "_commits/_horizon.json" in joined
        assert "_lease.json" in joined

    def test_fenced_refresh_stays_uncommitted(self, spark, tmp_path):
        """A refresh that loses its lease mid-merge must raise
        CommitFenced BEFORE the marker PUT — the batch stays
        invisible and a replay converges."""
        from dbm_nca_ph_etl_spark.sinks.txlog import CommitFenced

        class _StolenLeaseFS(_CrashFS):
            """Simulates lease expiry + steal: the holder's fencing
            re-read finds someone else's lease."""

            def __init__(self):
                super().__init__()
                self.steal_next = False

            def read_bytes(self, path):
                if self.steal_next and path.endswith("_lease.json"):
                    self.steal_next = False
                    self._inner.write_bytes(
                        path,
                        # foreign holder (fences us) but already
                        # expired (the replay can re-acquire)
                        b'{"holder": "thief", "generation": 99,'
                        b' "ts": 0.0, "ttl_s": 0.001}',
                    )
                return self._inner.read_bytes(path)

        fs = _StolenLeaseFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(1, right_delta=_custs(spark, [(1, "c1")]))
        fs.steal_next = True
        with pytest.raises(CommitFenced):
            v.refresh(2, left_delta=_orders(spark, [(1, "o1")]))
        # the fenced batch is invisible to readers and delta joins
        with pytest.raises(ValueError, match="no materialized rows"):
            v.read_view()
        # replay (lease back in legitimate hands) commits exactly once
        v.refresh(2, left_delta=_orders(spark, [(1, "o1")]))
        assert _view_rows(v) == [(1, "o1", "c1")]


class TestCompactFencing:
    """The compaction half of the fencing story (ADVICE r6): a
    compactor stalled past its lease TTL must not, on resume, re-PUT
    a stale horizon pointing at a GC'd target or GC a newer
    compaction's output — and roll-forward GC must only touch the
    intent's pinned sources."""

    def test_stale_compactor_cannot_destroy_newer_compaction(self, spark, tmp_path):
        import json
        import time

        from dbm_nca_ph_etl_spark.sinks.txlog import CommitFenced, WriterLease
        from dbm_nca_ph_etl_spark.sources.lakefs import join as pjoin

        fs = _CrashFS()
        root = str(tmp_path / "v")
        v = MaterializedJoin(spark, root, ["k"], num_buckets=4, fs=fs)
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        v.refresh(1, right_delta=_custs(spark, [(1, "c1")]))
        # compactor A pins its intent under a short-TTL lease, then
        # stalls mid-phase-1 (phase 1 runs full Spark jobs — easily
        # longer than any TTL). We hold A's state here.
        lease_a = WriterLease(root, ttl_s=0.05, fs=fs)
        lease_a.acquire()
        intent_a = {
            "hz": 1,
            "target": -1,
            "sources": [b for b in v._committed_ids() if b <= 1],
        }
        fs.write_bytes(
            pjoin(v._commits_dir, "_intent.json"),
            json.dumps(intent_a).encode("utf-8"),
        )
        time.sleep(0.1)  # A's lease expires
        # a later writer steals the lease, adds batches, and a LATER
        # compaction rolls A's intent forward then compacts past it
        v.refresh(2, left_delta=_orders(spark, [(2, "o2")]))
        v.refresh(3, right_delta=_custs(spark, [(2, "c2")]))
        v.compact(3)
        want = _view_rows(v)
        assert want == [(1, "o1", "c1"), (2, "o2", "c2")]
        # A resumes: both its horizon PUT and its GC must be fenced —
        # un-fenced, A would re-publish {hz:1, output:-1} (whose
        # output was GC'd) and then GC the newer output partition
        with pytest.raises(CommitFenced):
            v._run_compact(intent_a, lease_a)
        assert _view_rows(v) == want

    def test_refresh_rejects_new_batch_below_pending_horizon(self, spark, tmp_path):
        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        v.refresh(1, right_delta=_custs(spark, [(1, "c1")]))
        fs.arm("_horizon.json")
        with pytest.raises(RuntimeError, match="injected crash"):
            v.compact(5)  # intent pinned at hz=5, crash before swap
        # a NEW batch id at-or-below the pinned horizon would be
        # invisible forever after roll-forward — fail loudly instead
        with pytest.raises(ValueError, match="pending compaction"):
            v.refresh(3, left_delta=_orders(spark, [(2, "o2")]))
        # a REPLAY of a pinned source is still the usual silent no-op
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        # roll forward, then ids above the horizon flow normally
        v.compact(5)
        v.refresh(6, left_delta=_orders(spark, [(1, "o1b")]))
        assert _view_rows(v) == [(1, "o1", "c1"), (1, "o1b", "c1")]

    def test_gc_spares_non_source_partitions(self, spark, tmp_path):
        """Defense-in-depth behind the refresh guard: even if a batch
        is forged below a pinned horizon (a broken upstream bypassing
        the API), roll-forward GC deletes ONLY the pinned sources —
        the rogue partition and marker stay recoverable on disk."""
        import os

        fs = _CrashFS()
        v = MaterializedJoin(spark, str(tmp_path / "v"), ["k"], num_buckets=4, fs=fs)
        v.refresh(0, left_delta=_orders(spark, [(1, "o1")]))
        v.refresh(1, right_delta=_custs(spark, [(1, "c1")]))
        fs.arm("_horizon.json")
        with pytest.raises(RuntimeError, match="injected crash"):
            v.compact(5)  # intent pinned: sources [0, 1], hz 5
        rogue_dir = os.path.join(v.view_path, "_b=3")
        fs.mkdirs(rogue_dir)
        fs.put_if_absent(v._marker(3), b"{}")
        v.compact(5)  # roll-forward completes
        assert fs.exists(rogue_dir), "non-source partition must survive GC"
        assert fs.exists(v._marker(3)), "non-source marker must survive GC"
        assert _view_rows(v) == [(1, "o1", "c1")]
