"""Key-bucketed merge sink: bucket-pruned upserts/deletes/SCD2 whose
write cost scales with the batch's bucket footprint, not the table.

The load-bearing assertions are FILE-LEVEL: a 1-key upsert must leave
every untouched bucket directory byte-identical (same files, sizes,
mtimes) — that is the 100 TB write-amplification claim, checked at
the filesystem, not the row level. Row-level equivalence is checked
against the full-rewrite ``merge.upsert_parquet`` / ``scd2_apply``.
"""

import os

import pytest

from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.sinks.keyed import (
    KB_COL,
    delete_keyed,
    key_bucket,
    lookup_keyed,
    read_keyed,
    scd2_apply_keyed,
    upsert_keyed,
    write_keyed,
)

N_BUCKETS = 8


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _bucket_state(path):
    """(filename, size, mtime_ns) per bucket directory."""
    state = {}
    for d in os.listdir(path):
        if not d.startswith(f"{KB_COL}="):
            continue
        full = os.path.join(path, d)
        state[d] = {
            (f, os.path.getsize(os.path.join(full, f)),
             os.stat(os.path.join(full, f)).st_mtime_ns)
            for f in os.listdir(full)
            if not f.startswith(".")
        }
    return state


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}", i * 10) for i in range(40)],
        "id long, name string, score long",
    )


class TestUpsertKeyed:
    def test_matches_full_rewrite_semantics(self, spark, base, tmp_path):
        from dbm_nca_ph_etl_spark.sinks.merge import upsert_parquet

        keyed_p = str(tmp_path / "keyed")
        full_p = str(tmp_path / "full")
        write_keyed(base, keyed_p, ["id"], N_BUCKETS)
        base.write.parquet(full_p)
        batch = spark.createDataFrame(
            [(3, "updated_3", 999), (41, "new_41", 410), (7, "updated_7", 777)],
            "id long, name string, score long",
        )
        upsert_keyed(spark, batch, keyed_p, ["id"])
        upsert_parquet(spark, batch, full_p, ["id"])
        got = _rows(read_keyed(spark, keyed_p))
        want = _rows(spark.read.parquet(full_p))
        assert got == want

    def test_one_key_touches_one_bucket_only(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        before = _bucket_state(p)
        assert len(before) > 1, "need multiple buckets for the claim"
        batch = spark.createDataFrame(
            [(3, "updated_3", 999)], "id long, name string, score long"
        )
        touched = upsert_keyed(spark, batch, p, ["id"])
        after = _bucket_state(p)
        # the batch key lands in exactly one bucket...
        kb = batch.select(key_bucket(["id"], N_BUCKETS).alias("kb")).head().kb
        assert touched == [kb]
        # ...and every OTHER bucket directory is file-identical
        for d, files in before.items():
            if d == f"{KB_COL}={kb}":
                assert after[d] != files, "touched bucket must be rewritten"
            else:
                assert after[d] == files, f"untouched bucket {d} was rewritten"
        # row-level: only id=3 changed
        got = {r.id: (r.name, r.score) for r in read_keyed(spark, p).collect()}
        assert got[3] == ("updated_3", 999) and len(got) == 40

    def test_replay_idempotent(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        batch = spark.createDataFrame(
            [(5, "v2", 50), (99, "new", 990)], "id long, name string, score long"
        )
        upsert_keyed(spark, batch, p, ["id"])
        first = _rows(read_keyed(spark, p))
        upsert_keyed(spark, batch, p, ["id"])  # at-least-once redelivery
        assert _rows(read_keyed(spark, p)) == first

    def test_meta_drift_fails_loudly(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        batch = spark.createDataFrame([(1, "x", 1)], "id long, name string, score long")
        with pytest.raises(ValueError, match="drifted|keys"):
            upsert_keyed(spark, batch, p, ["name"])

    def test_missing_table_fails(self, spark, base, tmp_path):
        with pytest.raises(FileNotFoundError):
            upsert_keyed(spark, base, str(tmp_path / "nope"), ["id"])


class TestDeleteAndLookup:
    def test_delete_prunes_and_removes(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        before = _bucket_state(p)
        doomed = spark.createDataFrame([(11,)], "id long")
        touched = delete_keyed(spark, p, doomed, ["id"])
        assert len(touched) == 1
        after = _bucket_state(p)
        unchanged = [d for d in before if d != f"{KB_COL}={touched[0]}"]
        assert all(after[d] == before[d] for d in unchanged)
        ids = {r.id for r in read_keyed(spark, p).collect()}
        assert ids == set(range(40)) - {11}

    def test_lookup_returns_probed_keys(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        probe = spark.createDataFrame([(2,), (17,), (555,)], "id long")
        got = {r.id for r in lookup_keyed(spark, p, probe, ["id"]).collect()}
        assert got == {2, 17}


class TestScd2Keyed:
    def _dim(self, spark):
        # open versions for 30 keys, plus closed history for key 0
        cur = spark.createDataFrame(
            [(i, i * 10, 100, None) for i in range(30)],
            "id long, bal long, valid_from long, valid_to long",
        )
        hist = spark.createDataFrame(
            [(0, 1, 50, 100)], "id long, bal long, valid_from long, valid_to long"
        )
        return cur.unionByName(hist)

    def test_matches_pure_operator_and_prunes(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sinks.merge import scd2_apply

        dim = self._dim(spark)
        p = str(tmp_path / "dim")
        write_keyed(dim, p, ["id"], N_BUCKETS)
        before = _bucket_state(p)
        changes = spark.createDataFrame([(7, 777)], "id long, bal long")
        touched = scd2_apply_keyed(spark, p, changes, ["id"], effective=200)
        after = _bucket_state(p)
        kb = changes.select(key_bucket(["id"], N_BUCKETS).alias("kb")).head().kb
        assert touched == [kb]
        unchanged = [d for d in before if d != f"{KB_COL}={kb}"]
        assert all(after[d] == before[d] for d in unchanged), (
            "scd2 batch rewrote an untouched bucket"
        )
        got = _rows(read_keyed(spark, p).select("id", "bal", "valid_from", "valid_to"))
        want = _rows(scd2_apply(dim, changes, ["id"], effective=200))
        assert got == want
        # key 7: closed old version + new open version
        k7 = sorted(
            (r.bal, r.valid_from, r.valid_to)
            for r in read_keyed(spark, p).where(F.col("id") == 7).collect()
        )
        assert k7 == [(70, 100, 200), (777, 200, None)]

    def test_noop_redelivery_rewrites_nothing_new(self, spark, tmp_path):
        dim = self._dim(spark)
        p = str(tmp_path / "dim")
        write_keyed(dim, p, ["id"], N_BUCKETS)
        changes = spark.createDataFrame([(7, 777)], "id long, bal long")
        scd2_apply_keyed(spark, p, changes, ["id"], effective=200)
        first = _rows(read_keyed(spark, p))
        scd2_apply_keyed(spark, p, changes, ["id"], effective=300)  # same values
        assert _rows(read_keyed(spark, p)) == first, "no-op change must not version"


class TestKeyedPlans:
    def test_lookup_prunes_partitions(self, spark, base, tmp_path):
        """The probed keys' buckets must reach the scan as
        PartitionFilters — the read-side payoff of the layout."""
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        probe = spark.createDataFrame([(7,)], "id long")
        plan = lookup_keyed(spark, p, probe, ["id"])._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_kb" in plan, plan
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "_kb" in m.group(1), f"no _kb partition filter: {m}"


class TestSchemaEvolution:
    """evolve_schema: widen-on-merge with sidecar-tracked schema —
    old buckets never rewritten, new column reads null there."""

    def test_strict_mode_fails_loudly_on_drift(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        batch = spark.createDataFrame(
            [(7, "name_7b", 99, "NL")],
            "id long, name string, score long, country string",
        )
        with pytest.raises(ValueError, match="schema drift"):
            upsert_keyed(spark, batch, p, ["id"])

    def test_widen_adds_column_null_for_old_rows(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        before = _bucket_state(p)
        batch = spark.createDataFrame(
            [(7, "name_7b", 99, "NL")],
            "id long, name string, score long, country string",
        )
        touched = upsert_keyed(spark, batch, p, ["id"], evolve_schema=True)
        assert len(touched) == 1
        after = _bucket_state(p)
        for b, st in before.items():
            if int(b.split("=")[1]) not in touched:
                assert after[b] == st, f"untouched bucket {b} was rewritten"
        got = read_keyed(spark, p)
        assert got.columns == ["id", "name", "score", "country"]
        rows = {r.id: (r.name, r.score, r.country) for r in got.collect()}
        assert rows[7] == ("name_7b", 99, "NL")
        assert rows[3] == ("name_3", 30, None)  # untouched bucket: null
        assert len(rows) == 40

    def test_batch_missing_column_nulls_replaced_row(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        batch = spark.createDataFrame([(5, "five")], "id long, name string")
        upsert_keyed(spark, batch, p, ["id"], evolve_schema=True)
        rows = {r.id: (r.name, r.score) for r in read_keyed(spark, p).collect()}
        assert rows[5] == ("five", None)  # replace is the whole row
        assert rows[6] == ("name_6", 60)

    def test_type_conflict_always_fails(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        batch = spark.createDataFrame(
            [(7, "x", "not-a-long")], "id long, name string, score string"
        )
        with pytest.raises(ValueError, match="type conflict"):
            upsert_keyed(spark, batch, p, ["id"], evolve_schema=True)

    def test_evolved_table_supports_lookup_and_delete(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        batch = spark.createDataFrame(
            [(41, "new", 410, "DE")],
            "id long, name string, score long, country string",
        )
        upsert_keyed(spark, batch, p, ["id"], evolve_schema=True)
        probe = spark.createDataFrame([(41,), (3,)], "id long")
        got = _rows(lookup_keyed(spark, p, probe, ["id"]))
        assert got == [(3, "name_3", 30, None), (41, "new", 410, "DE")]
        delete_keyed(spark, p, spark.createDataFrame([(41,)], "id long"), ["id"])
        assert read_keyed(spark, p).where("id = 41").count() == 0
        assert read_keyed(spark, p).columns == ["id", "name", "score", "country"]

    def test_second_evolution_accumulates(self, spark, base, tmp_path):
        p = str(tmp_path / "keyed")
        write_keyed(base, p, ["id"], N_BUCKETS)
        upsert_keyed(
            spark,
            spark.createDataFrame(
                [(1, "a", 1, "NL")],
                "id long, name string, score long, country string",
            ),
            p,
            ["id"],
            evolve_schema=True,
        )
        upsert_keyed(
            spark,
            spark.createDataFrame(
                [(2, "b", 2, 3.5)],
                "id long, name string, score long, rating double",
            ),
            p,
            ["id"],
            evolve_schema=True,
        )
        got = read_keyed(spark, p)
        assert set(got.columns) == {"id", "name", "score", "country", "rating"}
        rows = {r.id: (r.country, r.rating) for r in got.collect()}
        assert rows[1] == ("NL", None)
        assert rows[2] == (None, 3.5)
        assert rows[10] == (None, None)


class _ObjectStoreFS:
    """Disk-backed fake with object-store semantics (no atomic
    rename, single-PUT publishes) recording every sidecar write —
    proves the keyed layout's non-Spark IO all flows through the
    lakefs seam and never needs a rename."""

    atomic_rename = False

    def __init__(self):
        from dbm_nca_ph_etl_spark.sources.lakefs import PosixLakeFS

        self._inner = PosixLakeFS()
        self.puts: list[str] = []
        self.reads: list[str] = []

    def ls(self, path, suffixes=None):
        return self._inner.ls(path, suffixes)

    def is_dir(self, path):
        return self._inner.is_dir(path)

    def read_bytes(self, path):
        self.reads.append(path)
        return self._inner.read_bytes(path)

    def write_bytes(self, path, data):
        self.puts.append(path)
        with open(path, "wb") as fh:  # one PUT, no tmp+rename
            fh.write(data)

    def put_if_absent(self, path, data):
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


class TestKeyedOnObjectStore:
    """Full keyed lifecycle with the sidecar/meta IO routed through
    an injected object-store adapter (atomic_rename=False)."""

    def test_lifecycle_and_sidecar_routing(self, spark, base, tmp_path):
        fs = _ObjectStoreFS()
        p = str(tmp_path / "t")
        write_keyed(base, p, ["id"], N_BUCKETS, fs=fs)
        upsert_keyed(
            spark,
            spark.createDataFrame([(3, "upd", 999)], "id long, name string, score long"),
            p,
            ["id"],
            fs=fs,
        )
        got = _rows(
            lookup_keyed(
                spark, p, spark.createDataFrame([(3,)], "id long"), ["id"], fs=fs
            ).select("id", "name", "score")
        )
        assert got == [(3, "upd", 999)]
        delete_keyed(
            spark, p, spark.createDataFrame([(3,)], "id long"), ["id"], fs=fs
        )
        assert _rows(read_keyed(spark, p, fs=fs).where(F.col("id") == 3)) == []
        assert read_keyed(spark, p, fs=fs).count() == 39
        # the meta sidecar flowed through the injected adapter
        assert any(q.endswith("_keyed_meta.json") for q in fs.puts)
        assert any(q.endswith("_keyed_meta.json") for q in fs.reads)

    def test_schema_evolution_sidecar_through_seam(self, spark, base, tmp_path):
        fs = _ObjectStoreFS()
        p = str(tmp_path / "t")
        write_keyed(base, p, ["id"], N_BUCKETS, fs=fs)
        evolved = spark.createDataFrame(
            [(1, "n1", 11, "extra")], "id long, name string, score long, tag string"
        )
        upsert_keyed(spark, evolved, p, ["id"], evolve_schema=True, fs=fs)
        # sidecar schema rewrite went through the seam (meta written twice)
        metas = [q for q in fs.puts if q.endswith("_keyed_meta.json")]
        assert len(metas) == 2
        out = read_keyed(spark, p, fs=fs)
        assert "tag" in out.columns
        assert out.where(F.col("id") == 1).collect()[0].tag == "extra"
        assert out.where(F.col("id") == 2).collect()[0].tag is None


class TestDeleteEmptiedBucket:
    """delete_keyed on a bucket whose every key is deleted: dynamic
    partition overwrite never touches a partition absent from the
    written data, so the emptied directory must be removed explicitly
    — and a crash between the overwrite and that removal must replay
    to convergence (T6 at-least-once discipline)."""

    def _mk(self, spark, tmp_path):
        path = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], "id long, name string"
        )
        write_keyed(base, path, ["id"], num_buckets=4)
        return path

    def test_bucket_emptied_by_delete_disappears(self, spark, tmp_path):
        path = self._mk(spark, tmp_path)
        base = spark.read.parquet(path)
        victim = base.select(KB_COL).first()[0]
        doomed = base.where(F.col(KB_COL) == victim).select("id")
        n_doomed = doomed.count()
        touched = delete_keyed(spark, path, doomed, ["id"])
        assert victim in touched
        got = read_keyed(spark, path)
        assert got.count() == 40 - n_doomed
        # the directory itself is gone — no stale files behind the scan
        import os
        assert not os.path.exists(os.path.join(path, f"{KB_COL}={victim}"))

    def test_crash_before_dir_removal_replays_to_convergence(
        self, spark, tmp_path, monkeypatch
    ):
        from dbm_nca_ph_etl_spark.sources import lakefs as LFS

        path = self._mk(spark, tmp_path)
        base = spark.read.parquet(path)
        victim = base.select(KB_COL).first()[0]
        doomed = (
            base.where(F.col(KB_COL) == victim)
            .select("id")
            .localCheckpoint(eager=True)
        )

        real = LFS.PosixLakeFS.delete_dir
        calls = {"n": 0}

        def crashing(self_, p):
            calls["n"] += 1
            raise RuntimeError("crash before emptied-dir removal")

        monkeypatch.setattr(LFS.PosixLakeFS, "delete_dir", crashing)
        with pytest.raises(RuntimeError, match="crash before"):
            delete_keyed(spark, path, doomed, ["id"])
        assert calls["n"] == 1
        # crash window: the old files are still visible (documented
        # at-least-once exposure), nothing is torn
        assert read_keyed(spark, path).count() == 40

        monkeypatch.setattr(LFS.PosixLakeFS, "delete_dir", real)
        # replay converges: same batch, same outcome as a clean run
        touched = delete_keyed(spark, path, doomed, ["id"])
        assert victim in touched
        import os
        assert not os.path.exists(os.path.join(path, f"{KB_COL}={victim}"))
        ids = {r.id for r in read_keyed(spark, path).collect()}
        assert not ids & {r.id for r in doomed.collect()}
