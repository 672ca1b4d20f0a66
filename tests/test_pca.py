"""PCA suite: exact-integer moment statistics, trained-model
determinism under repartitioning, dominant-direction recovery on an
anisotropic corpus, and the projected-probe ANN leg."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.similarity import (
    PCA_SCALE,
    cosine_topk,
    gram_sums,
    mat_project,
    pca_topk,
    pca_train,
)


def _vec_df(spark, mat, start_id=0):
    rows = [
        Row(vec_id=start_id + i, embedding=[float(x) for x in row])
        for i, row in enumerate(mat)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def aniso(spark):
    """120 vectors in R^8 dominated by one direction u plus small
    deterministic off-axis jitter — eigh must find u first."""
    rng = np.random.default_rng(7)
    u = np.array([3.0, 1.0, -2.0, 0.5, 0.0, 1.5, -1.0, 0.25])
    u = u / np.linalg.norm(u)
    coef = rng.normal(0.0, 4.0, size=120)
    noise = rng.normal(0.0, 0.15, size=(120, 8))
    return _vec_df(spark, np.outer(coef, u) + noise), u


class TestGramSums:
    def test_matches_numpy_exactly(self, spark):
        mat = np.array(
            [[0.5, -1.25, 2.0], [0.0, 3.5, -0.75], [1.0, 1.0, 1.0], [-2.0, 0.25, 0.5]]
        )
        out = {
            (r["i"], r["j"]): int(r["moment_sum"])
            for r in gram_sums(_vec_df(spark, mat), dim=3).collect()
        }
        q = np.floor(mat * PCA_SCALE + 0.5).astype(np.int64)
        g = q.T @ q
        for i in range(3):
            for j in range(i, 3):
                assert out[(i, j)] == g[i, j]
            assert out[(i, -1)] == q[:, i].sum()
        assert out[(-1, -1)] == 4
        assert len(out) == 3 * 4 // 2 + 3 + 1

    def test_partition_invariant(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = {
            (r["i"], r["j"]): int(r["moment_sum"])
            for r in gram_sums(emb.repartition(1)).collect()
        }
        b = {
            (r["i"], r["j"]): int(r["moment_sum"])
            for r in gram_sums(emb.repartition(7)).collect()
        }
        assert a == b

    def test_overflow_guard(self, spark):
        big = _vec_df(spark, np.array([[1.0e3, 0.0], [0.0, 1.0]]) * 1e2)
        with pytest.raises(Exception, match="2\\^24"):
            gram_sums(big, dim=2).collect()


class TestPcaTrain:
    def test_recovers_dominant_direction(self, spark, aniso):
        df, u = aniso
        mean, comps, evals = pca_train(df, dim=8, p=3)
        assert abs(float(np.dot(comps[0], u))) > 0.99
        assert evals[0] > 10 * evals[1] > 0
        # sign canonicalization: largest-|coordinate| entry positive
        c0 = np.asarray(comps[0])
        assert c0[int(np.argmax(np.abs(c0)))] > 0

    def test_model_bitwise_partition_invariant(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        m1 = pca_train(emb.repartition(1), dim=64, p=4)
        m7 = pca_train(emb.repartition(7), dim=64, p=4)
        assert m1 == m7  # exact-integer stats -> identical eigh input

    def test_uncentered_mode_zero_mean(self, spark, aniso):
        df, _ = aniso
        mean, comps, _ = pca_train(df, dim=8, p=2, center=False)
        assert mean == [0.0] * 8

    def test_empty_corpus_raises(self, spark, aniso):
        df, _ = aniso
        with pytest.raises(ValueError, match="empty"):
            pca_train(df.where(F.lit(False)), dim=8, p=2)


class TestMatProject:
    def test_matches_numpy_with_centering(self, spark):
        mat = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        comps = [[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]]
        mean = [1.0, 1.0, 1.0]
        rows = {
            r["id"]: r["_p"]
            for r in mat_project(_vec_df(spark, mat), comps, mean).collect()
        }
        want = (mat - np.asarray(mean)) @ np.asarray(comps).T
        for i in range(2):
            assert rows[i] == pytest.approx(list(want[i]), abs=1e-12)

    def test_carries_full_dim_norm(self, spark):
        mat = np.array([[3.0, 4.0]])
        out = mat_project(_vec_df(spark, mat), [[1.0, 0.0]]).collect()[0]
        assert out["_n"] == pytest.approx(5.0)
        assert out["_v"] == [3.0, 4.0]


class TestPcaTopk:
    def test_exact_rerank_matches_cosine_when_cand_covers(self, spark, aniso):
        """n_cand = corpus size -> candidate set is everything, so the
        exact re-rank must reproduce cosine_topk bit-for-bit."""
        df, _ = aniso
        q = df.where(F.col("vec_id") < 3)
        model = pca_train(df, dim=8, p=4, center=False)
        appr = pca_topk(df, q, k=5, p=4, n_cand=200, dim=8, model=model).collect()
        exact = cosine_topk(df, q, k=5).collect()
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(
            [(r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"]) for r in appr],
            key=lambda t: (t[0], t[3]),
        ) == sorted(
            [(r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"]) for r in exact],
            key=lambda t: (t[0], t[3]),
        )

    def test_recall_floor_on_testdata(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 5)
        appr = pca_topk(emb, q, k=10, p=16, n_cand=100)
        exact = cosine_topk(emb, q, k=10)
        hits = (
            appr.select("query_id", "neighbor_id")
            .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
            .count()
        )
        assert hits >= 10  # 50 possible; floor mirrors the catalog audit

    def test_ncand_guard(self, spark, aniso):
        df, _ = aniso
        with pytest.raises(ValueError, match="n_cand"):
            pca_topk(df, df.limit(1), k=10, n_cand=5, dim=8, model=([0.0], [[1.0]], [1.0]))


class TestTopkEval:
    def test_hand_computed_metrics(self, spark):
        from dbm_nca_ph_etl_spark.operators.similarity import (
            eval_weight_tables,
            topk_eval,
        )

        rr, dcg = eval_weight_tables(3)
        idcg = sum(dcg)
        exact = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2), (2, 22, 3)],
            "query_id long, neighbor_id long, rank int",
        )
        # q1: hits at appr ranks 1 and 3; q2: no hits at all
        appr = spark.createDataFrame(
            [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 98, 1), (2, 97, 2), (2, 96, 3)],
            "query_id long, neighbor_id long, rank int",
        )
        got = {r.query_id: (r.hits, r.mrr_e6, r.ndcg_e6) for r in topk_eval(appr, exact, k=3).collect()}
        want_dcg = dcg[0] + dcg[2]
        want_ndcg = (2 * want_dcg * 1_000_000 + idcg) // (2 * idcg)
        assert got[1] == (2, rr[0], want_ndcg)
        assert got[2] == (0, 0, 0)

    def test_perfect_retrieval_is_unity(self, spark):
        from dbm_nca_ph_etl_spark.operators.similarity import topk_eval

        exact = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank int"
        )
        got = topk_eval(exact, exact, k=2).collect()[0]
        assert (got.hits, got.mrr_e6, got.ndcg_e6) == (2, 1_000_000, 1_000_000)
