"""Similarity-search tests: exact top-k correctness on a constructed
corpus, LSH recall against the exact baseline on real testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from dbm_nca_ph_etl_spark.operators.similarity import cosine_topk, lsh_bucket_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # closest to 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),   # orthogonal
        Row(vec_id=3, embedding=[0.7, 0.7, 0.0]),   # diagonal
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk_exact(vectors):
    out = cosine_topk(vectors, vectors.where("vec_id = 0"), k=3).collect()
    got = [(r.neighbor_id, r.cos_sim, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert [g[0] for g in got] == [1, 3, 2]
    assert got[0][1] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert got[1][1] == pytest.approx(0.7 / math.sqrt(0.98), abs=1e-6)
    assert got[2][1] == 0.0


def test_cosine_topk_excludes_self(vectors):
    out = cosine_topk(vectors, vectors, k=4)
    assert out.where("query_id = neighbor_id").count() == 0
    assert out.groupBy("query_id").count().where("count != 4").count() == 0


def test_lsh_recall_on_testdata(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_bucket_topk(emb, queries, k=10, num_planes=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # approximate by design; hyperplane LSH with 6 planes on 64-dim
    # random-ish embeddings should recover a solid fraction
    assert recall >= 0.3, f"recall {recall}"
    # everything LSH returns must be a genuine vector pair (sanity)
    assert all(q != n for q, n in approx)
