"""Catalog-wide physical-plan lint — the 100 TB anti-pattern sweep
as a standing gate rather than a review-time activity.

Every catalog query (the whole registry, whatever its size) is
planned (not executed) at
sf0.001 and its physical plan is checked for the two patterns that
kill distributed scale:

- ``CartesianProduct`` — an unbroadcast cross join is O(n·m) shuffle
  work. Allowed ONLY for the explicitly-labeled exact correctness
  baselines, which exist to oracle-check their scale-path siblings.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any plan is a
  10-100× interpreted slowdown vs Arrow batching. Never allowed;
  Python must enter plans only as ``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` (vectorized).

Plan construction for a handful of queries triggers real (tiny) jobs
at sf0.001 — k-means training iterations, LSH signature checkpoints,
quantile boundary sampling — which is exactly what those operators
do at any scale; the lint sees the plan that would run on the big
cluster.
"""

from __future__ import annotations

import pytest

from dbm_nca_ph_etl_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Exact O(n^2) correctness baselines, documented as such in their
# registrations — the ONLY places a cartesian product may appear.
# Each entry must ALSO carry a fail-fast scale guard in its operator
# (similarity.scale_guard: bounded count, refuses corpus-sized
# input) — test_exact_baselines_carry_scale_guards enforces that
# pairing. (ngram_jaccard_pairs is all-pairs too, but expresses the
# pair space through a range-join condition that plans as a
# nested-loop join, not CartesianProduct.)
ALLOWED_CARTESIAN = {
    "embedding_near_dup_pairs",
}


@pytest.fixture(scope="module")
def plans(spark):
    """Plans with auto-broadcast DISABLED: at sf0.001 everything is
    broadcastable by size, which would hide scale hazards. With the
    threshold off, only joins the query EXPLICITLY engineered (an
    ``F.broadcast`` hint, an equi-key for SMJ) keep a distributed
    shape — a query leaning on 'the side happens to be small today'
    degrades to CartesianProduct right here, at plan time, instead of
    at 100 TB."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = {}
        for name, q in QUERIES.items():
            df = q.fn(spark, SF_DIR)
            out[name] = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return out


def test_no_unexpected_cartesian_products(plans):
    offenders = {
        name
        for name, plan in plans.items()
        if "CartesianProduct" in plan and name not in ALLOWED_CARTESIAN
    }
    assert not offenders, f"unbroadcast cross joins crept in: {sorted(offenders)}"


def test_no_row_at_a_time_python_udfs(plans):
    offenders = {name for name, plan in plans.items() if "BatchEvalPython" in plan}
    assert not offenders, f"row-at-a-time Python UDFs: {sorted(offenders)}"


def test_allowed_cartesian_list_is_tight(plans):
    """The allowlist must not rot: every allowed name still exists
    and still actually plans a cartesian product (otherwise shrink
    the list)."""
    for name in ALLOWED_CARTESIAN:
        assert name in plans
        assert "CartesianProduct" in plans[name], (
            f"{name} no longer plans a CartesianProduct - remove it "
            "from ALLOWED_CARTESIAN"
        )


def test_exact_baselines_carry_scale_guards(spark):
    """The two labeled exact baselines refuse corpus-sized input at
    plan-construction time — a user pointing them at a real corpus
    gets a ValueError naming the scale-path sibling, not an O(n^2)
    job."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dbm_nca_ph_etl_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_topk,
    )

    wide = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="exact baseline"):
        cosine_near_dup_pairs(wide, max_rows=10)
    with _pytest.raises(ValueError, match="exact baseline"):
        cosine_topk(wide, wide, k=3, max_queries=10)
    # within bounds (and explicit opt-out) both still plan fine
    small = wide.where(F.col("vec_id") < 5)
    assert cosine_near_dup_pairs(small, max_rows=10).count() >= 0
    assert cosine_topk(wide, small, k=3, max_queries=10).count() > 0
    assert cosine_near_dup_pairs(wide.limit(12), max_rows=None).count() >= 0
