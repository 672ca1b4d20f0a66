"""Skew-aware join helpers (100 TB mandate; SURVEY §7 risk register).

AQE's skew-join splitting (on in session.py) repairs sort-merge joins
at runtime, but two cases still need explicit salting:

- a *broadcast-ineligible* build side joined on a hot key (one
  reducer gets the whole key);
- aggregations on a hot group key (``salted_agg`` two-phase).

``salted_join`` replicates the small side ``salt_n`` times and
scatters the big side's hot keys uniformly: big.key ⋈ small.key
becomes (big.key, salt) ⋈ (small.key, salt ∈ 0..n-1), which spreads
one hot key over ``salt_n`` reducers at the cost of an n-fold copy of
the small side — the standard trade when the small side is too big to
broadcast but far smaller than the skewed fact.

Salting is deterministic (``pmod(hash(cols), n)``): rerunning a task
reshuffles identically, so recovery/retry semantics are unaffected.

Measured interplay with AQE (tools/skew_aqe_probe.py, 20M rows with
95% on one key, broadcast disabled, salt_n=16 — SCALING.md r11):

- JOIN skew: ``salted_join`` beat the plain sort-merge 3.4×/4.2×
  (AQE off/on), and AQE's skew-join splitting did NOT rescue the
  plain plan (7.05 s ≈ 6.56 s) — splitting is gated by
  partition-byte thresholds a hot-but-compact key ducks under, and
  it cannot help a downstream agg keyed on the hot key. The salted
  plan is unhurt by AQE staying on, so the session keeps skewJoin
  enabled as a runtime BACKSTOP for unpredicted skew while
  ``salted_join`` stays the designed path for known-hot
  broadcast-ineligible joins.
- AGG skew: plain ``groupBy`` beat ``salted_agg`` 0.21 s vs 0.56 s —
  Spark's map-side partial aggregation already pre-combines a hot
  key for decomposable aggregates, so the salted extra exchange only
  adds cost. Reach for ``salted_agg`` when the aggregation buffer
  CANNOT shrink map-side (collect_list/set builders, very wide
  buffers), not for sum/count/min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_n: int = 8,
    how: str = "inner",
    salt_src: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key shuffle
    spread over ``salt_n`` sub-partitions.

    ``salt_src`` picks the big-side column hashed into the salt
    (default: all non-join columns' hash — any per-row entropy works;
    a row_id/monotonic id is ideal).
    """
    entropy = (
        F.col(salt_src)
        if salt_src
        else F.concat_ws("\x00", *[c for c in big.columns if c not in on])
    )
    b = big.withColumn("_salt", F.pmod(F.hash(entropy), F.lit(salt_n)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_n: int = 8,
) -> DataFrame:
    """Two-phase aggregation for hot group keys: partial agg on
    (keys, salt), final agg on keys. Only decomposable aggregates
    (sum/count/min/max) — the same restriction map-side combine has.

    ``aggs``: {output_col: "sum(col)" | "count(*)" | "min(col)" |
    "max(col)"}.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.concat_ws("\x00", *df.columns)), F.lit(salt_n))
    )
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        arg = arg.rstrip(")")
        fn = fn.strip().lower()
        col = F.lit(1) if arg in ("*", "1") else F.col(arg)
        part = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(part))
            final_exprs.append(F.sum(part).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(part))
            final_exprs.append(F.sum(part).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(part))
            final_exprs.append(F.min(part).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(part))
            final_exprs.append(F.max(part).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {spec}")
    return (
        salted.groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
