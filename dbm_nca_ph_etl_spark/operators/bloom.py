"""Replayable Bloom filter — the runtime row-pruning shape.

The 100 TB join problem this models: a fact table joined to a
selective dimension subset should not shuffle fact rows that cannot
match. Engines inject a Bloom filter of the build side's join keys
under the fact scan (Spark: ``spark.sql.optimizer.runtime.bloomFilter
.enabled``; the same idea as semi-join reduction in distributed DBs).
Spark's built-in ``BloomFilterAggregate`` uses engine-private hashing,
so a result that *depends* on it can never be oracle-checked — this
module is the engine-neutral twin: positions come from md5 (the
repo-wide ``hash48`` convention), so DuckDB replays membership
bit-for-bit and the pruning decision itself becomes a driver-checkable
result.

Structure: ``m_bits`` bitmap packed into 64-bit words, stored as a
one-row ``map<word_idx, word_bits>`` (absent word = all zero — the
map is the sparse form of the dense bitmap; at the default 2^16 bits
it is ≤1024 entries ≈ 8 KiB, broadcast-sized by construction, and
membership(p) ≡ p ∈ {build positions} exactly). k positions per key
from independent md5 streams (``bf{i}:``-salted). Build is one
explode + two aggregations over the BUILD side only; probe is k map
lookups per row, pure JVM codegen — no shuffle touches the probe
side.

Guarantees (property-tested): no false negatives ever (every build
key's positions are set); false-positive rate follows
(1-e^(-kn/m))^k — callers size ``m_bits`` to the build cardinality.
Deterministic on any partitioning: positions are value hashes and
word merging is bitwise OR (commutative/associative/idempotent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.functions.scalars import hash48


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``key`` — independent md5 streams,
    DuckDB twin: ('0x'||substr(md5('bf'||i||':'||key::VARCHAR),1,12))
    ::BIGINT % m_bits."""
    return [
        hash48(F.concat(F.lit(f"bf{i}:"), key.cast("string"))) % m_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """One-row DataFrame ``(_bf: map<bigint,bigint>, _bf_n: bigint)``
    — the packed bitmap plus the build cardinality (for FP-rate
    accounting). Cross-join-broadcast it against the probe side and
    filter with :func:`bloom_might_contain`.

    Two aggregations, both over the build side only: positions →
    per-word OR of set bits (map-side partial, ≤ m/64 groups), then
    the word list folds into one map row. Word order inside the map
    is irrelevant — lookups are by key — so collect_list's
    nondeterministic order cannot leak into results.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(key_col)
    pos = keys.select(
        F.explode(F.array(*_positions(key, m_bits, k))).alias("_p")
    )
    words = pos.groupBy((F.col("_p") / 64).cast("bigint").alias("_w")).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("_p") % 64).cast("int")
            )
        ).alias("_bits")
    )
    n = keys.select(F.count_distinct(key).alias("_bf_n"))
    return words.agg(
        F.map_from_arrays(F.collect_list("_w"), F.collect_list("_bits")).alias("_bf")
    ).crossJoin(F.broadcast(n))


def bloom_might_contain(
    bf: Column, key: Column, m_bits: int = 1 << 16, k: int = 4
) -> Column:
    """Boolean probe: all k positions of ``key`` set in the bitmap
    map ``bf``. k map lookups + bit tests, fully JVM-side; false
    negatives are impossible by construction."""
    checks = []
    for p in _positions(key, m_bits, k):
        word = F.coalesce(
            F.element_at(bf, (p / 64).cast("bigint")), F.lit(0).cast("bigint")
        )
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
        )
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
