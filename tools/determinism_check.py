"""Partition-invariance gate: every catalog query, two cluster shapes.

A result can hash-match the oracle at one partition count and still be
nondeterministic — ties in a window order key, an unordered
collect_list, a spark_partition_id leak — because both engines got
"lucky" in the same way. This gate catches that class directly: run
each catalog query under two deliberately different parallelism
configurations (shuffle partitions 7 vs 32 — coprime, so no partition
boundary coincides) and require the order-insensitive value reprs to
be identical. The round-3 lineitem tie-break bugs (lead() over the
non-unique (l_orderkey, l_linenumber)) are exactly what this catches.

Usage:
    python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbm_nca_ph_etl_spark.plans.queries import QUERIES
from dbm_nca_ph_etl_spark.session import get_spark
from tools.oracle_check import canon, value_repr


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)

    spark = get_spark(shuffle_partitions=7)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            a = value_repr(canon(q.fn(spark, sf_dir).toPandas()))
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            b = value_repr(canon(q.fn(spark, sf_dir).toPandas()))
        except Exception as e:
            print(f"FAIL {name}: error: {str(e)[:300]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(
                f"FAIL {name}: partition-dependent result "
                f"({len(a)} vs {len(b)} rows); first diffs: {diff}"
            )
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(a)} [{dt:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} deterministic")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
