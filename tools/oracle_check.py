"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB at the
given SF, compares row count, sorted-column schema, and an
order-insensitive value hash (rows sorted by their string repr,
columns sorted by name). Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from dbm_nca_ph_etl_spark.plans.queries import QUERIES
from dbm_nca_ph_etl_spark.session import get_spark
from dbm_nca_ph_etl_spark.sources.catalog import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )


def value_repr(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle, rows-only) [{t_spark:.1f}s]")
            if len(sdf) == 0:
                print(f"     WARNING {name}: 0 rows")
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        s, o = canon(sdf), canon(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        elif value_repr(s) != value_repr(o):
            vs, vo = value_repr(s), value_repr(o)
            diff = [(a, b) for a, b in zip(vs, vo) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(s)} [{t_spark:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
