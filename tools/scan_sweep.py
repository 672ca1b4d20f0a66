"""Catalog-wide executed-scan lint (r12, VERDICT item 5).

The r11 disease: Catalyst re-expands a multiply-referenced lineage
into N separate parquet scans (more_like_this was 12 scans of one
corpus, dsir 10, winnow 4) and AQE does NOT dedupe the duplicate
subtrees (ReusedExchange=0 verified on this engine). The bench
surface was audited query by query in r11; this tool sweeps the
WHOLE catalog so the 189 non-bench queries get the same lint.

For every catalog query (or the names passed as argv):

- build the DataFrame at ``$SPARK_GRAFT_SF_DIR`` (default sf0.01 —
  eager constructs pay real jobs, so the small SF keeps the sweep
  cheap),
- read ``explain("formatted")`` of the INITIAL plan (scan multiplicity
  is a plan property; AQE adds no scans and removes none here),
- count ``Scan parquet`` nodes per source table plus total,
- record construct seconds (driver tax: py4j + analysis + eager jobs).

Output: one JSON line per query to stdout, plus a final summary of the
queries with the most duplicate scans of a single table. Sort key for
"worst" is max scans of ONE table (a query that reads 4 different
tables once each is fine; 4 scans of the same corpus is the disease).

    python tools/scan_sweep.py                  # full catalog
    python tools/scan_sweep.py more_like_this_docs dsir_importance_resample
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbm_nca_ph_etl_spark.plans.queries import QUERIES
from dbm_nca_ph_etl_spark.session import get_spark

_SCAN_RE = re.compile(r"Scan parquet\b[^\n]*")
_PATH_RE = re.compile(r"Location: InMemoryFileIndex(?:\(\d+ paths\))? ?\[([^\],]+)")


def scan_counts(plan: str) -> dict[str, int]:
    """Per-table ``Scan parquet`` node counts from a formatted plan.

    The formatted header lists each scan once as ``(N) Scan parquet``;
    table identity comes from the scan detail block's Location line.
    Re-used subtrees print as separate numbered operators (Spark does
    not merge them), which is exactly what we want to count.
    """
    counts: dict[str, int] = {}
    # formatted output: header tree + per-operator detail blocks like
    # "(3) Scan parquet \n Output ... Location: InMemoryFileIndex [file:/...]"
    for block in re.split(r"\n\(\d+\) ", plan):
        if not block.startswith("Scan parquet"):
            continue
        m = _PATH_RE.search(block)
        table = os.path.basename(m.group(1).rstrip("/")) if m else "?"
        counts[table] = counts.get(table, 0) + 1
    return counts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or list(QUERIES)

    spark = get_spark(app_name="scan_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "250")

    rows = []
    for name in names:
        q = QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — lint must finish the sweep
            print(json.dumps({"query": name, "error": str(e)[:200]}), flush=True)
            continue
        construct = time.perf_counter() - t0
        counts = scan_counts(plan)
        row = {
            "query": name,
            "construct": round(construct, 3),
            "scans": counts,
            "total_scans": sum(counts.values()),
            "max_one_table": max(counts.values(), default=0),
            "bench": "bench" in q.tags,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: (-r["max_one_table"], -r["total_scans"]))
    print("\n== WORST (max scans of one table) ==")
    for r in rows[:25]:
        print(
            f"{r['max_one_table']:3d}x  total={r['total_scans']:3d} "
            f"construct={r['construct']:6.2f}s  "
            f"{'BENCH ' if r['bench'] else '      '}{r['query']}  {r['scans']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
