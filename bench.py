"""Benchmark harness (driver contract).

Runs the bench-tagged headline queries from the catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

The timed region is ``run_once`` — ``q.fn()`` (DataFrame
CONSTRUCTION: py4j round-trips, analysis, any eager driver jobs the
operators issue) PLUS execution to completion (collect of the
result). Construction is deliberately inside the timer: at 100 TB
the driver's plan-construction tax is a real per-query cost (it
serializes every submission), and several r11 wins (schema
declaration, F.expr batching) are construct-side. Every query runs
once untimed (one-time whole-stage-codegen / Janino compilation and
parquet footer reads, which amortize to zero on any real workload),
then five timed runs. ``queries`` reports the
MINIMUM (the standard steady-state estimator, robust to co-tenant
noise on a shared box) and ``value`` stays sum-of-min for contract
compatibility. On top of that, the default invocation is MIN OF 3
SESSIONS: the parent re-execs itself into 3 fresh JVMs and
min-combines their per-query results, because session-level effects
(JIT state, page cache, co-tenant phase) moved same-tree totals 17%
between the r10 driver run and the same-day gate run — within-session
repeats cannot see them (a session effect is constant within a
process). ``SPARK_GRAFT_BENCH_REPEAT=1`` opts out for callers that
min-combine their own invocations (the scaling audit's noop groups).
The per-query ``{min, median}`` spread — used to
adjudicate round-over-round deltas against host swing (r5→r6 totals
moved 1.48× on untouched code) — is written to the sidecar
``BENCH_spread.json`` rather than inlined: the inline form overflowed
the driver's tail-capture window in r7 and left ``BENCH_r07.json``
unparseable. The compact contract line is the FINAL stdout line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbm_nca_ph_etl_spark.plans.queries import QUERIES
from dbm_nca_ph_etl_spark.session import get_spark


def _min_of_sessions(repeat: int) -> None:
    """Re-exec this script ``repeat`` times as CHILD processes (one
    fresh JVM/session each) and emit the per-query MIN across
    sessions as the contract line. Within one session min-of-5 kills
    run-to-run noise, but SESSION effects (JIT state, page cache,
    co-tenant phase) moved same-tree totals 17% between the r10
    driver run and the same-day gate run — min-of-sessions is the
    only estimator that escapes them, because a session effect is
    constant within a process. ``SPARK_GRAFT_BENCH_REPEAT=1`` opts
    out (scaling audits min-combine their own invocations)."""
    import subprocess

    env = dict(os.environ, _SPARK_GRAFT_BENCH_CHILD="1")
    results = []
    for i in range(repeat):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            results.append(json.loads(line))
        except ValueError:
            sys.stderr.write(
                f"bench child {i} emitted no JSON (rc={p.returncode}); "
                f"stderr tail:\n{p.stderr[-2000:]}\n"
            )
    if not results:
        raise SystemExit("every bench child session failed")
    queries = {
        name: min(r["queries"][name] for r in results if name in r["queries"])
        for name in results[0]["queries"]
    }
    total = round(sum(queries.values()), 3)
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_spread.json"
    )
    try:  # augment the last child's sidecar with the session picture
        with open(sidecar) as fh:
            side = json.load(fh)
    except (OSError, ValueError):
        side = {}
    side["session_totals"] = [r["value"] for r in results]
    side["min_of_sessions"] = queries
    try:
        with open(sidecar, "w") as fh:
            json.dump(side, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": results[0].get("sf"),
            }
        )
    )


def main() -> None:
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    if repeat > 1 and os.environ.get("_SPARK_GRAFT_BENCH_CHILD") != "1":
        _min_of_sessions(repeat)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in QUERIES.items() if "bench" in q.tags}
    # SPARK_GRAFT_BENCH_QUERIES=a,b,c restricts the run to a subset —
    # used by the SF-scaling second-decade audit, which re-times only
    # the exp_dist tail at sf10 instead of paying the full headline
    # set three times per decade. The contract line shape is unchanged.
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        want = {s.strip() for s in only.split(",") if s.strip()}
        missing = want - set(bench_queries)
        if missing:
            raise SystemExit(f"unknown bench queries: {sorted(missing)}")
        bench_queries = {n: q for n, q in bench_queries.items() if n in want}

    # SPARK_GRAFT_SINK=noop executes each query fully distributed into
    # Spark's no-op sink instead of collecting rows to the driver.
    # The default stays `collect` (the driver contract). The noop mode
    # exists for the SF-scaling audit: a query that RETURNS O(n) rows
    # (ffill, sessionize) pays an O(n) serial driver deserialization
    # under collect, which dominates wall time at sf1 and masquerades
    # as a bad operator exponent — at 100 TB nobody collects a
    # billion rows to one driver, they write to a sink, which is what
    # noop measures (SCALING.md r9 decomposition).
    sink = os.environ.get("SPARK_GRAFT_SINK", "collect")

    def run_once(q) -> None:
        df = q.fn(spark, sf_dir)
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    # SPARK_GRAFT_BENCH_RUNS trims the per-session timed runs for
    # long-running scale spots (sf30 single queries take minutes per
    # run; 3 sessions x 2 runs is still min-of-6 samples). The
    # headline contract keeps the default 5.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name, q in bench_queries.items():
        run_once(q)  # warmup: codegen compile + parquet footers
        runs: list[float] = []
        # min-of-5: this box's throughput swings ~2x run-to-run (shared
        # host); the minimum is the least-contended estimate of the
        # query's actual cost. The median bounds the noise.
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run_once(q)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        spread[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
        }

    total = round(sum(timings.values()), 3)
    # The per-query {min, median} spread goes to a sidecar file: r7 proved
    # that inlining it grows the contract JSON line past the driver's
    # tail-capture window (BENCH_r07.json recorded "parsed": null). The
    # FINAL stdout line stays the compact contract shape the driver parses.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_spread.json"
    )
    try:
        with open(sidecar, "w") as fh:
            json.dump({"sf": sf_num, "spread": spread}, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass  # sidecar is best-effort; the contract line below must still print
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
