#!/usr/bin/env python
"""DuckDB-twin benchmark: run every registered oracle SQL at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON
line {"metric", "value", "unit", "queries", "sf", "n"} — the same
interleaved-sweep per-query-median methodology as bench.py, so
engine-vs-oracle ratios in BASELINE.md are same-methodology,
same-moment pairs anyone can reproduce:

    python bench.py > /tmp/engine.json && python bench_oracle.py > /tmp/oracle.json

DuckDB totals vary ~±40% between runs under co-tenant load (its
single-process scheduler has no sweep-median defense beyond this
script's), which is why BASELINE.md only quotes ratios of runs taken
back-to-back on the same machine state.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_N = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "5")))
BENCH_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "360"))
LOAD_GUARD = float(os.environ.get("SPARK_GRAFT_LOAD_GUARD", "8"))
LOAD_WAIT_S = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_S", "90"))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    sqls = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # warm-up sweep: OS page cache for the parquet + DuckDB's own
    # catalog/compile paths, mirroring bench.py's untimed first pass
    for name in sorted(sqls):
        con.sql(sqls[name]).fetchall()

    runs: dict[str, list[float]] = {name: [] for name in sqls}
    guard_t0 = time.perf_counter()
    while (
        os.getloadavg()[0] > LOAD_GUARD
        and time.perf_counter() - guard_t0 < LOAD_WAIT_S
    ):
        time.sleep(5)
    sweep_loads: list[float] = []
    sweeps_t0 = time.perf_counter()
    sweeps_done = 0
    for sweep in range(BENCH_N):
        sweep_loads.append(round(os.getloadavg()[0], 1))
        for name in sorted(sqls):
            t0 = time.perf_counter()
            con.sql(sqls[name]).fetchall()
            runs[name].append(time.perf_counter() - t0)
        sweeps_done = sweep + 1
        if (
            sweep + 1 >= 3
            and time.perf_counter() - sweeps_t0 > BENCH_BUDGET_S
        ):
            break
    timings = {
        name: round(statistics.median(rs), 3)
        for name, rs in sorted(runs.items())
    }

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "oracle_total_wall_time_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "n": sweeps_done,
                "loadavg_per_sweep": sweep_loads,
            }
        )
    )
    con.close()


if __name__ == "__main__":
    main()
