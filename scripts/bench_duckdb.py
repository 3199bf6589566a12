#!/usr/bin/env python
"""DuckDB-side baseline: time each oracle SQL on the same parquet at
$SPARK_GRAFT_SF_DIR (default sf0.1). This fills the BASELINE.md table
the acceptance bar refers to ("within 2x of BASELINE at the same
scale factor" — BASELINE = DuckDB wall-clock on this machine, see
BASELINE.md).

Prints one JSON line: {"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_sandbox_spark.catalog import TABLES
from kafka_streams_sandbox_spark.registry import all_oracles


TIMEOUT_S = 180.0  # per query; -1 recorded on timeout


def _run_one(sf_dir: str, sql: str, q) -> None:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    con.execute(sql).fetchall()  # warm (parquet cache, plan)
    start = time.perf_counter()
    con.execute(sql).fetchall()
    q.put(round(time.perf_counter() - start, 3))


def main() -> None:
    import multiprocessing as mp

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    timings: dict[str, float] = {}
    for name, sql in sorted(all_oracles().items()):
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_run_one, args=(sf_dir, sql, q))
        p.start()
        p.join(TIMEOUT_S)
        if p.is_alive():
            p.terminate()
            p.join()
            timings[name] = -1.0  # exceeded TIMEOUT_S
        else:
            timings[name] = q.get() if not q.empty() else -1.0
        print(f"{name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"queries": timings, "sf": sf}))


if __name__ == "__main__":
    main()
