#!/usr/bin/env python
"""Driver-contract emulation: run entry() + every registered query at
sf0.01 side-by-side with its DuckDB oracle (the same comparison the
round driver records in CORRECTNESS_r{N}.json).

Usage: python scripts/verify_contract.py [sf_dir]
Exit code: 0 = all green, 1-255 = failure count (capped so 256 fails
can't wrap to a deceptive 0); the exact count is in stdout.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as contract
    from pyspark.sql import SparkSession

    from kafka_streams_sandbox_spark.oracle import compare_query, driver_canon

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import time

    print("entry rows:", len(contract.entry(spark).collect()), flush=True)
    qs, oracles = contract.queries(), contract.oracle_sql()
    fails = 0
    for name in sorted(qs):
        t0 = time.perf_counter()
        if name in oracles:
            r = compare_query(spark, sf_dir, name)
            fails += 0 if r.ok else 1
            verdict = "OK" if r.ok else f"FAIL {r.detail} {r.mismatches[:1]}"
            raw = r.spark_raw
        else:
            raw = qs[name](spark, sf_dir).toPandas()
            verdict = f"rows-only: {len(raw)}"
        # every result must round-trip the driver's STRICT canon (raw
        # pandas sort over all columns) — a31's array<int> column
        # passed the lenient local compare and still errored at the
        # driver (CORRECTNESS_r07); this catches that class here
        if raw is not None:
            try:
                driver_canon(raw)
            except Exception as exc:  # noqa: BLE001 - report any canon fault
                fails += 1
                verdict += f" CANON-FAIL {type(exc).__name__}: {exc}"
        # per-query wall secs: the driver's verify window is
        # TIME-budgeted, so these costs are what REVERIFY_FIRST
        # ordering should be planned against next round
        print(f"{name} {verdict} [{time.perf_counter() - t0:.1f}s]", flush=True)
    print("FAILS:", fails, flush=True)
    return min(fails, 255)


if __name__ == "__main__":
    raise SystemExit(main())
