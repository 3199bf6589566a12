"""Capture .explain("formatted") for named queries into
plans/r13/<shortname>_<tag>.txt — the optimization round's
before/after plan evidence (lazy checkpoints disabled so the full
lineage prints; see session.set_lazy_checkpoints_disabled).

Usage: python scripts/capture_plans.py <tag> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.session import (
        get_spark,
        set_lazy_checkpoints_disabled,
    )

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    set_lazy_checkpoints_disabled(True)
    qs = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("KSS_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        short = name.split("_")[0]
        path = os.path.join(out_dir, f"{short}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} ({tag})\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
