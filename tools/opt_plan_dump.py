"""Dump .explain("formatted") for declared queries into plans/<round>/.

Usage: python tools/opt_plan_dump.py <suffix> [query,query,...]
       SPARK_GRAFT_PLANS_ROUND=r12 (default) picks the output subdir.

Writes plans/<round>/<query>_<suffix>.txt for every named query (default:
the bench HEADLINE set) — the before/after plan evidence the round's
optimization report points at. Plans are captured from the DECLARED
query form (queries()[name]) over $SPARK_GRAFT_SF_DIR (default sf0.1),
i.e. exactly what the driver's oracle re-runs, with the same session
profile bench.py uses (AQE on, shuffle.partitions=32).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
import bench
from bigdata_cookbook_spark.plans.explain import explain_str


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans",
                           os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = bench.bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    bench.cleanup_scratch(spark)


if __name__ == "__main__":
    main()
