"""Round-11 optimization sweep: plan-shape scan over ALL declared queries.

Usage: python tools/opt_scan_all.py [sf_dir]

For every queries() entry, captures .explain("formatted") (planning only,
no execution) and prints one line per query: Exchange count, join
strategies, Python-boundary nodes (BatchEvalPython/ArrowEvalPython/
MapInPandas/MapInArrow), CartesianProduct, partitionless windows, and
whether the parquet scan carries PushedFilters. This is the coverage
instrument behind OPTIMIZATION_r11.md's per-operator checklist — the 58
bench/ceiling queries are already pinned by tools/plan_report.py; this
sweep extends the same look to the whole registry.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
import bench
from bigdata_cookbook_spark.plans.explain import explain_str

NODES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = bench.bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = "/tmp/r11_plans_all"
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} ERROR {type(e).__name__}: {e}")
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(txt)
        nx = len(re.findall(r"\bExchange ", txt))
        single = len(re.findall(r"Exchange SinglePartition", txt))
        hits = []
        for node in NODES:
            c = len(re.findall(rf"\b{node}\b", txt))
            if c:
                hits.append(f"{node}x{c}")
        # partitionless windows: Window spec with empty partition list
        gw = len(re.findall(r"Window \[[^\]]*\], \[\]", txt))
        pushed = "PushedFilters: \\[\\]" if re.search(r"PushedFilters: \[\]", txt) else ""
        nofilter = bool(re.search(r"PushedFilters: \[\]", txt))
        print(
            f"{name:36s} ex={nx:2d} single={single} gw={gw} "
            f"{'nopush ' if nofilter else ''}{' '.join(hits)}"
        )
    bench.cleanup_scratch(spark)


if __name__ == "__main__":
    main()
