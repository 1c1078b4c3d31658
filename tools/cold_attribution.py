"""Attribute the bench cold-suite total to its components (r10 VERDICT
item 6: the cold floor drifted 16.8 -> 20.9 -> 18.2 s across rounds
while warm improved — pin which part, if any, is engine-owned).

bench.py's cold number per query is the FIRST toPandas() of a prepared
DataFrame after the input tables are cached — i.e. Catalyst analysis +
optimization + physical planning + whole-stage codegen + first
execution. This tool splits that into the three separately-ownable
parts, same session profile and warm-cache protocol as bench.py:

  catalyst   = time to force queryExecution().executedPlan()
               (analysis + optimization + physical planning — the part
               that scales with ENGINE plan complexity)
  first_exec = first toPandas() AFTER the plan is forced
               (JVM codegen + classloading + first shuffle-file setup —
               the per-job platform floor)
  steady     = min of 3 further toPandas() (the warm number bench
               reports; actual execution)

so per query: bench_cold ~= catalyst + first_exec, and
first_overhead = first_exec - steady is the non-recurring JVM part.
session_init (SparkSession build + table cache/materialize) is reported
separately — bench excludes it from cold_total by design.

Run:  python tools/cold_attribution.py   (sf0.1 default, like bench.py)
Emits one JSON line; findings go to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.perf_counter()

    import bench

    spark = bench.bench_session()
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_cookbook_spark.sources.testdata import TABLES, load_table

    for tbl in TABLES:
        df = load_table(spark, sf_dir, tbl)
        df.cache()
        df.write.format("noop").mode("overwrite").save()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # bench.py:199's JVM warmup, excluded from its cold numbers — run it
    # here too so the first measured query does not absorb one-time
    # warmup that bench's cold_total never pays
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    session_init = time.perf_counter() - t0

    per = {}
    for name in bench.HEADLINE:
        # bench runs comention_parts over the bucketed layout; the
        # plain form's plan is equivalent for attribution purposes and
        # avoids duplicating the layout-write setup here
        df = qs[name](spark, sf_dir)
        t = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        catalyst = time.perf_counter() - t

        t = time.perf_counter()
        df.toPandas()
        first_exec = time.perf_counter() - t

        times = []
        for _ in range(3):
            t = time.perf_counter()
            df.toPandas()
            times.append(time.perf_counter() - t)
        steady = min(times)
        per[name] = {
            "catalyst": round(catalyst, 3),
            "first_exec": round(first_exec, 3),
            "steady": round(steady, 3),
            "first_overhead": round(first_exec - steady, 3),
        }

    tot = {
        k: round(sum(v[k] for v in per.values()), 3)
        for k in ("catalyst", "first_exec", "steady", "first_overhead")
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "session_init_sec": round(session_init, 2),
                "totals": tot,
                "cold_equiv": round(tot["catalyst"] + tot["first_exec"], 3),
                "per_query": per,
            }
        )
    )


if __name__ == "__main__":
    main()
