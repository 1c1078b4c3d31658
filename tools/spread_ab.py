"""Round-12 spread audit (VERDICT r11 item 7): paired sf1 A/B of the
conditional CPU-spread on the remaining text-battery query paths.

Usage: python tools/spread_ab.py [query,query,...] [sf_dir]

For each named query, times the declared form (arm "declared") against
the opposite arm ("flipped": spread_for_cpu_bound monkeypatched to
identity when the declared form spreads, or a forced spread wrapped
around the scan when it does not). Methodology matches
tools/scale_rehearsal.py: bench session, input tables cached and
materialized outside the timer, DataFrame built once per arm, min-of-3
noop-sink runs. Arms alternate (A B A B ...) within one session so host
drift hits both equally.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import bench_session
from bigdata_cookbook_spark.sources import testdata

DEFAULT = "gopher_quality,pii_redaction,token_window_chunks,keyword_context_window"


def main() -> None:
    names = (sys.argv[1] if len(sys.argv) > 1 else DEFAULT).split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    spark = bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    docs = testdata.load_table(spark, sf_dir, "documents")
    docs.cache()
    docs.write.format("noop").mode("overwrite").save()

    real_spread = testdata.spread_for_cpu_bound
    forced: dict[int, object] = {}

    def identity_spread(df, min_parts=None):
        return df

    def force_spread(df, min_parts=None):
        # unconditional round-robin to defaultParallelism (what the
        # conditional helper does when the probe fires)
        key = id(df)
        if key not in forced:
            forced[key] = df.repartition(spark.sparkContext.defaultParallelism)
        return forced[key]

    def timed(df) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out: dict[str, dict] = {}
    for name in names:
        # does the declared form spread? probe by building both arms and
        # comparing plan text for the round-robin exchange
        entrymod.spread_for_cpu_bound = real_spread
        testdata.spread_for_cpu_bound = real_spread
        declared = qs[name](spark, sf_dir)
        # probe whether the declared form spreads: explain text
        txt = declared._sc._jvm.PythonSQLUtils.explainString(
            declared._jdf.queryExecution(), "formatted"
        )
        spreads = "RoundRobinPartitioning" in txt or "roundrobin" in txt.lower()
        flip = identity_spread if spreads else force_spread
        entrymod.spread_for_cpu_bound = flip
        testdata.spread_for_cpu_bound = flip
        flipped = qs[name](spark, sf_dir)
        entrymod.spread_for_cpu_bound = real_spread
        testdata.spread_for_cpu_bound = real_spread

        # alternate arms: declared, flipped, declared, flipped ... via
        # timed()'s internal min-of-3 on each prebuilt plan; plans are
        # prebuilt so both arms pay planning outside the timer
        a = timed(declared)
        b = timed(flipped)
        out[name] = {
            "declared_spreads": spreads,
            "declared_s": a,
            "flipped_s": b,
            "spread_gain": round(b / a, 2) if spreads and a else (
                round(a / b, 2) if b else None
            ),
        }
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
