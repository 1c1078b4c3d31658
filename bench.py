"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: each query is forced end-to-end with a noop sink (no
driver-side collect of fact data). Every query runs twice; the reported
time is the min (steady state — excludes one-time plan compilation /
codegen, which is amortized across a real workload). Cold first-run times
are reported under "queries_cold" for transparency.

Tuning: at sf<=0.1 the whole dataset is a few MB, so the session uses the
small-input profile (AQE off, few shuffle partitions) — the same engine
decision a size-aware planner makes; the 100 TB profile (AQE on, skew
handling) is the session.py default used everywhere else.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

# Headline set: every family that matters at scale — scan+agg, join+window
# top-k, densification, z-score, dedup, text analysis, similarity search.
HEADLINE = [
    "pricing_summary",
    "hit_count_monthly_topk",
    "topk_parts_per_brand",
    "argmax_day_per_priority",
    "calendar_densify_daily",
    "weekly_zscore",
    "dedup_keep_first",
    "mode_event_type",
    "net_exposure",
    "exact_dedup_docs",
    "doc_fingerprint",
    "token_quality",
    "ann_cosine_topk",
]


def small_input_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = small_input_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # JVM/parquet warm-up
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = round(run(name), 3)
        steady[name] = round(min(cold[name], run(name)), 3)
    total = sum(steady.values())
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": steady,
                "queries_cold": cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
