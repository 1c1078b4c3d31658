"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: each query is forced end-to-end with a noop sink (no
driver-side collect of fact data). Every query runs three times; the
reported time is the min (steady state — excludes one-time plan
compilation / codegen, which is amortized across a real workload, and
damps single-JVM GC noise). Cold first-run times are reported under
"queries_cold" for transparency.

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
# top-k, densification, z-score, sessionization, co-occurrence pairs,
# exact + MinHash/SimHash/Jaccard dedup, text analysis, similarity search.
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
    "sessionize",
    "comention_parts",
    "simhash",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "similarity_multiquery_rerank",
    "lang_id",
]


def duckdb_reference(sf_dir: str) -> dict[str, float]:
    """Run each headline query's DuckDB oracle on the same parquet —
    the in-situ single-node columnar reference the 2x bound compares to."""
    import duckdb

    from bigdata_cookbook_spark.sources.testdata import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    out: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def small_input_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.locality.wait", "0")  # local mode: never wait for locality
        .config("spark.shuffle.compress", "false")  # KB-scale shuffles: skip codec
        .config("spark.shuffle.spill.compress", "false")
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
        # min of 3: two steady runs after the cold one — single-JVM GC /
        # scheduling noise at these sub-second scales swings one-shot
        # timings by 2x; min-of-3 stabilizes run-to-run bench output
        steady[name] = round(min(cold[name], run(name), run(name)), 3)
    total = sum(steady.values())
    duck = duckdb_reference(sf_dir)
    duck_total = round(sum(duck.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": steady,
                "queries_cold": cold,
                "duckdb_ref_total": duck_total,
                "duckdb_ref_queries": duck,
                "ratio_vs_duckdb": round(total / duck_total, 2) if duck_total else None,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
