"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with a
noop sink (no driver-side collect of fact-table data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_cookbook_spark.session import get_spark

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once with the cheapest query
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
