"""Separate TREND from STAIRCASE for auto-plane semantic dedup
(round-6 VERDICT task 3).

The auto default (``semantic_dedup(n_planes=None)``) derives the plane
count p from the corpus size n so expected bucket occupancy stays at
~64 rows — claimed cost model:

    t(n, p) ~ a * n * p          (SRP projection: p dim-wide dot
                                  products per vector to compute the
                                  bucket id — LINEAR, grows with p)
            + b * n * (n / 2^p)  (within-bucket cosine verify —
                                  LINEAR at fixed bucket size n/2^p)
            + floor              (job constant)

The measured auto-path step sf1->sf10 (4x embeddings, p 7->9) was 5.8x
— above the 4x data step — previously explained as "plane-staircase
wobble" on one interval. This tool produces the staircase-free data
points the claim needs:

  1. FIXED DATA, bracketing a plane boundary: sf10 at p=8/9/10 (and
     sf1 at p=7/8/9). Bucket work halves per added plane while the
     projection term grows ~p/(p-1) — the staircase amplitude at
     constant n, with no data-growth confound.
  2. FIXED PLANES across the data step: sf1 vs sf10 both at p=9.
     Expected bucket size grows 4x with the data, so the verify term
     runs in its quadratic regime — the measured ratio should sit
     ABOVE 4x, showing what the auto-scaling is protecting against.
  3. The AUTO path itself (equal expected bucket size ~62 on both
     tiers: sf1@p7, sf10@p9): the clean 4x-data ratio with the
     staircase controlled out.

MEASURED (recorded in BASELINE.md §F): auto path 4.13x for 4.0x data
— linear; fixed-planes p=9 step 9.37x — the quadratic verify regime
the auto-scaling prevents; fixed-data staircase 0.53x/0.65x per added
plane — the verify term dominates and the projection term's p/(p-1)
growth is invisible at these widths, so round 5's 5.8x reading was
session wobble, not operator behavior. Timing: cached input, noop
sink, min of 3 (same protocol as tools/scale_rehearsal.py).

Usage: python tools/plane_staircase.py [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from bigdata_cookbook_spark.operators.dedup import (  # noqa: E402
    default_srp_planes_for,
    semantic_dedup,
)
from bigdata_cookbook_spark.sources.testdata import load_table  # noqa: E402


def timed(df) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf10"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("plane-staircase")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    out = []
    for tier, sf_dir, planes in (
        ("sf1", sf1, (7, 8, 9)),
        ("sf10", sf10, (8, 9, 10)),
    ):
        emb = load_table(spark, sf_dir, "embeddings").cache()
        n = emb.count()  # materializes the cache
        auto_p = default_srp_planes_for(n)
        for p in planes:
            t = timed(semantic_dedup(emb, dim=64, n_planes=p))
            out.append(
                {
                    "tier": tier,
                    "n": n,
                    "p": p,
                    "auto": p == auto_p,
                    "exp_bucket": round(n / 2**p, 1),
                    "sec": t,
                }
            )
            print(json.dumps(out[-1]), flush=True)
        emb.unpersist()
    # derived ratios the BASELINE table quotes
    by = {(r["tier"], r["p"]): r for r in out}
    print(
        json.dumps(
            {
                "fixed_planes_step_p9": round(
                    by[("sf10", 9)]["sec"] / by[("sf1", 9)]["sec"], 2
                ),
                "auto_path_step": round(
                    by[("sf10", 9)]["sec"] / by[("sf1", 7)]["sec"], 2
                ),
                "sf10_staircase_8_to_9": round(
                    by[("sf10", 9)]["sec"] / by[("sf10", 8)]["sec"], 2
                ),
                "sf10_staircase_9_to_10": round(
                    by[("sf10", 10)]["sec"] / by[("sf10", 9)]["sec"], 2
                ),
                "data_step": round(
                    by[("sf10", 9)]["n"] / by[("sf1", 7)]["n"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
