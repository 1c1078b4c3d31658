"""Declared approximate tier for A2 hit counts at 100 TB:
approx_count_distinct (HyperLogLog++) — error bound and the mergeability
that makes it the scale answer where exact distinct needs value-aligned
salting (operators/skew.py salted_count_distinct)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_cookbook_spark.sources.testdata import load_table


def test_error_within_declared_rsd(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(F.countDistinct("o_custkey").alias("n")).first()["n"]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd guard band


def test_partial_sketches_merge_like_exact(spark, sf_dir):
    """The scale property: HLL partials computed per partition/group merge
    to the global answer — re-aggregating grouped approx counts via a
    second approx pass over the raw rows equals the one-shot estimate
    (same sketch family, same hash), unlike summing grouped exact distinct
    counts, which double-counts users spanning groups."""
    events = load_table(spark, sf_dir, "events")
    one_shot = events.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).first()["n"]
    exact = events.select(F.countDistinct("user_id").alias("n")).first()["n"]
    # per-type exact distinct sums overcount (users span types)
    summed_exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.sum("n").alias("s"))
        .first()["s"]
    )
    assert summed_exact > exact
    assert abs(one_shot - exact) / exact < 0.06


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """The declared approximate tier for percentiles at 100 TB:
    approx_percentile (Greenwald-Khanna) vs the exact interpolated
    percentile the oracle-checked price_percentiles query computes."""
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.95), 1000)").alias("ap"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    ).first()
    spread = orders.agg(
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("s")
    ).first()["s"]
    assert abs(row["ap"][0] - row["p50"]) / spread < 0.01
    assert abs(row["ap"][1] - row["p95"]) / spread < 0.01
