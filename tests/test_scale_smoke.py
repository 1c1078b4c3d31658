"""Scale smoke (SURVEY.md §5 point 4): the declared queries at sf0.1 —
10x the oracle tier — with invariant checks instead of value oracles
(the driver's hash compare runs at sf0.01; this tier proves the same
plans behave at the next scale step without correctness drift or
driver-side collapse)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF01), reason="sf0.1 testdata not present"
)


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_densify_shape_invariant(spark, qs):
    dense = qs["calendar_densify_daily"](spark, SF01)
    n_days = dense.select("day").distinct().count()
    n_types = dense.select("event_type").distinct().count()
    assert dense.count() == n_days * n_types  # full period x entity grid
    # densification adds zeros, never drops mass
    ev_total = qs["summary_stats"](spark, SF01).agg(F.sum("n_records")).collect()[0][0]
    assert dense.agg(F.sum("cnt")).collect()[0][0] == ev_total


def test_zscore_invariant(spark, qs):
    z = qs["weekly_zscore"](spark, SF01)
    stats = z.groupBy("event_type").agg(
        F.avg("zscore").alias("m"), F.stddev_samp("zscore").alias("s")
    )
    for r in stats.collect():
        assert abs(r.m) < 1e-3
        assert r.s == 0.0 or abs(r.s - 1.0) < 1e-2


def test_keep_first_invariant(spark, qs):
    kept = qs["dedup_keep_first"](spark, SF01)
    from bigdata_cookbook_spark.sources.testdata import load_table

    n_cust_with_orders = (
        load_table(spark, SF01, "orders").select("o_custkey").distinct().count()
    )
    assert kept.count() == n_cust_with_orders
    assert kept.groupBy("o_custkey").count().filter("count > 1").count() == 0


def test_topk_bounded(spark, qs):
    top = qs["topk_parts_per_brand"](spark, SF01)
    per_brand = top.groupBy("p_brand").count()
    assert per_brand.filter(F.col("count") > 3).count() == 0


def test_sessionize_partition_invariant(spark, qs):
    sess = qs["sessionize"](spark, SF01)
    from bigdata_cookbook_spark.sources.testdata import load_table

    ev = load_table(spark, SF01, "events")
    # every event in exactly one session
    assert sess.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # sessions don't overlap per user
    bad = sess.withColumn(
        "prev_end",
        F.lag("session_end").over(
            Window.partitionBy("user_id").orderBy("session_start")
        ),
    ).filter(F.col("prev_end") > F.col("session_start"))
    assert bad.count() == 0


def test_neardup_pairs_scale_consistency(spark, qs):
    pairs = qs["embedding_neardup_pairs"](spark, SF01)
    rows = pairs.collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.cosine_sim >= 0.4 for r in rows)
    # pair set is unique
    assert len(rows) == len({(r.vec_a, r.vec_b) for r in rows})


def test_asof_invariants(spark, qs):
    out = qs["asof_click_before_purchase"](spark, SF01)
    from bigdata_cookbook_spark.sources.testdata import load_table

    ev = load_table(spark, SF01, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert out.count() == n_purch  # left-join: every purchase kept
    # every match is backward in time
    assert out.filter(F.col("click_ts_us") > F.col("purchase_ts_us")).count() == 0


def test_range_join_count_invariants(spark, qs):
    out = qs["range_count_events_after_purchase"](spark, SF01)
    from bigdata_cookbook_spark.sources.testdata import load_table

    ev = load_table(spark, SF01, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert out.count() == n_purch
    assert out.filter(F.col("n_following") < 0).count() == 0
    # total correlated events cannot exceed |purchases| x |events per user window|
    assert out.agg(F.sum("n_following")).collect()[0][0] > 0


def test_split_fractions_at_scale(spark, qs):
    out = qs["hash_split_documents"](spark, SF01)
    n = out.count()
    per = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(per.get("train", 0) / n - 0.8) < 0.03  # 5000 ids -> tight
    assert abs(per.get("val", 0) / n - 0.1) < 0.03
    assert abs(per.get("test", 0) / n - 0.1) < 0.03


def test_rolling_window_monotone_bounds(spark, qs):
    out = qs["rolling_hour_avg"](spark, SF01)
    from bigdata_cookbook_spark.sources.testdata import load_table

    ev = load_table(spark, SF01, "events")
    assert out.count() == ev.count()
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    bad = out.filter((F.col("avg_1h") < lo - 1e-6) | (F.col("avg_1h") > hi + 1e-6))
    assert bad.count() == 0


def test_canonical_clusters_at_scale(spark, qs):
    out = qs["neardup_canonical_clusters"](spark, SF01)
    from bigdata_cookbook_spark.sources.testdata import load_table

    docs = load_table(spark, SF01, "documents")
    assert out.count() == docs.count()
    assert out.filter(F.col("canonical_id") > F.col("doc_id")).count() == 0
