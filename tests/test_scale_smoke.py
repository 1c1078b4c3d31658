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
