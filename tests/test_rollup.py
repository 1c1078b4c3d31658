"""Continuous aggregate: incremental refresh + rewrite always equals the
direct full aggregation; old partitions are never rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.plans.rollup import rollup_query, rollup_refresh
from bigdata_cookbook_spark.sources.testdata import load_table

KEYS = ["event_type"]
AGGS = {
    "n": (None, "count"),
    "total": ("value", "sum"),
    "vmax": ("value", "max"),
}


def _direct(raw):
    return (
        raw.withColumn("bucket", F.date_trunc("day", F.col("ts")).cast("timestamp"))
        .groupBy("bucket", *KEYS)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"),
             F.max("value").alias("vmax"))
    )


def _canon(df):
    return sorted(
        (str(r["bucket"]), r["event_type"], r["n"], round(r["total"], 6), r["vmax"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_incremental_refresh_matches_direct(spark, events, tmp_path):
    path = str(tmp_path / "rollup")
    early = events.filter(F.dayofmonth("ts") <= 20)

    n1 = rollup_refresh(spark, early, path, "ts", KEYS, AGGS)
    assert n1 > 0
    q1 = rollup_query(spark, early, path, "ts", KEYS, AGGS)
    assert _canon(q1) == _canon(_direct(early))

    # new days arrive; refresh writes only the new + boundary buckets
    mtimes_before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("__bucket=")
    }
    n2 = rollup_refresh(spark, events, path, "ts", KEYS, AGGS)
    assert 0 < n2 < n1 + 5  # incremental, not a full rebuild of history
    q2 = rollup_query(spark, events, path, "ts", KEYS, AGGS)
    assert _canon(q2) == _canon(_direct(events))

    # untouched closed partitions were not rewritten
    early_parts = sorted(mtimes_before)[: len(mtimes_before) - 2]
    for d in early_parts:
        assert os.path.getmtime(os.path.join(path, d)) == mtimes_before[d], d


def test_refresh_idempotent_without_new_data(spark, events, tmp_path):
    path = str(tmp_path / "rollup2")
    rollup_refresh(spark, events, path, "ts", KEYS, AGGS)
    before = _canon(rollup_query(spark, events, path, "ts", KEYS, AGGS))
    n = rollup_refresh(spark, events, path, "ts", KEYS, AGGS)
    assert n <= 1  # at most the boundary bucket
    after = _canon(rollup_query(spark, events, path, "ts", KEYS, AGGS))
    assert before == after


def test_query_without_rollup_falls_back_to_raw(spark, events, tmp_path):
    path = str(tmp_path / "never_refreshed")
    out = rollup_query(spark, events, path, "ts", KEYS, AGGS)
    assert _canon(out) == _canon(_direct(events))


def test_non_mergeable_agg_rejected(spark, events, tmp_path):
    with pytest.raises(ValueError, match="partial-mergeable"):
        rollup_refresh(
            spark, events, str(tmp_path / "x"), "ts", KEYS,
            {"m": ("value", "median")},
        )
