"""Physical-plan assertions — the properties that matter at 100 TB.

Each test pins an .explain("formatted") property the engine relies on at
scale: predicate/column pushdown into the parquet scan, broadcast joins
for dimension tables, map-side partial aggregation, and whole-stage
codegen. A regression here is a silent 10-100x slowdown at the 1000-
executor tier even if correctness stays green.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry
from bigdata_cookbook_spark.plans.explain import explain_str


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entry.queries()

    def plan_of(name: str) -> str:
        return explain_str(qs[name](spark, sf_dir))

    return plan_of


def test_scan_column_pruning(plans):
    # pricing_summary reads 7 of lineitem's 16 columns; the scan's
    # ReadSchema must not include untouched wide columns like l_comment
    p = plans("pricing_summary")
    m = re.search(r"ReadSchema: (.*)", p)
    assert m, p
    assert "l_comment" not in m.group(1)
    assert "l_quantity" in m.group(1)


def test_filter_pushdown_to_scan(plans):
    # keyword_search's source IN (...) filter must reach the parquet scan
    p = plans("keyword_search")
    m = re.search(r"PushedFilters: \[(.*?)\]", p)
    assert m, p
    assert "In(source" in m.group(1) or "EqualTo(source" in m.group(1)


def test_dim_joins_are_broadcast(plans):
    # customer/nation/part are dimension tables: joins must be broadcast
    # hash joins, never shuffle the fact side on the join key
    for q in ("hit_count_monthly_topk", "count_distinct_having", "topk_parts_per_brand"):
        p = plans(q)
        assert "BroadcastHashJoin" in p, f"{q} lost its broadcast join:\n{p}"
        assert "SortMergeJoin" not in p, f"{q} degraded to sort-merge:\n{p}"


def test_partial_aggregation(plans):
    # groupBy aggregates must combine map-side (two HashAggregate nodes
    # with a partial_ first pass) so the shuffle carries group rows, not
    # raw fact rows
    p = plans("pricing_summary")
    assert p.count("HashAggregate") >= 2, p
    assert "partial_" in p, p


def test_whole_stage_codegen_active(spark, sf_dir):
    # the scan->filter->agg hot path must sit inside WholeStageCodegen —
    # "simple" mode marks codegen'd nodes with "*(n)". AQE only finalizes
    # the physical plan on execution, so run the query first.
    df = entry.queries()["pricing_summary"](spark, sf_dir)
    df.collect()
    p = explain_str(df, mode="simple")
    assert "isFinalPlan=true" in p, p
    assert "*(" in p, p


def test_comention_join_keyed_not_cartesian(plans):
    # the co-mention self-join is an equi-join on l_orderkey; it must plan
    # as a keyed join (broadcast at this SF, shuffle join at scale), never
    # a cartesian product with the key as a post-filter
    p = plans("comention_parts")
    assert "CartesianProduct" not in p, p


def test_ann_topk_takeordered(plans):
    # global top-k must be TakeOrderedAndProject (per-partition heap +
    # final merge), never a full global sort followed by limit
    p = plans("ann_cosine_topk")
    assert "TakeOrderedAndProject" in p, p


def test_events_daterange_partition_filters(plans):
    # the ts BETWEEN filter must be pushed to the events scan
    p = plans("events_daterange")
    m = re.search(r"PushedFilters: \[(.*?)\]", p)
    assert m, p
    assert "ts" in m.group(1) or "GreaterThanOrEqual" in m.group(1), m.group(1)


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """The default session profile's AQE must actually re-plan at runtime:
    a 64-partition-configured aggregation over KB-scale data executes with
    coalesced AQEShuffleRead partitions (on the 1000-executor tier this is
    what keeps reducers proportional to data, not to the static conf)."""
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.sources.testdata import load_table

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # AQE re-plans during execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in executed and "coalesced" in executed
    assert df.rdd.getNumPartitions() < int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Shuffle joins with a selective build side get a runtime Bloom
    filter injected on the fact scan (might_contain on the join key) —
    Spark 4's dynamic semi-join reduction. At 100 TB this prunes the
    shuffled fact rows before the exchange; the session profile keeps it
    enabled. (Thresholds are relaxed here because the test tables are
    KB-scale; the assert is on plan shape, not on the size heuristics.)"""
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.sources.testdata import load_table

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = explain_str(j, "formatted")
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_net_exposure_single_aggregation_no_join(plans):
    """Round-2 rewrite: per-customer net exposure must plan as ONE
    conditional aggregation — no join, at most one exchange. The round-1
    shape (full-outer SortMergeJoin of two per-status aggregates) paid a
    second shuffle plus the merge."""
    p = plans("net_exposure")
    assert "Join" not in p, p
    # formatted explain lists each node once in the tree and once in the
    # details section — count the details entries (one per physical node)
    assert len(re.findall(r"\n\(\d+\) Exchange", p)) <= 1, p
    assert "HashAggregate" in p


def test_gopher_quality_is_scan_only(plans):
    """The pretraining quality filter must stay a linear scan: no
    exchange beyond the explicit width repartition, no join, no window —
    at 100 TB anything else in this tier is a pipeline bottleneck."""
    p = plans("gopher_quality")
    assert "Join" not in p, p
    assert "Window" not in p, p
    # the only exchange is the explicit RoundRobin repartition for CPU
    # spreading; no hash/range (data-dependent) exchanges
    assert len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", p)) == 0, p


def test_spread_for_cpu_bound_noop_on_wide_scan(spark, sf_dir, tmp_path):
    """spread_for_cpu_bound must be the IDENTITY when the scan is already
    at least as wide as the core count — the declared 100-TB plan ships
    no unconditional raw-text exchange (round-7 verdict item #2). On the
    single-row-group local fixture it still spreads."""
    from bigdata_cookbook_spark.sources.testdata import (
        load_table,
        spread_for_cpu_bound,
    )

    # wide source: many files, with file bin-packing disabled so each
    # file is its own input split (openCostInBytes would otherwise pack
    # tiny test files into one split — at 100 TB the splits are real)
    wide_dir = str(tmp_path / "wide")
    load_table(spark, sf_dir, "documents").limit(64).repartition(
        spark.sparkContext.defaultParallelism + 1
    ).write.parquet(wide_dir)
    saved = {
        "spark.sql.files.openCostInBytes": spark.conf.get(
            "spark.sql.files.openCostInBytes"
        ),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try:
        wide = spark.read.parquet(wide_dir)
        assert spread_for_cpu_bound(wide) is wide  # identity, not equal-plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    # narrow source: the fixture's single row group -> spread kicks in
    narrow = load_table(spark, sf_dir, "documents")
    spread = spread_for_cpu_bound(narrow)
    p = explain_str(spread, "formatted")
    assert "RoundRobinPartitioning" in p, p
    # memoized: the probe runs once per scan object
    assert spread_for_cpu_bound(narrow) is spread
