"""Physical layout (bucketing, date partitioning) and skew combinators.

These pin the 100 TB-tier plan properties on small data: a bucketed join
must plan with zero shuffles, a partition-column filter must prune the
directory listing, and the salted operators must be row-identical to
their unsalted forms.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.skew import (
    salted_agg,
    salted_count_distinct,
    salted_join,
)
from bigdata_cookbook_spark.plans.layout import (
    has_exchange,
    scan_partition_count,
    write_bucketed,
    write_date_partitioned,
    write_zordered,
)
from bigdata_cookbook_spark.sources.testdata import load_table


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestBucketing:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        write_bucketed(orders, "b_orders", ["o_custkey"], 8)
        write_bucketed(customer, "b_customer", ["c_custkey"], 8)
        try:
            bo = spark.table("b_orders")
            bc = spark.table("b_customer")
            joined = bo.join(
                bc.hint("merge"), bo.o_custkey == bc.c_custkey
            ).select("o_orderkey", "c_name")
            assert not has_exchange(joined), (
                "bucketed equi-join on the bucket key must not shuffle"
            )
            # and it is the same join result as the plain tables
            plain = orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).select("o_orderkey", "c_name")
            assert _rows(joined) == _rows(plain)
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")

    def test_bucketed_layout_erases_comention_group_shuffle(self, spark, sf_dir):
        """The layout tier applied to a real headline query: co-mention
        pair expansion needs collect_list per orderkey, normally the
        query's first (and biggest) shuffle. Over a lineitem bucketed on
        l_orderkey the groupBy rides the bucket partitioning — zero
        Exchange below the expansion — and results are unchanged. This is
        the 100 TB play: bucket the fact table once at ingest, every
        per-entity/per-document grouping afterwards is shuffle-free."""
        import re

        from bigdata_cookbook_spark.plans.explain import explain_str

        from bigdata_cookbook_spark.operators.graph import cooccurrence_pairs

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        write_bucketed(li, "b_li_cm", ["l_orderkey"], 8)
        try:
            bucketed = cooccurrence_pairs(
                spark.table("b_li_cm"), "l_orderkey", "l_partkey",
                min_weight=1, pre_partitioned=True,
            )
            plain = cooccurrence_pairs(li, "l_orderkey", "l_partkey", min_weight=1)
            plan = explain_str(bucketed, "formatted")
            n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
            assert n_exchanges == 1, (
                f"bucketed co-mention must shuffle only the pairs, saw {n_exchanges}"
            )
            assert _rows(bucketed) == _rows(plain)
            # the 2^32-safe unpacked mode is row-identical to the packed one
            unpacked = cooccurrence_pairs(
                li, "l_orderkey", "l_partkey", min_weight=1, pack=False
            )
            assert _rows(unpacked) == _rows(plain)
        finally:
            spark.sql("DROP TABLE IF EXISTS b_li_cm")

    def test_bucketed_groupby_has_no_exchange(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        write_bucketed(orders, "b_orders_g", ["o_custkey"], 8)
        try:
            agg = (
                spark.table("b_orders_g")
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            assert not has_exchange(agg), (
                "groupBy on the bucket key must reuse bucket partitioning"
            )
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders_g")


class TestDatePartitioning:
    def test_between_filter_prunes_partitions(self, spark, sf_dir, tmp_path):
        events = load_table(spark, sf_dir, "events")
        part = events.withColumn("day", F.to_date("ts"))
        path = str(tmp_path / "events_by_day")
        write_date_partitioned(part, path, "day")
        full = spark.read.parquet(path)
        n_days = full.select("day").distinct().count()
        assert scan_partition_count(full) == n_days
        pruned = full.filter(
            (F.col("day") >= "2024-01-05") & (F.col("day") <= "2024-01-09")
        )
        kept = pruned.select("day").distinct().count()
        assert kept <= 5
        assert scan_partition_count(pruned) == kept, (
            "day filter must reach the file index as PartitionFilters, "
            "not run as a post-scan row filter"
        )
        # pruning is plan-level only: row results match the unpartitioned filter
        assert pruned.count() == events.filter(
            (F.to_date("ts") >= "2024-01-05") & (F.to_date("ts") <= "2024-01-09")
        ).count()

    def test_dynamic_partition_pruning_via_dim_join(self, spark, sf_dir, tmp_path):
        """DPP: when the partition filter is only knowable THROUGH a join
        (fact partitioned by day joined to a filtered dim of days), Spark
        must inject a dynamicpruning subquery on the fact scan instead of
        reading every partition — the mechanism that makes star-schema
        joins feasible at 100 TB."""
        from bigdata_cookbook_spark.plans.explain import explain_str

        events = load_table(spark, sf_dir, "events")
        part = events.withColumn("day", F.to_date("ts"))
        path = str(tmp_path / "events_dpp")
        write_date_partitioned(part, path, "day")
        fact = spark.read.parquet(path)
        days = [r["day"] for r in fact.select("day").distinct().limit(4).collect()]
        # a REAL dim with a genuine (non-foldable) filter — a lit() flag
        # constant-folds away and DPP never sees a filtering side
        dim_days = spark.createDataFrame(
            [(d, "keep" if i < 2 else "drop") for i, d in enumerate(days)],
            "day date, grp string",
        )
        joined = fact.join(dim_days.filter(F.col("grp") == "keep"), "day")
        plan = explain_str(joined)
        assert "dynamicpruning" in plan.lower(), plan
        # and the pruned join returns exactly the kept days' rows
        expect = fact.filter(F.col("day").isin(days[:2])).count()
        assert joined.count() == expect


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: entity 0 holds ~half of all rows
    rows = [
        Row(entity_id=(0 if i % 2 == 0 else i % 37), v=i, tag=f"t{i % 5}")
        for i in range(2000)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [Row(entity_id=i, name=f"e{i}") for i in range(37)]
    )


class TestSkewCombinators:
    def test_salted_join_matches_plain_inner(self, skewed, dim):
        plain = skewed.join(dim, "entity_id")
        salted = salted_join(skewed, dim, "entity_id", n_salts=8)
        cols = sorted(plain.columns)
        assert _rows(salted.select(cols), cols) == _rows(plain.select(cols), cols)

    def test_salted_join_left_keeps_unmatched(self, skewed, dim):
        small = dim.filter(F.col("entity_id") < 3)
        plain = skewed.join(small, "entity_id", "left")
        salted = salted_join(skewed, small, "entity_id", n_salts=4, how="left")
        cols = sorted(plain.columns)
        assert _rows(salted.select(cols), cols) == _rows(plain.select(cols), cols)

    def test_salted_join_rejects_unsupported_how(self, skewed, dim):
        with pytest.raises(ValueError):
            salted_join(skewed, dim, "entity_id", how="full")

    def test_salted_agg_count_sum_collect(self, skewed):
        plain = skewed.groupBy("entity_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sort_array(F.collect_list("v")).alias("vals"),
            F.sort_array(F.collect_set("tag")).alias("tags"),
        )
        salted = salted_agg(
            skewed,
            ["entity_id"],
            {
                "n": (None, "count", "sum"),
                "sv": ("v", "sum", "sum"),
                "vals": ("v", "collect_list", "flatten_collect"),
                "tags": ("tag", "collect_set", "flatten_set"),
            },
            n_salts=8,
        ).select(
            "entity_id",
            "n",
            "sv",
            F.sort_array("vals").alias("vals"),
            F.sort_array("tags").alias("tags"),
        )
        def canon(df):
            return sorted(
                (r["entity_id"], r["n"], r["sv"], tuple(r["vals"]), tuple(r["tags"]))
                for r in df.collect()
            )
        assert canon(salted) == canon(plain)

    def test_salted_agg_rejects_unknown_merge(self, skewed):
        with pytest.raises(ValueError):
            salted_agg(skewed, ["entity_id"], {"x": ("v", "sum", "median")})

    def test_salted_count_distinct_exact(self, skewed):
        plain = skewed.groupBy("entity_id").agg(
            F.countDistinct("tag").alias("n_distinct")
        )
        salted = salted_count_distinct(skewed, ["entity_id"], "tag", n_salts=8)
        assert _rows(salted) == _rows(plain)

    def test_salted_count_distinct_spreads_hot_key(self, skewed):
        # the hot key's distinct values occupy >1 salt group (i.e. the
        # value-aligned salt actually scatters the reduce-side work)
        from bigdata_cookbook_spark.operators.skew import SALT_COL
        n_groups = (
            skewed.filter(F.col("entity_id") == 0)
            .select(F.pmod(F.hash("v"), F.lit(8)).alias(SALT_COL))
            .distinct()
            .count()
        )
        assert n_groups > 1


class TestZOrderLayout:
    def test_zorder_skips_row_groups_on_both_dims(self, spark, sf_dir, tmp_path):
        """Multi-column data skipping: after write_zordered on
        (l_partkey, l_suppkey), a selective range filter on EITHER
        column overlaps far fewer files' min/max ranges than the
        unsorted layout — the property ORDER BY one column cannot give
        both dimensions at once."""
        import pyarrow.parquet as pq
        import glob as globmod

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
        )
        plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
        li.repartition(16).write.mode("overwrite").parquet(plain)
        write_zordered(li, zord, zcols=["l_partkey", "l_suppkey"], files=16)

        def overlapping(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
            total = hit = 0
            for f in globmod.glob(f"{path}/*.parquet"):
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    s = md.row_group(rg).column(
                        [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                    ).statistics
                    total += 1
                    if s.min <= hi and s.max >= lo:
                        hit += 1
            return hit, total

        stats = li.agg(
            F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
        ).first()
        for col, mn, mx in [
            ("l_partkey", stats[0], stats[1]),
            ("l_suppkey", stats[2], stats[3]),
        ]:
            span = mx - mn
            lo, hi = mn + span * 0.40, mn + span * 0.45  # 5% slice mid-domain
            hit_p, tot_p = overlapping(plain, col, lo, hi)
            hit_z, tot_z = overlapping(zord, col, lo, hi)
            assert tot_p >= 16 and tot_z >= 16
            assert hit_p == tot_p, f"unsorted layout should overlap everywhere ({col})"
            # range-partition boundaries don't align exactly with z-bit
            # cuts, so demand >=40% skipped on EVERY dimension (measured:
            # 56-75% at files=16) — the unsorted layout skips nothing
            assert hit_z <= int(tot_z * 0.6), (
                f"z-order should skip >=40% of row groups on {col}: {hit_z}/{tot_z}"
            )

        # layout must never change content
        a = sorted(map(tuple, li.collect()))
        b = sorted(map(tuple, spark.read.parquet(zord).collect()))
        assert a == b


class TestCompaction:
    def test_compact_small_files(self, spark, sf_dir, tmp_path):
        """200 tiny files -> a handful sized by actual bytes; content
        identical; readers never see a half-compacted dir (temp+swap)."""
        from bigdata_cookbook_spark.plans.layout import compact_files

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        path = str(tmp_path / "shredded")
        li.repartition(200).write.mode("overwrite").parquet(path)
        before = sorted(map(tuple, spark.read.parquet(path).collect()))
        stats = compact_files(spark, path, target_mb=1)
        assert stats["files_before"] >= 200
        assert stats["files_after"] < stats["files_before"] // 10
        after = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert after == before

    def test_compact_preserves_partition_layout(self, spark, sf_dir, tmp_path):
        from bigdata_cookbook_spark.plans.layout import compact_files

        events = load_table(spark, sf_dir, "events").select(
            "event_id", F.to_date("ts").alias("day")
        )
        path = str(tmp_path / "by_day")
        events.repartition(40).write.mode("overwrite").partitionBy("day").parquet(path)
        n_days = events.select("day").distinct().count()
        stats = compact_files(spark, path, target_mb=64, partition_col="day")
        assert stats["files_after"] <= n_days  # ~1 file per partition at this size
        back = spark.read.parquet(path)
        assert back.select("day").distinct().count() == n_days
        assert back.count() == events.count()


class TestUpsertPartitions:
    def test_upsert_rewrites_only_touched_partitions(self, spark, tmp_path):
        """Update one key + insert one key in day=2; day=1's files must be
        byte-untouched; merged content exact."""
        import glob as globmod
        import os

        from bigdata_cookbook_spark.plans.layout import upsert_partitions

        base = spark.createDataFrame(
            [(1, "a", "2024-01-01"), (2, "b", "2024-01-01"), (3, "c", "2024-01-02")],
            "k int, v string, day string",
        )
        path = str(tmp_path / "tbl")
        base.write.mode("overwrite").partitionBy("day").parquet(path)
        day1_files = {
            f: os.path.getmtime(f)
            for f in globmod.glob(f"{path}/day=2024-01-01/*.parquet")
        }
        updates = spark.createDataFrame(
            [(3, "c2", "2024-01-02"), (4, "d", "2024-01-02")],
            "k int, v string, day string",
        )
        stats = upsert_partitions(spark, path, updates, keys=["k"], partition_col="day")
        assert stats == {"partitions_rewritten": 1, "rows_upserted": 2}
        got = {
            # partition-dir values read back type-inferred (date here)
            (r["k"], str(r["day"])): r["v"]
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            (1, "2024-01-01"): "a",
            (2, "2024-01-01"): "b",
            (3, "2024-01-02"): "c2",
            (4, "2024-01-02"): "d",
        }
        for f, mtime in day1_files.items():
            assert os.path.getmtime(f) == mtime, "untouched partition was rewritten"

    def test_upsert_empty_updates_noop(self, spark, tmp_path):
        from bigdata_cookbook_spark.plans.layout import upsert_partitions

        base = spark.createDataFrame([(1, "a", "d1")], "k int, v string, day string")
        path = str(tmp_path / "tbl2")
        base.write.mode("overwrite").partitionBy("day").parquet(path)
        stats = upsert_partitions(
            spark, path, base.limit(0), keys=["k"], partition_col="day"
        )
        assert stats == {"partitions_rewritten": 0, "rows_upserted": 0}
        assert spark.read.parquet(path).count() == 1


class TestCrashSafeCommit:
    """Fault injection for the round-4 write-audit-publish commit:
    whatever point the process dies at, a reader sees old-or-new table
    bytes (never a half-written mix), and recover_pending rolls any
    post-manifest crash forward to the new state."""

    @staticmethod
    def _mktable(spark, tmp_path, name):
        base = spark.createDataFrame(
            [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
            "k int, v string, day string",
        )
        path = str(tmp_path / name)
        base.write.mode("overwrite").partitionBy("day").parquet(path)
        return path

    def test_crash_between_stage_and_manifest_leaves_base_untouched(
        self, spark, tmp_path, monkeypatch
    ):
        """Die after staging but BEFORE the manifest rename: the base is
        bit-identical old state; the stale ._ staging dir is invisible to
        Spark and inert; a later upsert run succeeds normally."""
        import bigdata_cookbook_spark.plans.layout as layout

        path = self._mktable(spark, tmp_path, "t_pre_manifest")
        old = {(r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()}
        updates = spark.createDataFrame(
            [(3, "c2", "d2")], "k int, v string, day string"
        )

        def boom(*a, **kw):
            raise RuntimeError("injected crash before manifest")

        monkeypatch.setattr(layout, "_write_manifest", boom)
        with pytest.raises(RuntimeError, match="injected"):
            layout.upsert_partitions(spark, path, updates, ["k"], "day")
        assert {
            (r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()
        } == old
        monkeypatch.undo()
        stats = layout.upsert_partitions(spark, path, updates, ["k"], "day")
        assert stats["partitions_rewritten"] == 1
        assert {
            (r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()
        } == {(1, "d1"): "a", (2, "d1"): "b", (3, "d2"): "c2"}

    def test_crash_between_manifest_and_swap_rolls_forward(
        self, spark, tmp_path, monkeypatch
    ):
        """Die AFTER the manifest publish, before any promote: readers
        still see the complete OLD state; recover_pending completes the
        commit to the complete NEW state."""
        import bigdata_cookbook_spark.plans.layout as layout

        path = self._mktable(spark, tmp_path, "t_post_manifest")
        old = {(r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()}
        updates = spark.createDataFrame(
            [(3, "c2", "d2"), (4, "d", "d3")], "k int, v string, day string"
        )

        def boom(*a, **kw):
            raise RuntimeError("injected crash before promote")

        monkeypatch.setattr(layout, "_promote", boom)
        with pytest.raises(RuntimeError, match="injected"):
            layout.upsert_partitions(spark, path, updates, ["k"], "day")
        # old state fully readable (manifest + staging are ._-prefixed)
        assert {
            (r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()
        } == old
        monkeypatch.undo()
        rec = layout.recover_pending(path)
        assert rec["recovered"] == 1 and rec["promoted"] == 2
        assert {
            (r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()
        } == {(1, "d1"): "a", (2, "d1"): "b", (3, "d2"): "c2", (4, "d3"): "d"}
        # idempotent: nothing left to recover
        assert layout.recover_pending(path) == {"recovered": 0, "promoted": 0}

    def test_crash_mid_promote_retired_but_not_promoted(
        self, spark, tmp_path, monkeypatch
    ):
        """Die between the retire rename and the promote rename of one
        partition (the worst point): the partition is briefly absent, the
        rest of the table is old bytes, and recovery restores the NEW
        partition — nothing is ever half-written or lost."""
        import os

        import bigdata_cookbook_spark.plans.layout as layout

        path = self._mktable(spark, tmp_path, "t_mid_promote")
        updates = spark.createDataFrame(
            [(3, "c2", "d2")], "k int, v string, day string"
        )
        real_rename = os.rename
        state = {"renames": 0}

        def flaky_rename(src, dst):
            real_rename(src, dst)
            # first rename inside _promote is the retire; die right after
            if "__retired__" in dst:
                raise RuntimeError("injected crash mid-promote")

        monkeypatch.setattr(layout.os, "rename", flaky_rename)
        with pytest.raises(RuntimeError, match="mid-promote"):
            layout.upsert_partitions(spark, path, updates, ["k"], "day")
        monkeypatch.undo()
        # d2 is mid-swap (absent), d1 intact old bytes — and recovery
        # completes to the new state
        assert not os.path.isdir(os.path.join(path, "day=d2"))
        rec = layout.recover_pending(path)
        assert rec["recovered"] == 1 and rec["promoted"] == 1
        assert {
            (r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()
        } == {(1, "d1"): "a", (2, "d1"): "b", (3, "d2"): "c2"}

    def test_compact_crash_after_manifest_rolls_forward(
        self, spark, tmp_path, monkeypatch
    ):
        """compact_files same protocol: crash after manifest -> old bytes
        still served; recover_pending publishes the compacted dir."""
        import glob as globmod

        import bigdata_cookbook_spark.plans.layout as layout

        df = spark.range(1000).withColumn("v", F.col("id") * 2)
        path = str(tmp_path / "cmp")
        df.repartition(24).write.mode("overwrite").parquet(path)
        n_before = len(globmod.glob(f"{path}/*.parquet"))
        assert n_before >= 24

        def boom(*a, **kw):
            raise RuntimeError("injected crash before promote")

        monkeypatch.setattr(layout, "_promote", boom)
        with pytest.raises(RuntimeError, match="injected"):
            layout.compact_files(spark, path, target_mb=256)
        assert spark.read.parquet(path).count() == 1000  # old state intact
        assert len(globmod.glob(f"{path}/*.parquet")) == n_before
        monkeypatch.undo()
        rec = layout.recover_pending(path)
        assert rec["recovered"] == 1 and rec["promoted"] == 1
        assert spark.read.parquet(path).count() == 1000
        assert len(globmod.glob(f"{path}/*.parquet")) == 1  # compacted

    def test_crashed_upsert_self_heals_on_next_run(
        self, spark, tmp_path, monkeypatch
    ):
        """The operational contract end-to-end: a nightly upsert crashes
        mid-promote; the NEXT night's upsert_partitions call — with no
        explicit recover_pending and no operator intervention — first
        rolls the stranded commit forward (writer-entry recovery), then
        applies its own batch. Both nights' rows land; nothing is lost
        or double-applied."""
        import os

        import bigdata_cookbook_spark.plans.layout as layout

        path = self._mktable(spark, tmp_path, "t_self_heal")
        night1 = spark.createDataFrame(
            [(3, "c2", "d2"), (4, "d", "d3")], "k int, v string, day string"
        )
        real_rename = os.rename

        def flaky_rename(src, dst):
            real_rename(src, dst)
            if "__retired__" in dst:
                raise RuntimeError("injected crash mid-promote")

        monkeypatch.setattr(layout.os, "rename", flaky_rename)
        with pytest.raises(RuntimeError, match="mid-promote"):
            layout.upsert_partitions(spark, path, night1, ["k"], "day")
        monkeypatch.undo()
        # some partition is stranded mid-swap; the manifest is pending
        assert any(
            f.startswith("._commit_manifest_") for f in os.listdir(path)
        )

        # night 2: a NORMAL call — no explicit recovery
        night2 = spark.createDataFrame(
            [(1, "a2", "d1")], "k int, v string, day string"
        )
        stats = layout.upsert_partitions(spark, path, night2, ["k"], "day")
        assert stats["partitions_rewritten"] == 1
        # night 1's commit was rolled forward AND night 2 applied
        assert {
            (r.k, str(r.day)): r.v for r in spark.read.parquet(path).collect()
        } == {
            (1, "d1"): "a2",
            (2, "d1"): "b",
            (3, "d2"): "c2",
            (4, "d3"): "d",
        }
        # no pending manifests or stranded staging dirs remain
        assert not any(
            f.startswith("._commit_manifest_") for f in os.listdir(path)
        )
        parent = os.path.dirname(path.rstrip("/"))
        assert not any(
            f.startswith("._upsert_") for f in os.listdir(parent)
        )
