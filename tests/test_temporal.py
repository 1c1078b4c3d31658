"""Temporal join operators: as-of tolerance/ties, binned range join
equivalence with the naive theta join, bin-edge inclusivity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.temporal import asof_join, range_join_binned


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 10:00:00"), px=10.0),
            Row(sym="A", ts=_ts("2024-01-01 10:05:00"), px=11.0),
            Row(sym="B", ts=_ts("2024-01-01 09:00:00"), px=5.0),
        ]
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 10:03:00"), qty=1),   # -> px 10
            Row(sym="A", ts=_ts("2024-01-01 10:05:00"), qty=2),   # tie -> px 11
            Row(sym="A", ts=_ts("2024-01-01 09:59:59"), qty=3),   # -> no quote
            Row(sym="B", ts=_ts("2024-01-01 18:00:00"), qty=4),   # -> px 5 (stale)
            Row(sym="C", ts=_ts("2024-01-01 12:00:00"), qty=5),   # key w/o quotes
        ]
    )


class TestAsofJoin:
    def test_backward_match_ties_and_misses(self, quotes, trades):
        out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["px"])
        got = {r["qty"]: r["px"] for r in out.collect()}
        assert got == {1: 10.0, 2: 11.0, 3: None, 4: 5.0, 5: None}
        assert out.count() == trades.count()  # left join: every trade kept

    def test_tolerance_nulls_stale_matches(self, quotes, trades):
        out = asof_join(
            trades, quotes, on="ts", by=["sym"], right_cols=["px"],
            tolerance="1 hour",
        )
        got = {r["qty"]: r["px"] for r in out.collect()}
        # B's only quote is 9 h old -> nulled; A's matches are minutes old
        assert got == {1: 10.0, 2: 11.0, 3: None, 4: None, 5: None}

    def test_matched_ts_surfaced(self, quotes, trades):
        out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["px"])
        row = {r["qty"]: r["__asof_ts"] for r in out.collect()}
        assert row[1] == _ts("2024-01-01 10:00:00")
        assert row[4] == _ts("2024-01-01 09:00:00")

    def test_collision_rejected(self, quotes, trades):
        with pytest.raises(ValueError, match="collide"):
            asof_join(trades, quotes.withColumnRenamed("px", "qty"),
                      on="ts", by=["sym"], right_cols=["qty"])

    def test_bad_direction_rejected(self, quotes, trades):
        with pytest.raises(ValueError, match="direction"):
            asof_join(trades, quotes, on="ts", by=["sym"], direction="nearest")

    def test_forward_with_tolerance(self, quotes, trades):
        out = asof_join(
            trades, quotes, on="ts", by=["sym"], right_cols=["px"],
            direction="forward", tolerance="3 minutes",
        )
        got = {r["qty"]: r["px"] for r in out.collect()}
        # qty=3 (09:59:59) -> next quote 10:00:00 within 3 min; qty=1
        # (10:03) -> next quote 10:05 within 3 min; qty=2 exact match at
        # 10:05; qty=4 (18:00) has no following quote; qty=5 no quotes
        assert got == {1: 11.0, 2: 11.0, 3: 10.0, 4: None, 5: None}


class TestRangeJoinBinned:
    @pytest.fixture(scope="class")
    def points(self, spark, sf_dir):
        from bigdata_cookbook_spark.sources.testdata import load_table

        ev = load_table(spark, sf_dir, "events")
        return ev.select("user_id", F.col("ts").alias("ev_ts"),
                         F.col("event_id").alias("ev_id"))

    @pytest.fixture(scope="class")
    def intervals(self, spark, sf_dir):
        from bigdata_cookbook_spark.sources.testdata import load_table

        ev = load_table(spark, sf_dir, "events")
        return (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts", "event_id")
            .withColumn("end_ts", F.col("ts") + F.expr("INTERVAL 3 HOURS"))
        )

    def _naive(self, points, intervals):
        return intervals.join(
            points,
            (points.user_id == intervals.user_id)
            & (points.ev_ts > intervals.ts)
            & (points.ev_ts <= intervals.end_ts),
        ).select(intervals.event_id, points.ev_id)

    @pytest.mark.parametrize("bin_seconds", [600, 3600, 86400])
    def test_matches_naive_theta_join_any_bin_width(
        self, points, intervals, bin_seconds
    ):
        binned = range_join_binned(
            points, intervals, "ev_ts", "ts", "end_ts",
            equi_keys=["user_id"], bin_seconds=bin_seconds,
        ).select("event_id", "ev_id")
        naive = self._naive(points, intervals)
        assert sorted(map(tuple, binned.collect())) == sorted(
            map(tuple, naive.collect())
        )

    def test_inclusive_bounds(self, spark):
        pts = spark.createDataFrame(
            [Row(ts=_ts("2024-01-01 10:00:00"), pid=1),
             Row(ts=_ts("2024-01-01 11:00:00"), pid=2)]
        )
        iv = spark.createDataFrame(
            [Row(s=_ts("2024-01-01 10:00:00"), e=_ts("2024-01-01 11:00:00"), iid=7)]
        )
        def run(inc):
            return sorted(
                r["pid"]
                for r in range_join_binned(
                    pts, iv, "ts", "s", "e", bin_seconds=1800, inclusive=inc
                ).collect()
            )
        assert run((True, True)) == [1, 2]
        assert run((False, True)) == [2]
        assert run((True, False)) == [1]
        assert run((False, False)) == []


class TestPlans:
    def test_asof_join_is_single_shuffle(self, quotes, trades):
        from bigdata_cookbook_spark.plans.explain import explain_str

        import re

        out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["px"])
        plan = explain_str(out, mode="formatted")
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchanges == 1, f"as-of join must shuffle once, saw {n_exchanges}"

    def test_range_join_plans_as_equi_join(self, spark, sf_dir):
        """The binned formulation must hash-join on (keys, bin) — a naive
        range predicate would fall back to a nested-loop join, the exact
        plan shape that cannot run at scale."""
        from bigdata_cookbook_spark.plans.explain import explain_str
        from bigdata_cookbook_spark.sources.testdata import load_table

        ev = load_table(spark, sf_dir, "events")
        iv = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts", "event_id")
            .withColumn("end_ts", F.col("ts") + F.expr("INTERVAL 3 HOURS"))
        )
        pts = ev.select("user_id", F.col("ts").alias("ev_ts"),
                        F.col("event_id").alias("ev_id"))
        out = range_join_binned(pts, iv, "ev_ts", "ts", "end_ts",
                                equi_keys=["user_id"], bin_seconds=3600)
        plan = explain_str(out, mode="formatted")
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert "Join" in plan


class TestAsofVsPandas:
    """Randomized equivalence with pandas.merge_asof (backward,
    allow_exact_matches=True) — the de-facto as-of semantics reference."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_merge_asof(self, spark, seed, direction):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(seed)
        n_l, n_r = 120, 80
        left = pd.DataFrame({
            "k": rng.integers(0, 6, n_l),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
            "lid": np.arange(n_l),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 6, n_r),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
            "val": rng.normal(size=n_r).round(6),
        })
        # merge_asof requires unique right (k, ts) for a deterministic
        # answer; drop dups the same way the engine contract assumes
        right = right.sort_values("ts").drop_duplicates(["k", "ts"], keep="last")

        expected = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="k", direction=direction, allow_exact_matches=True,
        ).set_index("lid")["val"]

        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts", by=["k"], right_cols=["val"], direction=direction,
        ).collect()
        got = {r["lid"]: r["val"] for r in out}
        assert len(got) == n_l
        for lid, exp in expected.items():
            g = got[lid]
            if pd.isna(exp):
                assert g is None
            else:
                assert g == pytest.approx(exp)


class TestAsofOnTypes:
    def test_bigint_epoch_on_column(self, spark):
        """`on` need not be a timestamp: epoch-long ordering keys union
        cleanly (the null placeholder casts to the right side's real
        type)."""
        left = spark.createDataFrame([(1, 100), (1, 205), (2, 50)], "k int, ts long")
        right = spark.createDataFrame(
            [(1, 90, "a"), (1, 200, "b"), (2, 60, "c")], "k int, ts long, v string"
        )
        out = asof_join(left, right, on="ts", by=["k"])
        got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
        assert got == {(1, 100): "a", (1, 205): "b", (2, 50): None}

    def test_tolerance_requires_temporal_on(self, spark):
        left = spark.createDataFrame([(1, 100)], "k int, ts long")
        right = spark.createDataFrame([(1, 90, "a")], "k int, ts long, v string")
        with pytest.raises(ValueError, match="tolerance requires"):
            asof_join(left, right, on="ts", by=["k"], tolerance="2 hours")
