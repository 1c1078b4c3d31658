"""quality_prune (operators/corpus.py): exact discrete-threshold keep-top-
fraction-per-group semantics, pinned against a brute-force Python model."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.corpus import quality_prune


def _brute(rows, keep_frac):
    """The declared semantics: per group, cut = smallest score whose
    cumulative count exceeds (1-keep_frac)*n; keep score >= cut."""
    by_grp = {}
    for g, s in rows:
        by_grp.setdefault(g, []).append(s)
    kept = set()
    for g, scores in by_grp.items():
        scores_sorted = sorted(scores)
        n = len(scores_sorted)
        q = (1.0 - keep_frac) * n
        cum = 0
        cut = None
        seen = []
        for v in scores_sorted:
            cum += 1
            if cut is None and cum > q:
                cut = v
        for i, s in enumerate(scores):
            if s >= cut:
                kept.add((g, i))
    return kept


def test_quality_prune_matches_brute_force(spark):
    rows = []
    data = {
        "a": [5, 1, 9, 3, 3, 3, 7, 2],   # heavy ties at the cut region
        "b": [10, 20, 30],
        "c": [4],                         # singleton group
    }
    flat = []
    for g, scores in data.items():
        for i, s in enumerate(scores):
            flat.append((g, i, s))
    df = spark.createDataFrame(flat, "grp string, idx int, score int")
    out = quality_prune(df, "score", "grp", keep_frac=0.5).collect()
    got = {(r.grp, r.idx) for r in out}
    want = _brute([(g, s) for g, scores in data.items() for s in scores], 0.5)
    assert got == want


def test_quality_prune_keeps_at_least_fraction(spark):
    """Ties inflate the kept set, never deflate it: kept >= keep_frac*n
    per group (up to the ceiling of the discrete cut)."""
    flat = [("g", i, i % 7) for i in range(200)]
    df = spark.createDataFrame(flat, "grp string, idx int, score int")
    for frac in (0.25, 0.5, 0.75):
        kept = quality_prune(df, "score", "grp", keep_frac=frac).count()
        assert kept >= math.floor(frac * 200)


def test_quality_prune_per_group_independence(spark):
    """A low-scoring group keeps its own best rows — the reason the cut
    is per-group, not global."""
    flat = [("hi", i, 1000 + i) for i in range(10)] + [
        ("lo", i, i) for i in range(10)
    ]
    df = spark.createDataFrame(flat, "grp string, idx int, score int")
    out = quality_prune(df, "score", "grp", keep_frac=0.5)
    per_grp = {
        r.grp: r.n
        for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_grp == {"hi": 5, "lo": 5}


def test_quality_prune_threshold_is_broadcast(spark, sf_dir):
    """The per-group threshold joins back as a broadcast — the fact table
    is never shuffled."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    out = quality_prune(docs, "n_chars", "source", keep_frac=0.6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quality_prune_rejects_fractional_score_without_quantize(spark):
    """Continuous scores make the (group, score) histogram approach row
    cardinality and the per-group cumsum window single-reduce — the
    operator fails loud instead of silently degrading (r6 verdict #3)."""
    import pytest

    df = spark.createDataFrame(
        [("g", 0, 1.5), ("g", 1, 2.5)], "grp string, idx int, score double"
    )
    with pytest.raises(TypeError, match="quantize"):
        quality_prune(df, "score", "grp", keep_frac=0.5)
    # a pinned thresholds table (the streaming form) still applies to a
    # float fact column without quantize — the filter is type-agnostic
    thr = spark.createDataFrame([("g", 2.0)], "grp string, __thr double")
    assert quality_prune(df, "score", "grp", thresholds=thr).count() == 1


def test_quality_prune_quantized_float_matches_bucketed_brute(spark):
    """quantize=w buckets scores to floor(s/w)*w before the histogram;
    the cut is a bucket lower edge, every row with score >= cut
    survives, and kept >= keep_frac * n (ties widen to the cut bucket)."""
    import random

    rng = random.Random(7)
    rows = [("a", i, rng.uniform(0, 10)) for i in range(300)] + [
        ("b", i, rng.gauss(5, 2)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "grp string, idx int, score double")
    w = 0.25
    for frac in (0.3, 0.5, 0.8):
        out = {
            (r.grp, r.idx)
            for r in quality_prune(
                df, "score", "grp", keep_frac=frac, quantize=w
            ).collect()
        }
        # _brute keys by (grp, position-within-group); map back to idx
        by_grp_pos = {}
        expect = set()
        pos = {}
        for g, i, s in rows:
            p = pos.get(g, 0)
            pos[g] = p + 1
            by_grp_pos[(g, p)] = (g, i)
        for key in _brute([(g, math.floor(s / w) * w) for g, _, s in rows], frac):
            expect.add(by_grp_pos[key])
        assert out == expect
        per_grp_n = {"a": 300, "b": 200}
        for g, n in per_grp_n.items():
            kept_g = sum(1 for (gg, _) in out if gg == g)
            assert kept_g >= math.floor(frac * n)


def test_quality_prune_quantize_bounds_histogram_cardinality(spark):
    """The quantized histogram's distinct-value count per group is
    bounded by score-range / width, not by row count."""
    from bigdata_cookbook_spark.operators.corpus import quality_prune_thresholds

    rows = [("g", i, (i * 0.001) % 4.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "grp string, idx int, score double")
    w = 0.5
    thr = quality_prune_thresholds(df, "score", "grp", 0.5, quantize=w)
    # threshold is a bucket edge: an exact multiple of w
    val = thr.collect()[0]["__thr"]
    assert abs(val / w - round(val / w)) < 1e-9
    distinct_buckets = (
        df.select((F.floor(F.col("score") / w) * w).alias("b")).distinct().count()
    )
    assert distinct_buckets <= math.ceil(4.0 / w) + 1
