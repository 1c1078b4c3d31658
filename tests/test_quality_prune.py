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
