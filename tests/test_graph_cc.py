"""Connected components + dedup clustering: randomized equivalence with a
pure-Python union-find, chain worst case, and the LSH-pairs integration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.graph import connected_components, dedup_clusters


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node in component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_union_find_random(spark, seed):
    rng = np.random.default_rng(seed)
    n, m = 200, 150
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    expected = _union_find(n, edges)
    touched = {v for e in edges for v in e}
    assert got == {v: c for v, c in expected.items() if v in touched}


def test_chain_converges(spark):
    """Worst-case diameter for label propagation: a path graph."""
    n = 12
    df = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(n - 1)])
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=n).collect()}
    assert got == {i: 0 for i in range(n)}


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(9)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=1)


def test_self_loops_ignored(spark):
    df = spark.createDataFrame([Row(src=1, dst=1), Row(src=2, dst=3)])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {2: 2, 3: 2}  # the pure self-loop node has no real edge


def test_dedup_clusters_end_to_end(spark, sf_dir):
    """LSH candidate pairs -> transitive clusters -> canonical per doc;
    singletons map to themselves."""
    from bigdata_cookbook_spark.operators.dedup import minhash_lsh_candidates
    from bigdata_cookbook_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, num_hashes=12, band_size=2)
    out = dedup_clusters(pairs, docs, id_col="doc_id")
    assert out.count() == docs.count()
    # canonical ids are component minima: canonical <= member everywhere
    assert out.filter(F.col("canonical_id") > F.col("doc_id")).count() == 0
    # transitivity: a doc's canonical is itself canonical
    canon = out.select(F.col("canonical_id").alias("doc_id")).distinct()
    joined = canon.join(out, "doc_id").filter(~F.col("is_canonical"))
    assert joined.count() == 0
    # at least one multi-doc cluster exists in the fixture corpus
    multi = out.groupBy("canonical_id").count().filter(F.col("count") > 1)
    assert multi.count() > 0


def test_long_chain_converges_via_pointer_jumping(spark):
    """The round-4 sf1 failure class: a chain whose diameter far exceeds
    max_iter. Pointer jumping (label <- label(label) each round) makes
    convergence O(log diameter) — a 300-node path must converge well
    inside the default 20-round budget (propagation-only would need
    300) and still label every node with the chain minimum."""
    df = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(300)])
    got = connected_components(df, max_iter=12)
    assert got.select(F.countDistinct("component")).collect()[0][0] == 1
    assert got.agg(F.max("component")).collect()[0][0] == 0
    assert got.count() == 301


def test_dedup_keep_best_planted(spark):
    """A cluster of a full article and two truncations keeps the longest;
    ties break to min id; singletons are their own canonical."""
    from bigdata_cookbook_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [
            (1, 100),  # truncated copy
            (2, 500),  # the full article -> keeper
            (3, 100),  # another truncation
            (4, 500),  # tie cluster: same score as 5 -> min id 4 wins
            (5, 500),
            (9, 7),    # singleton
        ],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: (r.canonical_id, r.is_canonical)
        for r in dedup_keep_best(pairs, docs, "n_chars").collect()
    }
    assert got == {
        1: (2, False),
        2: (2, True),
        3: (2, False),
        4: (4, True),
        5: (4, False),
        9: (9, True),
    }


@pytest.mark.parametrize("seed", [0, 1])
def test_dedup_keep_best_matches_brute_force(spark, seed):
    """Random graph + random scores: canonical = argmax score (tie min id)
    within the union-find component."""
    from bigdata_cookbook_spark.operators.graph import dedup_keep_best

    rng = np.random.default_rng(seed)
    n, m = 120, 90
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))]
    edges = [(a, b) for a, b in edges if a != b]
    scores = {v: int(rng.integers(0, 10)) for v in range(n)}  # force ties
    docs = spark.createDataFrame(
        [(v, scores[v]) for v in range(n)], "doc_id long, score long"
    )
    pairs = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in edges]
    )
    comp = _union_find(n, edges)
    members = {}
    for v in range(n):
        members.setdefault(comp[v], []).append(v)
    want = {}
    touched = {v for e in edges for v in e}
    for root, vs in members.items():
        best = min(vs, key=lambda v: (-scores[v], v))
        for v in vs:
            want[v] = best if v in touched else v
    got = {
        r.doc_id: r.canonical_id
        for r in dedup_keep_best(pairs, docs, "score").collect()
    }
    assert got == want
