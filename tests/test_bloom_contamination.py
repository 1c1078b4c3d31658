"""Bloom-prefiltered decontamination (operators/dedup.py): the map-side
Bloom probe must never drop a true contaminator (no false negatives), must
actually prune disjoint documents before the exact verify join, and the
end result must be bit-identical to the exact contamination_pairs tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.dedup import (
    ShingleBloom,
    bloom_contamination,
    bloom_might_contain,
    build_shingle_bloom,
    contamination_pairs,
    doc_shingles,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negatives(spark):
    """Every shingle of the eval set must probe positive — the exactness
    of the whole tier rests on this."""
    rows = [(i, f"token{i} alpha beta gamma delta epsilon zeta eta theta word{i}")
            for i in range(40)]
    ev = _docs(spark, rows)
    bloom = build_shingle_bloom(ev, n=8)
    assert bloom.n_items > 0
    probes = (
        doc_shingles(ev, "text", "doc_id", 8, repartition=False)
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
        .withColumn("hit", bloom_might_contain(bloom, F.col("sh")))
    )
    misses = probes.filter(~F.col("hit")).count()
    assert misses == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Absent keys rarely probe positive at the default 12 bits/item, k=5
    sizing (expected ~0.5%; assert a loose 5% so the test is not flaky
    on hash luck)."""
    ev = _docs(
        spark,
        [(i, f"ev{i} aa bb cc dd ee ff gg hh ii jj kk") for i in range(50)],
    )
    bloom = build_shingle_bloom(ev, n=8)
    absent = spark.range(5000).select(
        F.xxhash64(F.concat(F.lit("absent:"), F.col("id"))).alias("sh")
    )
    fp = absent.filter(bloom_might_contain(bloom, F.col("sh"))).count()
    assert fp / 5000 < 0.05


def test_bloom_prefilter_prunes_disjoint_docs(spark):
    """Documents sharing no 8-gram with the eval set must be dropped by
    the probe itself, before any join — the point of the tier."""
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(
        spark,
        [(1, eval_text)]
        + [
            (100 + i, f"disjoint{i} one two three four five six seven eight nine")
            for i in range(30)
        ],
    )
    ev = corpus.filter("doc_id = 1")
    bloom = build_shingle_bloom(ev, n=8)
    flagged = (
        doc_shingles(corpus, "text", "doc_id", 8)
        .filter(bloom_might_contain(bloom, F.xxhash64("shingle")))
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert {r.doc_id for r in flagged} == {1}


def test_bloom_contamination_matches_exact_tier(spark, sf_dir):
    """Full parity on real documents: the registry configuration (eval =
    doc_id % 7 == 0, threshold 0.3) produces the identical pair set and
    containment values as the exact tier."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    exact = {
        (r.train_id, r.eval_id): r.containment
        for r in contamination_pairs(
            docs, ev, n=8, threshold=0.3, broadcast_eval=False
        ).collect()
    }
    got = {
        (r.train_id, r.eval_id): r.containment
        for r in bloom_contamination(
            docs, ev, n=8, threshold=0.3, broadcast_eval=False
        ).collect()
    }
    assert got == exact
    assert len(got) > 0


def test_bloom_contamination_empty_eval(spark):
    """An empty eval set yields an all-zeros filter and an empty result,
    not an error."""
    corpus = _docs(spark, [(1, "one two three four five six seven eight nine")])
    ev = corpus.filter("doc_id < 0")
    out = bloom_contamination(corpus, ev, n=8, threshold=0.3)
    assert out.count() == 0


def test_bloom_sizing_and_cap():
    """m scales with item count at bits_per_item and respects the cap."""
    b = ShingleBloom((0,) * 32, 2048, 5, 0)
    assert b.m // 64 == len(b.words)


# ---------------------------------------------------------------------------
# semantic_dedup_kmeans (true-SemDeDup tier; lives here with the other
# round-6 dedup additions)
# ---------------------------------------------------------------------------


def test_semantic_dedup_kmeans_matches_numpy_model(spark, sf_dir):
    """Given the SAME k-means assignments (deterministic seed), the kept
    set equals a numpy replication of the within-cluster lower-id prune."""
    import numpy as np

    from bigdata_cookbook_spark.ml.ivf import build_ivf
    from bigdata_cookbook_spark.operators.dedup import semantic_dedup_kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    import math

    k = max(2, math.ceil(n / 64))
    assignments, _ = build_ivf(emb, nlist=k, seed=123)
    rows = assignments.select("vec_id", "embedding", "cell").collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
        )
    dropped = set()
    for cell, members in by_cell.items():
        members.sort()
        for i, (ida, va) in enumerate(members):
            for idb, vb in members[i + 1:]:
                cos = round(
                    float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb)),
                    4,
                )
                if cos >= 0.4:
                    dropped.add(idb)
    want = {ida for ms in by_cell.values() for ida, _ in ms if ida not in dropped}
    got = {
        r.vec_id
        for r in semantic_dedup_kmeans(emb, threshold=0.4, seed=123).collect()
    }
    assert got == want
    assert len(got) < n  # something was actually pruned on this data


def test_semantic_dedup_kmeans_bucket_confinement(spark, sf_dir):
    """Output buckets are the k-means cells, and every kept row keeps its
    own cell id — the partition is real, not cosmetic."""
    from bigdata_cookbook_spark.operators.dedup import semantic_dedup_kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(500)
    out = semantic_dedup_kmeans(emb, threshold=0.99, n_clusters=8, seed=7)
    cells = {r.bucket for r in out.collect()}
    assert cells <= set(range(8))
    # near-1 threshold keeps almost everything
    assert out.count() >= 450


def test_probe_filter_matches_expression_form(spark):
    """The broadcast-join probe (scale form) and the array-literal
    expression probe keep exactly the same rows."""
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.operators.dedup import (
        bloom_probe_filter,
        build_shingle_bloom,
    )

    ev = _docs(
        spark,
        [(i, f"ev{i} aa bb cc dd ee ff gg hh ii jj kk") for i in range(30)],
    )
    bloom = build_shingle_bloom(ev, n=8)
    probes = spark.range(20000).select(F.xxhash64("id").alias("sh"))
    expr_hits = {
        r.sh for r in probes.filter(bloom_might_contain(bloom, F.col("sh"))).collect()
    }
    join_hits = {
        r.sh for r in bloom_probe_filter(probes, bloom, F.col("sh")).collect()
    }
    assert expr_hits == join_hits


def test_contamination_report_semantics(spark):
    """contamination_report: planted full-containment, partial
    sub-threshold leak, and zero-leak eval docs each report correctly —
    max_containment surfaces sub-threshold leaks the pairs query's
    threshold filter would hide, and the audit includes clean docs."""
    from bigdata_cookbook_spark.operators.dedup import contamination_report

    eval_text = "one two three four five six seven eight nine ten"
    rows = [
        (100, eval_text),  # eval doc (id % 7 pattern unused here)
        # full containment: a longer doc embedding the whole eval text
        (1, "prefix words " + eval_text + " suffix words"),
        # partial: shares the first 8-gram only (1 of 3 eval shingles)
        (2, "one two three four five six seven eight different tail here"),
        # disjoint corpus doc
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # a second eval doc with NO co-shingled corpus doc
        (200, "crimson violet amber teal indigo maroon ochre sienna umber jade"),
    ]
    docs = _docs(spark, rows)
    ev = docs.filter(F.col("doc_id").isin(100, 200))
    got = {
        r["eval_id"]: (r["n_flagged"], r["max_containment"], r["top_train_id"])
        for r in contamination_report(docs, ev, n=8, threshold=0.5).collect()
    }
    # eval 100: doc 1 contains all 3 shingles (flagged, containment 1.0);
    # doc 2 contains 1/3 = 0.3333 (NOT flagged at 0.5, but it IS the
    # sub-threshold leak max_containment must not hide — top stays doc 1)
    assert got[100] == (1, 1.0, 1)
    # eval 200: nothing co-shingles — present with the zero row
    assert got[200] == (0, 0.0, None)


def test_contamination_report_tie_break_smallest_id(spark):
    """Two corpus docs at identical containment: top_train_id is the
    smaller id (deterministic argmax, pinned against the oracle's
    ORDER BY c DESC, train_id ASC)."""
    from bigdata_cookbook_spark.operators.dedup import contamination_report

    eval_text = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (50, eval_text),
        (9, "pad " + eval_text),
        (4, eval_text + " pad"),
    ]
    docs = _docs(spark, rows)
    ev = docs.filter(F.col("doc_id") == 50)
    row = contamination_report(docs, ev, n=8, threshold=0.5).collect()[0]
    assert row["n_flagged"] == 2 and row["max_containment"] == 1.0
    assert row["top_train_id"] == 4


def test_bloom_build_bit_identical_to_reference(spark):
    """Round-11 optimization pin: build_shingle_bloom spreads the eval
    scan and materializes the distinct shingle-hash set once (lazy
    localCheckpoint) so the m-sizing count and the bit-position job
    share one shingle pass — and the RESULT may not move a bit: words,
    m, k and n_items must equal a brute-force reference built from the
    collected distinct hashes with the same xxhash64 re-keying."""
    ev = _docs(
        spark,
        [(i, f"doc{i} alpha beta gamma delta epsilon zeta eta theta i{i}")
         for i in range(25)],
    )
    bloom = build_shingle_bloom(ev, n=8, bits_per_item=12, n_hashes=5)

    hashes = [
        r.sh
        for r in doc_shingles(ev, "text", "doc_id", 8, repartition=False)
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
        .collect()
    ]
    assert bloom.n_items == len(hashes)
    m = 2048
    while m < 12 * max(len(hashes), 1):
        m <<= 1
    assert bloom.m == m
    # reference bit positions via the same JVM xxhash64(sh, i) re-keying
    pos_rows = (
        spark.createDataFrame([(h,) for h in hashes], "sh long")
        .select(
            F.explode(
                F.array(
                    *[
                        F.xxhash64(F.col("sh"), F.lit(i)).bitwiseAND(
                            F.lit(m - 1)
                        )
                        for i in range(5)
                    ]
                )
            ).alias("p")
        )
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos_rows:
        words[r.p >> 6] |= 1 << (r.p & 63)
    signed = tuple(w - (1 << 64) if w >= 1 << 63 else w for w in words)
    assert bloom.words == signed
