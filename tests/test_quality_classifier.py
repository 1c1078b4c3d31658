"""fastText-style learned quality gate (ml/quality_classifier.py):
separability on planted corpora, projected-scoring == feature-vector
margin parity, zero-exchange scoring plan, determinism."""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import functions as F

from bigdata_cookbook_spark.ml.quality_classifier import (
    gram_count_vectors,
    quality_gate,
    quality_score_expr,
    train_quality_classifier,
)

REF = [
    "the history of science is long",
    "an encyclopedia article about physics",
    "the biography of a famous mathematician",
    "a detailed article about chemistry",
] * 3
CRAWL = [
    "click here buy now cheap pills",
    "win money fast casino bonus",
    "free download crack keygen serial",
    "hot singles in your area now",
] * 3

N_BUCKETS = 512


def _fit(spark):
    pos = spark.createDataFrame([(t,) for t in REF], "text string")
    neg = spark.createDataFrame([(t,) for t in CRAWL], "text string")
    return train_quality_classifier(
        pos, neg, n_buckets=N_BUCKETS, max_iter=30
    )


def test_separates_planted_corpora_and_gates(spark):
    w, b = _fit(spark)
    assert len(w) == N_BUCKETS
    test = spark.createDataFrame(
        [
            (1, "an article about the history of physics"),
            (2, "buy cheap pills now click here"),
            (3, ""),  # gram-free: margin == intercept exactly
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.m
        for r in test.select(
            "doc_id", quality_score_expr(F.col("text"), w, b).alias("m")
        ).collect()
    }
    assert rows[1] > 0 > rows[2]
    assert rows[3] == b
    kept = {r.doc_id for r in quality_gate(test, w, b).collect()}
    assert kept == {1}
    # raising the threshold only shrinks the kept set
    kept_hi = {
        r.doc_id for r in quality_gate(test, w, b, threshold=rows[1] + 1).collect()
    }
    assert kept_hi < kept or kept_hi == set()


def test_projected_margin_matches_feature_vectors(spark):
    """The collected-weights fold must equal w.x + b computed from the
    training featurization — one contract for train and score."""
    w, b = _fit(spark)
    test = spark.createDataFrame(
        [
            (1, "the history of physics and chemistry"),
            (2, "win free money now"),
            (3, "casino article"),
        ],
        "doc_id long, text string",
    )
    margins = {
        r.doc_id: r.m
        for r in test.select(
            "doc_id", quality_score_expr(F.col("text"), w, b).alias("m")
        ).collect()
    }
    vecs = {
        r.doc_id: r.features.toArray()
        for r in gram_count_vectors(test, n_buckets=N_BUCKETS).collect()
    }
    wv = np.array(w)
    for i, x in vecs.items():
        assert abs(margins[i] - (float(wv @ x) + b)) < 1e-9, i


def test_scoring_plan_is_map_only(spark):
    w, b = [0.0] * N_BUCKETS, 0.5
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = (
        df.select(quality_score_expr(F.col("text"), w, b).alias("m"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    nodes = re.findall(r"^\(\d+\) (\S+)", plan, re.M)
    assert sum(1 for n in nodes if n == "Exchange") == 0
    assert not any("Join" in n or "Aggregate" in n for n in nodes)


def test_training_is_deterministic(spark):
    w1, b1 = _fit(spark)
    w2, b2 = _fit(spark)
    assert b1 == b2
    assert np.allclose(w1, w2, rtol=0, atol=0)


def test_gram_free_docs_featurize_as_zero_vectors(spark):
    """Empty / punctuation-only documents must NOT vanish from the
    featurization (the explode would drop them): they come back as
    all-zero vectors, so training class balance is preserved."""
    docs = spark.createDataFrame(
        [(1, "real text here"), (2, ""), (3, "!!! ..."), (4, None)],
        "doc_id long, text string",
    )
    vecs = {
        r.doc_id: r.features.toArray()
        for r in gram_count_vectors(docs, n_buckets=64).collect()
    }
    assert set(vecs) == {1, 2, 3, 4}
    assert vecs[1].sum() > 0
    for i in (2, 3, 4):
        assert vecs[i].sum() == 0.0, i


def test_gram_free_docs_keep_training_class_balance(spark):
    """Round-9 ADVICE regression pin, training-set level: gram-free
    docs must survive into the SET HANDED TO MLlib (as zero vectors),
    not merely the featurization. Train with a negative class made
    ENTIRELY of gram-free docs — on the pre-fix code (a plain explode
    dropping gram-less rows) this degenerates to single-class training
    and the intercept runs positive toward the lone class; post-fix the
    intercept is exactly the empty-doc margin, which must be negative
    (the empty docs ARE the negative class and separable from the
    reference texts only through the intercept)."""
    pos = spark.createDataFrame([(t,) for t in REF], "text string")
    neg = spark.createDataFrame(
        [("",), ("!!! ...",), (None,), ("??",), ("...",), ("—",)],
        "text string",
    )
    w, b = train_quality_classifier(pos, neg, n_buckets=64, max_iter=20)
    assert b < 0


def test_carry_cols_ride_through_featurization(spark):
    """carry_cols (the training label) must come through the groupBys
    attached to the right row — no join back, no misalignment."""
    docs = spark.createDataFrame(
        [(1, "good text", 1.0), (2, "spam spam", 0.0), (3, "", 0.0)],
        "doc_id long, text string, label double",
    )
    out = gram_count_vectors(docs, carry_cols=("label",), n_buckets=64)
    assert out.columns == ["doc_id", "label", "features"]
    got = {r.doc_id: r.label for r in out.collect()}
    assert got == {1: 1.0, 2: 0.0, 3: 0.0}


def test_training_plan_has_no_self_join(spark):
    """The feats+labels DataFrame handed to MLlib must contain no join:
    the label is carried through the aggregates, immune to
    monotonically_increasing_id recomputation divergence."""
    from bigdata_cookbook_spark.ml.quality_classifier import (
        gram_count_vectors as gcv,
    )

    pos = spark.createDataFrame([(t,) for t in REF], "text string")
    neg = spark.createDataFrame([(t,) for t in CRAWL], "text string")
    both = pos.select(F.lit(1.0).alias("label"), "text").unionByName(
        neg.select(F.lit(0.0).alias("label"), "text")
    ).withColumn("__row_id", F.monotonically_increasing_id())
    feats = gcv(both, "text", "__row_id", 64, carry_cols=("label",))
    plan = feats._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    nodes = re.findall(r"^\(\d+\) (\S+)", plan, re.M)
    assert not any("Join" in n for n in nodes)
