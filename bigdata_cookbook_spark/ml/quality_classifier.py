"""fastText-style quality classifier — the learned complement of the
rule-based quality tier.

The CCNet / GPT-3 / LLaMA data pipelines all gate web text with a
lightweight linear classifier trained to separate a trusted reference
corpus (Wikipedia, books) from raw crawl (Wenzek et al. 2020 "CCNet"
§4.3; Brown et al. 2020 appendix A). This module is that stage on
Spark: logistic regression over the SAME hashed unigram+bigram features
the DSIR selector uses (operators/selection.py — one feature contract
for both data-selection stages), trained with MLlib's distributed
L-BFGS, scored as a pure projection.

Split of labor (the same contract as operators/bpe.py):
- **Featurization** is corpus-scale distributed work: gram explode ->
  per-doc bucket counts -> sparse vectors, one exchange keyed by doc.
- **Training** is MLlib LogisticRegression — JVM-side, distributed
  treeAggregate gradient passes; no Python in the loop.
- **Scoring** does NOT need MLlib's transform (which would drag the
  featurization pipeline along): the fitted model is one dense weight
  vector of length n_buckets (+ intercept). ``quality_score_expr``
  embeds the COLLECTED weights as an array literal — the margin is a
  zero-exchange codegen fold over the gram array, the identical shape
  to selection.dsir_score_expr, map-only at any corpus size.

Unlike the rule tier (Gopher thresholds: engine-portable, oracled) the
trained weights are float L-BFGS output — deterministic for a fixed
seed/partitioning but not engine-reproducible, so this stage is pinned
by behavioral tests (planted separable corpora, margin sanity,
projected == MLlib-transform parity), not a DuckDB oracle: the same
compromise every learned component makes (SURVEY §2.10 note on
ml/lsh.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.selection import (
    gram_array_expr,
    gram_bucket_expr,
)

DEFAULT_N_BUCKETS = 4096


def gram_count_vectors(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: str = "",
    out_col: str = "features",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [carry_cols...,] features) — per-document hashed-gram count
    SparseVectors. One explode + one aggregate keyed by (doc, bucket)
    folded into a map_from_entries per doc; the vector assembly is a
    narrow projection over the aggregated pairs.

    Gram-free documents (empty / punctuation-only text) are KEPT and
    featurize as the all-zero vector: explode_outer emits one NULL-gram
    row for an empty gram array, bucketed to the sentinel -1 which the
    dense fold never reads.

    ``carry_cols`` travel through both groupBys alongside the id —
    exactly-one value per doc (e.g. a training label), so downstream
    never needs a join back to the input (which would be fragile under
    nondeterministic row ids: the two join sides could recompute with
    diverging ids on task retry)."""
    from pyspark.ml.functions import array_to_vector

    carry = [F.col(c) for c in carry_cols]
    grams = docs.select(
        F.col(id_col),
        *carry,
        F.explode_outer(gram_array_expr(F.col(text_col))).alias("gram"),
    ).select(
        id_col,
        *carry,
        F.coalesce(
            gram_bucket_expr(F.col("gram"), n_buckets, salt).cast("int"),
            F.lit(-1),
        ).alias("bucket"),
    )
    counts = grams.groupBy(id_col, *carry_cols, "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    # dense array (n_buckets doubles) per doc via an aggregate fold —
    # fine for classifier-width feature spaces (1e3-1e4); converted to
    # an ML vector for the estimator
    per_doc = counts.groupBy(id_col, *carry_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("cnt")))
        ).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0.0)
        ),
    )
    return per_doc.select(
        id_col, *carry_cols, array_to_vector(dense).alias(out_col)
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: str = "",
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> tuple[list[float], float]:
    """Fit the linear gate: ``positive`` = trusted reference sample,
    ``negative`` = raw-crawl sample. Returns (weights, intercept) —
    n_buckets floats + 1, the whole model, ready for
    ``quality_score_expr``. MLlib LogisticRegression: JVM treeAggregate
    gradients, no Python in the training loop."""
    from pyspark.ml.classification import LogisticRegression

    pos = positive.select(F.lit(1.0).alias("label"), F.col(text_col))
    neg = negative.select(F.lit(0.0).alias("label"), F.col(text_col))
    both = pos.unionByName(neg).withColumn(
        "__row_id", F.monotonically_increasing_id()
    )
    # The label rides THROUGH the featurization groupBys (carry_cols)
    # instead of joining back on __row_id: monotonically_increasing_id
    # is nondeterministic under recomputation, so a feats<->labels
    # self-join could silently misalign labels if the two sides replay
    # with different partitioning (task retry, AQE). Carried together,
    # (row_id, label) always come from the same physical row. Gram-free
    # examples stay in the training set as zero vectors.
    feats = gram_count_vectors(
        both, text_col, "__row_id", n_buckets, salt, carry_cols=("label",)
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    model = lr.fit(feats)
    return list(model.coefficients.toArray()), float(model.intercept)


def quality_score_expr(
    text: Column,
    weights: list[float],
    intercept: float,
    salt: str = "",
) -> Column:
    """Classifier margin (log-odds of "reference-like") as a pure
    Column: sum of per-gram bucket weights + intercept — the identical
    zero-exchange fold as selection.dsir_score_expr, fused into the
    scan. Apply sigmoid downstream if a probability is wanted; the
    margin is monotone in it and threshold rules compose either way."""
    n_buckets = len(weights)
    w = F.array(*[F.lit(float(v)) for v in weights])
    return F.aggregate(
        gram_array_expr(text),
        F.lit(float(intercept)),
        lambda acc, g: acc
        + F.element_at(
            w, (gram_bucket_expr(g, n_buckets, salt) + 1).cast("int")
        ),
    )


def quality_gate(
    docs: DataFrame,
    weights: list[float],
    intercept: float,
    text_col: str = "text",
    threshold: float = 0.0,
    salt: str = "",
    score_col: str = "quality_margin",
) -> DataFrame:
    """Score every document and keep those at or above ``threshold``
    (0.0 = the decision boundary; raise it for higher precision). A
    map-only stage: no shuffle of its own.

    The score expression is anchored with a non-deterministic no-op
    (``monotonically_increasing_id() * 0`` adds exactly 0) so the
    optimizer can neither duplicate the fold into a pushed-down filter
    nor push that filter below a caller's CPU-spread repartition.
    Without the anchor, Catalyst substitutes the fold into the
    predicate and pushes it under the exchange: the whole scoring fold
    then runs at raw-scan parallelism AND a second time in the
    projection above — measured 10.1 s vs 1.2 s at sf1 over a 2-split
    scan spread to 32 cores (round 11; the guide §4.4 duplication, in
    expression form). The anchor changes no value: x + 0 == x for
    every double, and the filter semantics are unchanged."""
    anchor = (F.monotonically_increasing_id() * F.lit(0)).cast("double")
    scored = docs.withColumn(
        score_col,
        quality_score_expr(F.col(text_col), weights, intercept, salt) + anchor,
    )
    return scored.filter(F.col(score_col) >= threshold)
