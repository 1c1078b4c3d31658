"""MLlib scale paths for dedup and similarity search.

The hand-rolled relational implementations (operators/dedup.py — exact
MinHash banding with a SQL oracle) pin correctness; these MLlib pipelines
are the 100 TB execution path: JVM-side hashing, fixed-seed LSH, and
approxSimilarityJoin's bucketed join instead of an n^2 self-join.

- minhash_neardup_ml: RegexTokenizer -> NGram(shingles) -> HashingTF ->
  MinHashLSH.approxSimilarityJoin on Jaccard distance.
- embedding_ann_brp: BucketedRandomProjectionLSH over the embedding
  column for approximate nearest neighbors in Euclidean space (for
  normalized vectors Euclidean rank order == cosine rank order).
- text_feature_pipeline: Tokenizer -> HashingTF -> IDF feature extraction
  (the ML-preprocessing front door for downstream MLlib models).

All seeds fixed; determinism tested in tests/test_ml_lsh.py.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
    NGram,
    RegexTokenizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED_FEATURES = 1 << 18  # hashing-trick width for shingle sets


def minhash_neardup_ml(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, jaccard_distance) with Jaccard
    distance <= 1 - jaccard_threshold via MinHashLSH bucketed join."""
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+", toLowercase=True
            ),
            NGram(n=shingle_n, inputCol="__toks", outputCol="__shingles"),
            HashingTF(
                inputCol="__shingles",
                outputCol="__features",
                numFeatures=SEED_FEATURES,
                binary=True,  # set semantics: presence, not counts
            ),
        ]
    )
    base = docs.select(id_col, text_col).filter(
        F.length(F.trim(F.col(text_col))) > 0
    )
    feats = pipe.fit(base).transform(base)
    # MinHashLSH requires at least one non-zero feature
    feats = feats.filter(F.expr("size(__shingles) > 0"))
    mh = MinHashLSH(
        inputCol="__features", outputCol="__hashes", numHashTables=num_hash_tables, seed=123
    ).fit(feats)
    pairs = mh.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
    )


def embedding_ann_brp(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
):
    """Approximate k-nearest-neighbors of one vector via
    BucketedRandomProjectionLSH (Euclidean). Returns (vec_id, distCol)."""
    vecs = embeddings.select(
        id_col, array_to_vector(F.col(emb_col).cast("array<double>")).alias("__vec")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="__vec",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=123,
    ).fit(vecs)
    q = vecs.filter(F.col(id_col) == query_vec_id).head()
    if q is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    nn = model.approxNearestNeighbors(
        vecs.filter(F.col(id_col) != query_vec_id), q["__vec"], k
    )
    return nn.select(id_col, F.round("distCol", 4).alias("dist"))


def text_feature_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 16,
) -> tuple[PipelineModel, DataFrame]:
    """Tokenizer -> HashingTF -> IDF; returns (fitted model, transformed
    frame with a 'features' vector column) — the standard MLlib feature
    front-end for classifiers/clustering over the corpus."""
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\W+", toLowercase=True
            ),
            HashingTF(inputCol="__toks", outputCol="__tf", numFeatures=num_features),
            IDF(inputCol="__tf", outputCol="features"),
        ]
    )
    model = pipe.fit(docs)
    return model, model.transform(docs)
