"""End-to-end corpus cleaning (training-data pipeline capstone).

The canonical pre-training data flow over a raw document corpus:

    quality filter  ->  exact dedup  ->  near-dup removal

composed from the engine's own tiers (functions/text.py quality exprs,
hash-group exact dedup, inverted-index n-gram Jaccard — swap in
minhash_lsh_candidates as the candidate generator at 100 TB). Every
stage keeps its drop set, so the pipeline reports WHAT it removed and
why — the property a production data pipeline is audited on.

Determinism: survivors of an exact-dup group = min doc_id; of a near-dup
pair = the smaller doc_id (greedy on the pair list; pairs are symmetric
and the relation is applied as "drop any doc that is the larger side of
any pair", which over-drops chains slightly but is order-independent —
declared engine semantics, same in the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import quality_exprs
from bigdata_cookbook_spark.operators.dedup import ngram_jaccard_pairs


def corpus_clean(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.8,
    jaccard_threshold: float = 0.5,
) -> dict[str, DataFrame]:
    """Returns {kept, dropped_quality, dropped_exact, dropped_neardup}.

    kept = quality-passing, exact-canonical, near-dup-free documents.
    """
    feats = quality_exprs(F.col("text"))
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        feats["n_tokens"].alias("n_tokens"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )
    quality_ok = (
        (F.col("lang") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    passed = scored.filter(quality_ok)
    dropped_quality = scored.filter(~quality_ok).select("doc_id")

    canon = passed.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    exact_kept = passed.join(canon.select("doc_id"), "doc_id", "left_semi")
    dropped_exact = passed.join(canon.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id"
    )

    pairs = ngram_jaccard_pairs(exact_kept, threshold=jaccard_threshold)
    near_losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = exact_kept.join(near_losers, "doc_id", "left_anti")
    return {
        "kept": kept.select("doc_id", "lang", "source", "n_tokens"),
        "dropped_quality": dropped_quality,
        "dropped_exact": dropped_exact,
        "dropped_neardup": near_losers,
    }
