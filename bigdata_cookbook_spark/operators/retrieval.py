"""Lexical relevance ranking — BM25 over a document corpus.

Upgrades the reference's boolean keyword search (Q2: match/no-match,
reference query_builder.py Keyword/Any) to ranked retrieval: the
standard first-stage ranker in front of embedding rerank (Q1/Q11), and
the lexical half of hybrid search.

Plan shape (scales linearly, no all-pairs anything):
    explode tokens -> filter to query terms   (tiny term set pushed down)
    -> tf per (doc, term): one shuffle keyed by (doc, term)
    -> df per term + corpus stats (N, avgdl): broadcast-sized aggregates
    -> score join (broadcast) -> sum per doc -> top-k window
At 100 TB the only wide shuffle is the tf aggregation, keyed by the
near-unique (doc, term) pair — skew-free by construction. An inverted-
index layout (bucketed on term) removes even that, per plans/layout.py.

Okapi BM25 (Robertson et al.), idf = ln((N - df + 0.5)/(df + 0.5) + 1)
— the Lucene-style floor-free form, positive for every term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import tokens_expr


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Per-document BM25 score against ``query_terms`` (lower-cased,
    whitespace tokenization — swap ``tokens_expr`` for a real analyzer
    when one exists). Documents matching no term are absent (score 0).

    Output: (id_col, score) — feed to a top-k window or join back.
    """
    if not query_terms:
        raise ValueError("bm25_scores requires at least one query term")
    terms = [t.lower() for t in query_terms]

    toks = docs.select(
        id_col, tokens_expr(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size(F.filter("__toks", lambda t: F.length(t) > 0)).alias("__dl"),
        F.explode("__toks").alias("__t"),
    )
    hits = toks.filter(F.col("__t").isin(terms))
    tf = hits.groupBy(id_col, "__t", "__dl").agg(F.count(F.lit(1)).alias("__tf"))

    # corpus stats over ALL docs (not just matching): N and avg doc length
    stats = docs.select(
        F.size(
            F.filter(tokens_expr(F.col(text_col)), lambda t: F.length(t) > 0)
        ).alias("__dl")
    ).agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    df_per_term = tf.groupBy("__t").agg(
        F.countDistinct(id_col).alias("__df")
    )

    scored = (
        tf.join(F.broadcast(df_per_term), "__t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1))
            / (
                F.col("__tf")
                + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("__s"), round_to).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score, ties broken by id (deterministic).

    orderBy().limit(k) plans as TakeOrderedAndProject (per-partition
    top-k + driver merge of k-row heads — no global sort shuffle); the
    rank window then runs over the k surviving rows only."""
    scored = bm25_scores(docs, query_terms, id_col=id_col, text_col=text_col)
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(id_col, "score", "rank")


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): each input is a
    CANDIDATE list (id_col, rank starting at 1 — callers top-k prune
    each ranker first, so the rank windows only ever see bounded
    frames); fused score = sum over lists of 1/(k + rank), absent ->
    contributes 0. The standard way to combine lexical and vector
    rankers without score calibration.

    Output: (id_col, rrf) over the union of candidates.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        part = r.select(id_col, F.col("rank").alias(f"__r{i}"))
        out = part if out is None else out.join(part, id_col, "full_outer")
    contrib = [
        F.coalesce(1.0 / (k + F.col(f"__r{i}")), F.lit(0.0))
        for i in range(len(rankings))
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    return out.select(id_col, F.round(total, round_to).alias("rrf"))
