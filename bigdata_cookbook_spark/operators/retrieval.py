"""Lexical relevance ranking — BM25 over a document corpus.

Upgrades the reference's boolean keyword search (Q2: match/no-match,
reference query_builder.py Keyword/Any) to ranked retrieval: the
standard first-stage ranker in front of embedding rerank (Q1/Q11), and
the lexical half of hybrid search.

Plan shape (round 3 — two shuffles total, no recomputed aggregates;
round 11 — tokenize ONCE, period):
    scan -> tokenize ONCE -> per-term tf as column expressions
      (the query term set is a small literal, so tf_t is
       size(toks) - size(array_remove(toks, t)) — a narrow projection;
       no explode, no shuffle keyed by (doc, term) at all)
    -> lazy localCheckpoint of that NARROW table (id, dl, tf0..tfk —
       a few ints/doc, guide §8's "decision pass over small rows")
    -> corpus+term stats (N, avgdl, df per term) in ONE single-row
       conditional aggregate, broadcast back            [Exchange 1]
    -> hits explode (bounded: matching docs x |terms|) -> score
    -> sum per doc                                      [Exchange 2]
The earlier design aggregated tf per (doc, term) and then aggregated
that again for df — Catalyst recomputed the whole explode+shuffle
subtree for the second aggregate (8 exchanges measured). Expressing tf
as per-term columns removes both shuffles. Round 11 closes the last
duplicated work: the tokenize projection fed BOTH the stats aggregate
(through the broadcast build job) and the hits path, so every corpus
byte was read and analyzed twice. The narrow tf table is now
materialized once (localCheckpoint, lazy — no job until the first
action; same pattern as corpus.py's candidate list): at 100 TB this
trades ~tens of bytes/doc of executor storage for a full second
read+tokenize of the corpus. Non-fault-tolerant like every
localCheckpoint — a lost executor re-fails the query; acceptable for
a two-job query, same trade the CC fixpoint documents.
At 100 TB the wide operations are: one tiny single-row aggregate and
one sum keyed by doc id — both map-side combined and skew-free. An
inverted-index layout (bucketed on term) is the next tier, per
plans/layout.py.

Okapi BM25 (Robertson et al.), idf = ln((N - df + 0.5)/(df + 0.5) + 1)
— the Lucene-style floor-free form, positive for every term.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import (
    analyzer_tokens_expr,
    analyzer_tokens_jvm,
)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    tokenize=analyzer_tokens_expr,
    tokenize_query=None,
) -> DataFrame:
    """Per-document BM25 score against ``query_terms``. Documents and
    query terms go through the SAME analyzer (``tokenize``, default
    ``analyzer_tokens_expr``: case-fold + split on non-alphanumeric
    runs — "Spark," and "spark" are one term; a multi-word query term
    like "state-of-the-art" contributes each of its analyzed words).
    Documents matching no term are absent (score 0).

    A custom ``tokenize`` (document side, Column -> array Column) MUST
    come with its Python twin ``tokenize_query`` (str -> list[str]) —
    tf is exact term equality against the analyzed document array, so
    mismatched analyzers silently score every document 0. Enforced
    with a ValueError rather than inherited silently.

    Output: (id_col, score) — feed to a top-k window or join back.
    """
    if not query_terms:
        raise ValueError("bm25_scores requires at least one query term")
    if tokenize is not analyzer_tokens_expr and tokenize_query is None:
        raise ValueError(
            "custom document tokenize= requires its Python twin "
            "tokenize_query= (str -> list[str]); the query side would "
            "otherwise be analyzed differently and every tf comparison "
            "silently miss"
        )
    if tokenize_query is not None:
        token_lists = [tokenize_query(t) for t in query_terms]
    else:
        # analyze the query with the SAME JVM expression the document
        # side uses — one driver-local job over |query_terms| rows, so
        # both sides share one Unicode table by construction (the
        # Python twin's tables can differ on post-Unicode-13
        # codepoints; see functions/text.py analyzer_tokens_py)
        token_lists = analyzer_tokens_jvm(docs.sparkSession, query_terms)
    # dedup preserving order: duplicate query terms contribute once
    terms = list(dict.fromkeys(w for toks in token_lists for w in toks))
    if not terms:
        raise ValueError("query_terms contain no alphanumeric tokens")

    # tokenize once; tf per term = size delta under array_remove — a
    # plain collection expression (vectorized), not a lambda HOF, so it
    # stays on the codegen fast path (see functions/text.py notes on
    # interpreted HOF pitfalls). __toks is bound by the first select so
    # downstream expressions reference one materialized array.
    base = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("__dl"),
        *[
            (F.size("__toks") - F.size(F.array_remove("__toks", t))).alias(
                f"__tf{i}"
            )
            for i, t in enumerate(terms)
        ],
    )
    # materialize the narrow tf table ONCE (lazy: the stats broadcast
    # build is the first action and pays it); without this the tokenize
    # pass above re-executes for the hits branch — two full corpus
    # reads for one query (module docstring, round-11 change)
    base = base.localCheckpoint(eager=False)

    # one single-row aggregate carries the corpus stats (N, avgdl) AND
    # the per-term document frequencies — broadcast back to the hits
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.count(F.when(F.col(f"__tf{i}") > 0, True)).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    any_hit = reduce(
        lambda a, c: a | c, [F.col(f"__tf{i}") > 0 for i in range(len(terms))]
    )
    hits = (
        base.filter(any_hit)
        .select(
            id_col,
            "__dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("__ti"),
                            F.col(f"__tf{i}").alias("__tf"),
                        )
                        for i in range(len(terms))
                    ]
                )
            ).alias("__p"),
        )
        .select(id_col, "__dl", F.col("__p.__ti").alias("__ti"), F.col("__p.__tf").alias("__tf"))
        .filter(F.col("__tf") > 0)
    )

    # map the exploded term index to its broadcast df via a literal CASE
    df_col = reduce(
        lambda acc, i: acc.when(F.col("__ti") == i, F.col(f"__df{i}")),
        range(1, len(terms)),
        F.when(F.col("__ti") == 0, F.col("__df0")),
    )
    scored = (
        hits.crossJoin(F.broadcast(stats))
        .withColumn("__df", df_col)
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
    tokenize=analyzer_tokens_expr,
    tokenize_query=None,
) -> DataFrame:
    """Top-k documents by BM25 score, ties broken by id (deterministic).

    orderBy().limit(k) plans as TakeOrderedAndProject (per-partition
    top-k + driver merge of k-row heads — no global sort shuffle); its
    output partitioning is a single partition, so the rank window runs
    over the k surviving rows with no further exchange."""
    scored = bm25_scores(
        docs,
        query_terms,
        id_col=id_col,
        text_col=text_col,
        tokenize=tokenize,
        tokenize_query=tokenize_query,
    )
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

    Round 3: fused as union-all + one tiny groupBy sum instead of a
    chain of full-outer joins — the join chain planned as SortMergeJoin
    (full outer is not broadcastable) with two sort exchanges per pair;
    the union form is one map-side-combined aggregate over <= sum of
    candidate-list sizes, and generalizes to any number of rankers.

    Output: (id_col, rrf) over the union of candidates.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    parts = [
        r.select(F.col(id_col), (1.0 / (k + F.col("rank"))).alias("__c"))
        for r in rankings
    ]
    allc = reduce(lambda a, b: a.unionByName(b), parts)
    return allc.groupBy(id_col).agg(F.round(F.sum("__c"), round_to).alias("rrf"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
    tokenize=analyzer_tokens_expr,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF — the standard
    per-document keyword extraction (reference analogue: the keyword /
    theme surfacing in Tracking_Inflation_Drivers/src/token_manager.py
    and the Election monitor's topic summaries, which rank raw counts;
    IDF weighting is the extension that makes the ranking corpus-aware).

    score = tf * (ln((N + 1) / (df + 1)) + 1), rounded to ``round_to``
    (sklearn's smooth-idf formula — public knowledge; deterministic
    across engines because tf/N/df are exact integers and the rounding
    is pinned). Ties broken by term ascending, so top-k is total-ordered.

    Output: (id_col, term, rank, tf, score), rank 1..k per document.
    Documents with no analyzed tokens emit no rows.

    Scale shape: explode -> groupBy (doc, term) [map-side combine does
    the tf counting before the shuffle] -> df per term via a SECOND
    groupBy on term over the already-collapsed (doc, term) pairs (far
    smaller than the raw token stream) -> sort-merge join back on term
    (vocabulary scales with the corpus, so no broadcast assumption) ->
    corpus N from a one-row broadcast aggregate -> per-doc top-k window.
    Every shuffle key (term, doc) is high-cardinality; natural-language
    term skew ("the") is absorbed by the map-side combines on both
    groupBys — the join sees each term once per document, and AQE
    handles residual join skew.

    Round 11 (measured, left alone): a spread_for_cpu_bound on the
    tokenize+explode side was A/B-tested at sf1 — 3.02 s unspread vs
    3.19 s spread (paired min-of-4) — a wash, because the (doc, term)
    exchange and the term join dominate, not the analyzer battery; the
    spread's raw-text exchange buys nothing here. Kept unspread.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # round 11: tf feeds TWO consumers (the df aggregate and the join's
    # left side) and ReuseExchange cannot dedupe them — the optimizer
    # prunes tf's count from the df branch, turning its pre-shuffle
    # aggregate into a bare distinct, so the two exchange subtrees
    # canonicalize differently and the tokenize+explode corpus pass ran
    # twice. Materialize the collapsed (doc, term, tf) table once
    # (lazy localCheckpoint — the same two-consumer fix as bm25_scores;
    # ~50x smaller than the raw token stream). Measured 2.26 -> 1.26 s
    # at sf1 (fresh DataFrame per rep, checkpoint re-materialized each
    # run); plan drops from 3 corpus scans to 1 + a column-pruned
    # count scan.
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n") + F.lit(1.0))
                        / (F.col("__df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "rank", "tf", "score")
    )
