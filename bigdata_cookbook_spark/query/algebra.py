"""Query predicate algebra (SURVEY.md §2.2, Q1-Q11).

Reference: Election_Monitor/src/query_builder.py (md5-identical copy in
Tracking_Inflation_Drivers) — a boolean AND/OR algebra over keyword,
entity, reporting-entity, source, fiscal-year and similarity components,
expanded over date ranges (:374-408, :410-517).

Here each component compiles to a Catalyst Column predicate over the
unified chunk frame (chunks joined to their document header), so filters
push down to the parquet scan and Catalyst folds the boolean tree. The
remote-API concerns (entity batching Q7, fan-out sizing Q8) disappear:
Spark evaluates the whole watchlist in one pass.

Similarity (Q1) scores cosine against a deterministic hashing-trick
sentence embedding (same family the fixtures use) — the embedding model is
engine-defined, pluggable; rerank_threshold and per-query document_limit
(Q11) map to a score cut + top-k window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_cookbook_spark.sources.fixtures import _embedding


class Predicate:
    """Compiles to a boolean Column over the unified chunk frame."""

    def to_column(self) -> Column:
        raise NotImplementedError


@dataclass
class Keyword(Predicate):
    """Q2: exact keyword containment in chunk text."""

    word: str

    def to_column(self) -> Column:
        return F.col("text").contains(self.word)


@dataclass
class Entity(Predicate):
    """Q3 (chunk scope): entity mentioned in the chunk."""

    entity_id: str

    def to_column(self) -> Column:
        return F.exists(F.col("entities"), lambda e: e["key"] == F.lit(self.entity_id))


@dataclass
class ReportingEntity(Predicate):
    """Q3 (document scope): document filed/reported by the entity."""

    entity_id: str

    def to_column(self) -> Column:
        return F.array_contains(F.col("reporting_entities"), self.entity_id)


@dataclass
class Source(Predicate):
    """Q4: source whitelist."""

    source_ids: tuple[str, ...]

    def __init__(self, *source_ids: str):
        self.source_ids = tuple(source_ids)

    def to_column(self) -> Column:
        return F.col("source_id").isin(*self.source_ids)


@dataclass
class FiscalYear(Predicate):
    """Q5: fiscal-year equality (filings/transcripts)."""

    year: int

    def to_column(self) -> Column:
        return F.col("fiscal_year") == self.year


@dataclass
class DateRange(Predicate):
    """Q9: inclusive start / exclusive end on timestamp_utc. At scale this
    prunes date partitions before the scan."""

    start: str
    end: str

    def to_column(self) -> Column:
        return (F.col("timestamp_utc") >= F.lit(self.start).cast("timestamp")) & (
            F.col("timestamp_utc") < F.lit(self.end).cast("timestamp")
        )


@dataclass
class Any(Predicate):
    """OR of sub-predicates (query_builder.py Any)."""

    preds: tuple[Predicate, ...]

    def __init__(self, *preds: Predicate):
        self.preds = tuple(preds)

    def to_column(self) -> Column:
        out = F.lit(False)
        for p in self.preds:
            out = out | p.to_column()
        return out


@dataclass
class All(Predicate):
    """AND of sub-predicates (query_builder.py &-chaining)."""

    preds: tuple[Predicate, ...]

    def __init__(self, *preds: Predicate):
        self.preds = tuple(preds)

    def to_column(self) -> Column:
        out = F.lit(True)
        for p in self.preds:
            out = out & p.to_column()
        return out


@dataclass
class Not(Predicate):
    pred: Predicate

    def to_column(self) -> Column:
        return ~self.pred.to_column()


@dataclass
class PersonVariations(Predicate):
    """Q10: person-name variation query (reference
    Board_Management_Monitoring/src/tool.py:73-159) — OR over name
    variants matched in text, optionally ANDed with a company entity
    mention ("strict" mode). Variant matching is word-boundary rlike so
    'Ann Lee' doesn't hit 'Annabelle Leeds'."""

    variations: tuple[str, ...]
    strict_company_id: str | None = None

    def __init__(self, *variations: str, strict_company_id: str | None = None):
        self.variations = tuple(variations)
        self.strict_company_id = strict_company_id

    def to_column(self) -> Column:
        import re as _re

        pattern = "(?i)\\b(" + "|".join(_re.escape(v) for v in self.variations) + ")\\b"
        col = F.col("text").rlike(pattern)
        if self.strict_company_id is not None:
            col = col & Entity(self.strict_company_id).to_column()
        return col


@dataclass
class Similarity:
    """Q1: embedding cosine similarity of chunk text vs a query sentence.

    Not a boolean predicate — contributes the relevance score used by
    sort/rerank (Q11). Cosine is computed JVM-side over the embedding
    column against a broadcast-literal query vector.

    ``embedder`` plugs in the model that embeds the QUERY sentence
    (signature ``(text, dim) -> list[float]``): None = the deterministic
    hashing-trick stub — the test tier, matching the fixture corpus's
    precomputed column. A live model (llm/embedding_backend.
    make_openai_embedding_backend) slots in as
    ``embedder=lambda t, d: backend([t])[0]`` — and the corpus-side
    column it must pair with comes from embedding_backend.embed_stage
    with the same backend. Query-side embedding happens ONCE at plan
    build (driver-side, one string), never per row.
    """

    sentence: str
    dim: int = 16
    embedder: object = None

    def score_column(self) -> Column:
        embed = self.embedder if self.embedder is not None else _embedding
        q = embed(self.sentence, self.dim)
        qcol = F.array(*[F.lit(float(v)) for v in q])
        e = F.col("embedding").cast("array<double>")
        dot = F.aggregate(
            F.zip_with(e, qcol, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        norm = F.sqrt(
            F.aggregate(F.zip_with(e, e, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        )
        qnorm = sum(v * v for v in q) ** 0.5 or 1.0
        return F.when(norm == 0, F.lit(0.0)).otherwise(dot / (norm * F.lit(qnorm)))


@dataclass
class QuerySpec:
    """One executable query: optional similarity + boolean filters +
    rerank/limit (Q8 conjunction, Q11 sort/limit semantics)."""

    query_id: str
    similarity: Similarity | None = None
    filters: tuple[Predicate, ...] = field(default_factory=tuple)
    rerank_threshold: float | None = None
    document_limit: int | None = None


def unified_chunk_frame(documents: DataFrame, chunks: DataFrame) -> DataFrame:
    """chunks ⋈ document header — the frame the algebra compiles against."""
    return chunks.join(
        documents.select(
            "document_id",
            "timestamp_utc",
            "document_type",
            "headline",
            "source_id",
            "fiscal_year",
            "reporting_entities",
        ),
        "document_id",
    )


def run_search(frame: DataFrame, specs: list[QuerySpec]) -> DataFrame:
    """Execute query specs against the unified chunk frame; returns hits
    tagged with query_id (explicit provenance — the reference relies on
    positional result order, Board tool.py:262-274, a quirk we drop).

    Each spec contributes one filtered branch; branches union. Per-query
    top-k is a row_number window over the relevance score (Q11); the
    boolean filters push into the scan of each branch.
    """
    if not specs:
        raise ValueError("run_search requires at least one QuerySpec")
    branches = []
    for spec in specs:
        b = frame
        for p in spec.filters:
            b = b.filter(p.to_column())
        if spec.similarity is not None:
            b = b.withColumn("relevance", F.round(spec.similarity.score_column(), 6))
            if spec.rerank_threshold is not None:
                b = b.filter(F.col("relevance") >= spec.rerank_threshold)
        else:
            b = b.withColumn("relevance", F.lit(1.0))
        b = b.withColumn("query_id", F.lit(spec.query_id))
        if spec.document_limit is not None:
            w = Window.partitionBy("query_id").orderBy(
                F.col("relevance").desc(), F.col("sentence_id").asc()
            )
            b = (
                b.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= spec.document_limit)
                .drop("__rn")
            )
        branches.append(b)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
