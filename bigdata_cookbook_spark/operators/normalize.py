"""S2 — chunk explode / screening-row normalization.

Reference: AI_Cost_Cutting_Market_Analysis/src/search.py:383-569 (three
modes: reporting-entity, open discovery, watchlist filter), Election
variant topics columns Election_Monitor/src/search.py:262-264,297-309, and
the open-discovery transcript fallback :356-395.

Spark plan shape (scale notes):
- mentions enriched via explode -> broadcast join on the entity dim ->
  re-collect per chunk (one shuffle on sentence_id);
- target fan-out is an explode of per-chunk target keys (no join);
- the target-attribute join is another broadcast against the entity dim;
- final dedup is a window-free dropDuplicates on (sentence_id, entity_id)
  (search.py:572-574).
At 100 TB: chunks are date-partitioned; the entity dim broadcasts (MBs);
the only wide shuffle is the per-chunk re-collect, whose key (sentence_id)
is near-unique so AQE skew handling is moot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.masking import (
    mask_text_expr,
    other_entities_map_expr,
    sort_mentions_by_start,
    strip_braces,
)
from bigdata_cookbook_spark.schemas import SCREENING_COLUMNS

MODES = ("discovery", "reporting", "watchlist")


def enrich_mentions(chunks: DataFrame, entities_dim: DataFrame) -> DataFrame:
    """chunks + entities array<struct<key,start,end>> ->
    enriched array<struct<key,name,ticker,start,end>> + topics arrays."""
    m = chunks.select(
        "document_id",
        "chunk_idx",
        "sentence_id",
        "text",
        F.explode_outer("entities").alias("e"),
    )
    dim = F.broadcast(
        entities_dim.select(
            F.col("entity_id").alias("__eid"),
            F.col("name").alias("__name"),
            F.col("ticker").alias("__ticker"),
            F.col("entity_type").alias("__etype"),
        )
    )
    joined = m.join(dim, m["e.key"] == F.col("__eid"), "left")
    collected = joined.groupBy("document_id", "chunk_idx", "sentence_id", "text").agg(
        F.collect_list(
            F.when(
                F.col("e").isNotNull(),
                F.struct(
                    F.col("e.key").alias("key"),
                    F.col("__name").alias("name"),
                    F.col("__ticker").alias("ticker"),
                    F.col("e.start").alias("start"),
                    F.col("e.end").alias("end"),
                    F.col("__etype").alias("etype"),
                ),
            )
        ).alias("mentions_raw")
    )
    sorted_m = sort_mentions_by_start(F.col("mentions_raw"))
    return collected.select(
        "document_id",
        "chunk_idx",
        "sentence_id",
        "text",
        F.transform(
            sorted_m,
            lambda e: F.struct(
                e["key"].alias("key"),
                e["name"].alias("name"),
                e["ticker"].alias("ticker"),
                e["start"].alias("start"),
                e["end"].alias("end"),
            ),
        ).alias("mentions"),
        F.transform(sorted_m, lambda e: e["name"]).alias("topics"),
        F.transform(sorted_m, lambda e: e["etype"]).alias("topics_type"),
        F.transform(
            F.filter(sorted_m, lambda e: e["etype"] == "COMP"), lambda e: e["key"]
        ).alias("comp_keys"),
    )


def normalize_screening(
    documents: DataFrame,
    chunks: DataFrame,
    entities_dim: DataFrame,
    mode: str = "discovery",
    watchlist: Sequence[str] | None = None,
) -> DataFrame:
    """Document+chunk tables -> one screening row per (chunk × target
    entity). See module docstring for the three modes."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    if mode == "watchlist" and not watchlist:
        raise ValueError("watchlist mode requires a non-empty watchlist")

    enriched = enrich_mentions(chunks, entities_dim)
    docs = documents.select(
        "document_id",
        "timestamp_utc",
        "document_type",
        "headline",
        "reporting_entities",
    )
    base = enriched.join(docs, "document_id")

    if mode == "reporting":
        base = base.filter(F.col("document_type").isin("filings", "transcripts"))
        targets = F.col("reporting_entities")
    else:
        targets = F.array_distinct(F.col("comp_keys"))
        if mode == "watchlist":
            wl = F.array([F.lit(w) for w in watchlist])
            targets = F.filter(targets, lambda k: F.array_contains(wl, k))

    fanned = base.withColumn("entity_id", F.explode(targets))

    dim = F.broadcast(
        entities_dim.select(
            F.col("entity_id").alias("__tid"),
            F.col("name").alias("entity_name"),
            F.col("sector").alias("entity_sector"),
            F.col("industry").alias("entity_industry"),
            F.col("country").alias("entity_country"),
            F.col("ticker").alias("entity_ticker"),
        )
    )
    with_attrs = fanned.join(dim, fanned["entity_id"] == F.col("__tid"), "left").drop("__tid")

    target = F.col("entity_id")
    mentions = F.col("mentions")
    other_names = F.array_distinct(
        F.transform(
            F.filter(mentions, lambda e: e["key"] != target), lambda e: e["name"]
        )
    )
    out = with_attrs.select(
        "timestamp_utc",
        "document_id",
        "sentence_id",
        "headline",
        "entity_id",
        "document_type",
        F.coalesce(
            F.array_contains(F.col("reporting_entities"), target), F.lit(False)
        ).alias("is_reporting_entity"),
        "entity_name",
        "entity_sector",
        "entity_industry",
        "entity_country",
        "entity_ticker",
        # aliased as text_clean (not text): lateral-column-alias resolution
        # would otherwise rebind the mask expression's text references to
        # the stripped value while mention offsets index the raw text
        strip_braces(F.col("text")).alias("text_clean"),
        F.array_join(other_names, ", ").alias("other_entities"),
        mentions.alias("entities"),
        strip_braces(mask_text_expr(F.col("text"), mentions, target)).alias("masked_text"),
        other_entities_map_expr(mentions, target).alias("other_entities_map"),
        "topics",
        "topics_type",
    )
    out = out.withColumnRenamed("text_clean", "text")
    return out.dropDuplicates(["sentence_id", "entity_id"]).select(*SCREENING_COLUMNS)


def doc_level_annotations(chunks: DataFrame, entities_dim: DataFrame) -> DataFrame:
    """S8 — doc-level annotated view (reference
    Board_Management_Monitoring/src/tool.py:183-238): per document, the
    distinct mentioned entity names grouped by entity type into sorted
    comma-joined strings, pivoted to one column per type.

    Plan shape: explode mentions -> broadcast join entity dim -> one
    groupBy(document_id) with conditional collect_sets — a single shuffle
    keyed by document_id (near-unique, skew-free at 100 TB).
    """
    m = chunks.select("document_id", F.explode("entities").alias("e"))
    dim = F.broadcast(
        entities_dim.select(
            F.col("entity_id").alias("__eid"),
            F.col("name").alias("__name"),
            F.col("entity_type").alias("__etype"),
        )
    )
    joined = m.join(dim, m["e.key"] == F.col("__eid"), "inner")

    def names_of(etype: str) -> F.Column:
        return F.array_join(
            F.array_sort(
                F.collect_set(F.when(F.col("__etype") == etype, F.col("__name")))
            ),
            ", ",
        )

    return joined.groupBy("document_id").agg(
        names_of("COMP").alias("companies"),
        names_of("PEOP").alias("people"),
        names_of("TOPI").alias("topics"),
        names_of("PLCE").alias("places"),
        F.countDistinct("__eid").alias("n_entities"),
    )
