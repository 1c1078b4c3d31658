"""S2 normalize + F2/F3 masking tests, incl. the SURVEY §5 property tests:
mask round-trip, explode row accounting, dedup invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.masking import (
    mask_text_expr,
    other_entities_map_expr,
    unmask_text_expr,
)
from bigdata_cookbook_spark.operators.normalize import normalize_screening
from bigdata_cookbook_spark.schemas import SCREENING_COLUMNS
from bigdata_cookbook_spark.sources.fixtures import fixture_frames


@pytest.fixture(scope="module")
def corpus(spark):
    ents, docs, chunks = fixture_frames(spark, n_docs=120, seed=7)
    for df in (ents, docs, chunks):
        df.cache().count()
    return ents, docs, chunks


@pytest.fixture(scope="module")
def screening(spark, corpus):
    ents, docs, chunks = corpus
    df = normalize_screening(docs, chunks, ents, mode="discovery")
    df.cache().count()
    return df


def test_screening_schema(screening):
    assert screening.columns == SCREENING_COLUMNS


def test_screening_pk(screening):
    n = screening.count()
    nd = screening.select("sentence_id", "entity_id").distinct().count()
    assert n == nd and n > 0


def test_discovery_targets_are_comp_mentions(screening, corpus):
    ents, _, _ = corpus
    comp = {r.entity_id for r in ents.filter("entity_type = 'COMP'").collect()}
    ids = {r.entity_id for r in screening.select("entity_id").distinct().collect()}
    assert ids <= comp


def test_masking_placeholders(screening):
    rows = screening.filter(F.size("entities") > 0).select(
        "masked_text", "entity_id", "entities"
    ).limit(50).collect()
    assert rows
    for r in rows:
        target_mentioned = any(e.key == r.entity_id for e in r.entities)
        if target_mentioned:
            assert "Target Company" in r.masked_text
        # no raw target name survives where a mention existed
        for e in r.entities:
            if e.key == r.entity_id and e.name:
                assert e.name not in r.masked_text


def test_mask_unmask_roundtrip(spark, screening):
    """unmask(mask(text)) == text for rows whose placeholders are absent
    from the original text (always true for fixtures)."""
    df = screening.select(
        "text",
        "masked_text",
        "entity_name",
        "other_entities_map",
        unmask_text_expr(
            F.col("masked_text"), F.col("other_entities_map"), F.col("entity_name")
        ).alias("restored"),
    )
    bad = df.filter(F.col("restored") != F.col("text"))
    assert bad.count() == 0, bad.limit(5).collect()


def test_mask_explicit_offsets(spark):
    """Hand-built rows pin exact splice behavior incl. per-entity stable
    counter and repeated mentions."""
    from bigdata_cookbook_spark.schemas import ENRICHED_MENTION_TYPE

    text = "Acme beat Beta while Acme also sued Gamma"
    #       0123456789...
    ents = [
        ("E1", "Acme", "T1", 0, 4),
        ("E2", "Beta", "T2", 10, 14),
        ("E1", "Acme", "T1", 21, 25),
        ("E3", "Gamma", "T3", 36, 41),
    ]
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("text", StringType()),
            StructField("entities", ArrayType(ENRICHED_MENTION_TYPE)),
            StructField("target", StringType()),
        ]
    )
    df = spark.createDataFrame([(text, ents, "E1")], schema)
    out = df.select(
        mask_text_expr(F.col("text"), F.col("entities"), F.col("target")).alias("m"),
        other_entities_map_expr(F.col("entities"), F.col("target")).alias("omap"),
    ).collect()[0]
    assert out.m == (
        "Target Company beat Other Company_1 while Target Company also sued Other Company_2"
    )
    assert [(m.idx, m.name) for m in out.omap] == [(1, "Beta"), (2, "Gamma")]


def test_reporting_mode(corpus):
    ents, docs, chunks = corpus
    rep = normalize_screening(docs, chunks, ents, mode="reporting")
    assert rep.filter(~F.col("document_type").isin("filings", "transcripts")).count() == 0
    assert rep.filter(~F.col("is_reporting_entity")).count() == 0
    assert rep.count() > 0


def test_watchlist_mode(corpus, screening):
    ents, docs, chunks = corpus
    some = [r.entity_id for r in screening.select("entity_id").distinct().limit(3).collect()]
    wl = normalize_screening(docs, chunks, ents, mode="watchlist", watchlist=some)
    got = {r.entity_id for r in wl.select("entity_id").distinct().collect()}
    assert got <= set(some) and wl.count() > 0


def test_brace_stripping(screening):
    assert screening.filter(F.col("text").contains("{")).count() == 0
    assert screening.filter(F.col("masked_text").contains("{")).count() == 0


def test_topics_cover_all_mention_types(screening):
    r = screening.filter(F.size("topics") > 2).limit(1).collect()
    assert r and len(r[0].topics) == len(r[0].topics_type)
