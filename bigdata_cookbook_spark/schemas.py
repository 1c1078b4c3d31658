"""Explicit StructType schemas for the text-analytics corpus tables.

The reference keeps schemas implicit in pandas (SURVEY.md §1.3); our engine
pins them at operator boundaries. Field sets follow FIXTURES.md §1-5, which
derive from the reference row formats:
- entities dim: AI_Cost_Cutting_Market_Analysis/src/search.py:477-481
- documents:    search.py:470-475, Board_Management_Monitoring/src/tool.py:228-238
- chunks:       search.py:427-448 (offset-annotated mentions), :472 (sentence_id)
- screening:    search.py:403-422 + Election_Monitor/src/search.py:262-264
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENTITY_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("entity_type", StringType(), False),  # COMP/PEOP/PLCE/ORGA/PROD/TOPI/CEPT/SRCE
        StructField("name", StringType(), False),
        StructField("ticker", StringType(), True),
        StructField("sector", StringType(), True),
        StructField("industry", StringType(), True),
        StructField("country", StringType(), True),
    ]
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("document_id", StringType(), False),
        StructField("timestamp_utc", TimestampType(), False),
        StructField("document_type", StringType(), False),  # news/filings/transcripts
        StructField("headline", StringType(), True),
        StructField("source_id", StringType(), True),
        StructField("source_name", StringType(), True),
        StructField("source_rank", IntegerType(), True),
        StructField("url", StringType(), True),
        StructField("fiscal_year", IntegerType(), True),  # null for news
        StructField("reporting_entities", ArrayType(StringType()), True),
    ]
)

MENTION_TYPE = StructType(
    [
        StructField("key", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
    ]
)

CHUNK_SCHEMA = StructType(
    [
        StructField("document_id", StringType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("text", StringType(), True),
        StructField("entities", ArrayType(MENTION_TYPE), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)

ENRICHED_MENTION_TYPE = StructType(
    [
        StructField("key", StringType(), False),
        StructField("name", StringType(), True),
        StructField("ticker", StringType(), True),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
    ]
)

SCREENING_COLUMNS = [
    "timestamp_utc",
    "document_id",
    "sentence_id",
    "headline",
    "entity_id",
    "document_type",
    "is_reporting_entity",
    "entity_name",
    "entity_sector",
    "entity_industry",
    "entity_country",
    "entity_ticker",
    "text",
    "other_entities",
    "entities",
    "masked_text",
    "other_entities_map",
    "topics",
    "topics_type",
]

SCREENING_SCHEMA = StructType(
    [
        StructField("timestamp_utc", TimestampType(), False),
        StructField("document_id", StringType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("headline", StringType(), True),
        StructField("entity_id", StringType(), False),
        StructField("document_type", StringType(), False),
        StructField("is_reporting_entity", BooleanType(), False),
        StructField("entity_name", StringType(), True),
        StructField("entity_sector", StringType(), True),
        StructField("entity_industry", StringType(), True),
        StructField("entity_country", StringType(), True),
        StructField("entity_ticker", StringType(), True),
        StructField("text", StringType(), True),
        StructField("other_entities", StringType(), True),
        StructField("entities", ArrayType(ENRICHED_MENTION_TYPE), True),
        StructField("masked_text", StringType(), True),
        StructField(
            "other_entities_map",
            ArrayType(
                StructType(
                    [
                        StructField("idx", IntegerType(), False),
                        StructField("name", StringType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("topics", ArrayType(StringType()), True),
        StructField("topics_type", ArrayType(StringType()), True),
    ]
)

# Display projection (P1): engine snake_case -> reference Title Case
# (AI_Cost_Cutting_Market_Analysis/src/tool.py:1096-1135)
DISPLAY_RENAMES = {
    "entity_sector": "Sector",
    "entity_industry": "Industry",
    "entity_name": "Company",
    "entity_country": "Country",
    "entity_ticker": "Ticker",
    "timestamp_utc": "Date",
    "headline": "Headline",
    "motivation": "Motivation",
    "masked_text": "Quote",
    "document_id": "Document ID",
}
