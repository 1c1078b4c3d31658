"""Deterministic corpus fixtures (FIXTURES.md §1-3).

Generates entities / documents / chunks tables with seeded randomness so
golden pipeline tests are byte-stable. Entity mentions are inserted into
template text with exact character offsets (valid, non-overlapping), which
is what exercises the masking operator honestly.

Generation happens driver-side (fixture tiers are small) and is parallelized
via spark.createDataFrame; the engine never assumes fixture-scale inputs.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from bigdata_cookbook_spark.schemas import CHUNK_SCHEMA, DOCUMENT_SCHEMA, ENTITY_SCHEMA

SECTORS = ["Tech", "Energy", "Finance", "Health", "Retail", "Industrials"]
INDUSTRIES = {s: [f"{s}-Ind{i}" for i in range(4)] for s in SECTORS}
COUNTRIES = ["US", "DE", "JP", "FR", "GB", "CN"]
ENTITY_TYPES = [("COMP", 60), ("PEOP", 10), ("PLCE", 10), ("TOPI", 10), ("ORGA", 6), ("SRCE", 4)]

TEMPLATES = [
    "quarterly results showed strong momentum in cloud and data platforms",
    "analysts flagged rising input costs and pricing pressure across the sector",
    "the company announced a strategic partnership to expand AI capabilities",
    "regulators opened an inquiry into market practices and data handling",
    "supply chain constraints eased while demand for cooling systems grew",
    "management discussed cost cutting initiatives and automation plans",
]


def _embedding(text: str, dim: int = 16) -> list[float]:
    """Seeded hashing-trick embedding — deterministic, no model needed."""
    vec = [0.0] * dim
    for tok in text.lower().split():
        h = hash_str(tok)
        vec[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
    norm = sum(v * v for v in vec) ** 0.5 or 1.0
    return [round(v / norm, 6) for v in vec]


def hash_str(s: str) -> int:
    """Stable string hash (Python's builtin hash is salted per-process)."""
    h = 2166136261
    for ch in s:
        h = ((h ^ ord(ch)) * 16777619) & 0xFFFFFFFF
    return h


def generate_entities(n: int = 120, seed: int = 7) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    counts = {t: c for t, c in ENTITY_TYPES}
    scale = max(1, n // sum(counts.values()))
    eid = 0
    for etype, base in ENTITY_TYPES:
        for _ in range(base * scale):
            name = f"{etype.title()}{eid:04d}" if etype != "COMP" else f"Company{eid:04d}"
            is_comp = etype == "COMP"
            sector = rng.choice(SECTORS) if is_comp else None
            rows.append(
                (
                    f"E{eid:06d}",
                    etype,
                    name,
                    f"TCK{eid:04d}" if is_comp else None,
                    sector,
                    rng.choice(INDUSTRIES[sector]) if is_comp else None,
                    rng.choice(COUNTRIES),
                )
            )
            eid += 1
    return rows


def generate_corpus(
    n_docs: int = 200,
    seed: int = 7,
    avg_chunks: int = 3,
) -> tuple[list[tuple], list[tuple], list[tuple]]:
    """Returns (entities, documents, chunks) row lists."""
    entities = generate_entities(seed=seed)
    rng = random.Random(seed + 1)
    comp_ids = [e[0] for e in entities if e[1] == "COMP"]
    other_ids = [e[0] for e in entities if e[1] in ("PEOP", "PLCE", "TOPI")]
    src_ids = [e[0] for e in entities if e[1] == "SRCE"]
    name_of = {e[0]: e[2] for e in entities}

    docs, chunks = [], []
    t0 = datetime(2024, 1, 1)
    for d in range(n_docs):
        doc_id = f"D{d:08d}"
        dtype = rng.choices(["news", "filings", "transcripts"], weights=[80, 10, 10])[0]
        ts = t0 + timedelta(minutes=rng.randrange(0, 365 * 24 * 60))
        src = rng.choice(src_ids)
        reporting = rng.sample(comp_ids, k=rng.randint(1, 2)) if dtype != "news" else []
        docs.append(
            (
                doc_id,
                ts,
                dtype,
                f"Headline {d}: {rng.choice(TEMPLATES)[:40]}",
                src,
                name_of[src],
                rng.randint(1, 10),
                f"https://example.com/{doc_id}",
                ts.year if dtype != "news" else None,
                reporting,
            )
        )
        n_chunks = max(1, int(rng.gauss(avg_chunks, 1)))
        for c in range(n_chunks):
            base = rng.choice(TEMPLATES)
            # insert 0-4 entity mentions with exact offsets
            n_mentions = rng.randint(0, 4)
            mention_pool = rng.sample(comp_ids, k=min(3, len(comp_ids)))
            if reporting:
                mention_pool = list(reporting) + mention_pool
            mention_pool += rng.sample(other_ids, k=2)
            text = ""
            mentions = []
            cursor = 0
            parts = base.split()
            insert_points = sorted(rng.sample(range(len(parts) + 1), k=min(n_mentions, len(parts))))
            pi = 0
            for j, point in enumerate(insert_points):
                seg = " ".join(parts[pi:point])
                if seg:
                    text += seg + " "
                ent = rng.choice(mention_pool)
                nm = name_of[ent]
                start = len(text)
                text += nm
                mentions.append((ent, start, start + len(nm)))
                text += " "
                pi = point
            tail = " ".join(parts[pi:])
            text = (text + tail).strip()
            if rng.random() < 0.1:
                text = "{" + text + "}"  # brace noise (search.py:597-607)
                mentions = [(k, s + 1, e + 1) for k, s, e in mentions]
            chunks.append(
                (
                    doc_id,
                    c,
                    f"{doc_id}-{c}",
                    text,
                    mentions,
                    _embedding(text),
                )
            )
    return entities, docs, chunks


def fixture_frames(
    spark: SparkSession, n_docs: int = 200, seed: int = 7
) -> tuple[DataFrame, DataFrame, DataFrame]:
    ents, docs, chunks = generate_corpus(n_docs=n_docs, seed=seed)
    return (
        spark.createDataFrame(ents, ENTITY_SCHEMA),
        spark.createDataFrame(docs, DOCUMENT_SCHEMA),
        spark.createDataFrame(chunks, CHUNK_SCHEMA),
    )


def fixtures_dir() -> str:
    """Committed parquet materialization of generate_corpus(200, seed=7)
    (tools/make_fixtures.py) — the copy the DuckDB oracle reads too, so
    screening/LLM-workflow queries are value-checkable cross-engine."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "fixtures",
    )


def fixture_tables(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(entities, documents, chunks) from the committed fixture parquet —
    bit-identical input on the Spark and oracle sides."""
    import os

    base = fixtures_dir()
    return (
        spark.read.schema(ENTITY_SCHEMA).parquet(os.path.join(base, "entities.parquet")),
        spark.read.schema(DOCUMENT_SCHEMA).parquet(os.path.join(base, "documents.parquet")),
        spark.read.schema(CHUNK_SCHEMA).parquet(os.path.join(base, "chunks.parquet")),
    )
