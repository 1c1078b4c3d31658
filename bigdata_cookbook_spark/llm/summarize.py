"""Hierarchical map-reduce summarizer (SURVEY.md §2.9 L5; family covers
L6 risk assessor, L7 response extractor, L9 intro reducer — same shape
with different prompts/backends).

Reference: Tracking_Inflation_Drivers/src/summarize.py:62-126 and
Report_Generator_Regulatory_Issues_in_Tech/src/summary/summary.py:60-173 —
per (theme, topic): drop-duplicate texts, pack into <=max_tokens chunks,
summarize each chunk, wrap the chunk summaries as reports, summarize the
summaries; n_documents = nunique(document_id).

Spark-native shape: the tree reduce is expressed as iterative DataFrame
stages. Each level packs rows into token-budget groups relationally
(pack_token_budget — a window cumsum, one shuffle on the group key) and
runs one applyInPandas pass that calls the backend once per pack. Levels
halve (or better) the row count, so depth is logarithmic in corpus size;
each level is a full cluster-parallel stage, never a driver loop over
groups. The backend is a plain ``list[str] -> str`` callable so the
deterministic stub and a real LLM client are interchangeable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.stage import pack_token_budget

SummarizeBackend = Callable[[list[str]], str]


def stub_summarizer(texts: list[str]) -> str:
    """Deterministic stand-in: stable digest of the sorted inputs, tagged
    with the input count so tree shape is observable in tests."""
    h = hashlib.md5("\x1f".join(sorted(texts)).encode()).hexdigest()[:12]
    return f"[summary n={len(texts)} {h}]"


def _summarize_level(
    df: DataFrame,
    keys: Sequence[str],
    text_col: str,
    backend: SummarizeBackend,
    max_tokens: int,
) -> DataFrame:
    """One tree level: pack rows per key, one backend call per pack."""
    packed = pack_token_budget(
        df.select(*keys, text_col),
        group_cols=keys,
        text_col=text_col,
        max_tokens=max_tokens,
        order_cols=[*keys, text_col],  # deterministic pack membership
    )

    key_list = list(keys)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            rows = []
            for kv, grp in pdf.groupby([*key_list, "pack_id"], sort=True):
                texts = grp[text_col].dropna().tolist()
                rows.append(
                    {
                        **dict(zip(key_list, kv[: len(key_list)])),
                        text_col: backend(texts) if texts else "",
                    }
                )
            yield pd.DataFrame(rows, columns=[*key_list, text_col])

    out_schema = ", ".join([f"{k} string" for k in key_list] + [f"{text_col} string"])
    # groupBy-key repartition so every pack of a key lands in one task
    return (
        packed.repartition(*key_list)
        .mapInPandas(run, schema=out_schema)
    )


def hierarchical_summarize(
    df: DataFrame,
    keys: Sequence[str],
    text_col: str,
    doc_col: str | None = None,
    backend: SummarizeBackend = stub_summarizer,
    max_tokens: int = 100_000,
    max_levels: int = 10,
) -> DataFrame:
    """L5: reduce all texts per key to one summary row per key.

    Returns ``keys... , summary, n_documents`` (n_documents only when
    ``doc_col`` given = countDistinct of it, reference summarize.py:117).
    Duplicate texts are dropped before the first level (the reference's
    dedup-before-LLM rule, SURVEY §4).
    """
    keys = list(keys)
    casted = df.select(
        *[F.col(k).cast("string").alias(k) for k in keys],
        F.col(text_col).cast("string").alias(text_col),
        *([F.col(doc_col).alias("__doc")] if doc_col else []),
    )
    n_docs = (
        casted.groupBy(*keys).agg(F.countDistinct("__doc").alias("n_documents"))
        if doc_col
        else None
    )

    level = casted.select(*keys, text_col).dropDuplicates([*keys, text_col])
    for _ in range(max_levels):
        level = _summarize_level(level, keys, text_col, backend, max_tokens)
        counts = level.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        max_n = counts.agg(F.max("n")).collect()[0][0]
        if max_n is None or max_n <= 1:
            break

    out = level.withColumnRenamed(text_col, "summary")
    if n_docs is not None:
        out = out.join(n_docs, on=keys, how="left")
    return out


def reduce_summaries(
    texts: list[str],
    backend: SummarizeBackend = stub_summarizer,
) -> str:
    """L9 — intro-section reducer (reference summarize.py:129-219):
    condense the per-topic summaries into one overview. Driver-side by
    design: the input is one row per topic (tiny); each summary is fenced
    as a numbered report block before the single reduce call."""
    from bigdata_cookbook_spark.functions.text import format_report_block

    blocks = [format_report_block(t, i + 1) for i, t in enumerate(texts)]
    return backend(blocks)
