"""Graph-building operators (SURVEY.md §1.1-7, J8, Election bipartite).

Outputs are plain edge DataFrames — the reference needs no graph
algorithms beyond degree/aggregation (network layout is visualization-only,
network_analysis.py:206), so no GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.analytics import mode_per_group


def co_mention_pairs(
    labeled: DataFrame,
    left_label: str = "P",
    right_labels: tuple[str, ...] = ("A", "N"),
    max_texts: int = 5,
) -> DataFrame:
    """J8: provider×user co-mention edges within a chunk (reference
    network_analysis.py:129-201).

    Self-join on sentence_id restricted by role; edge weight = co-mention
    count, payload = collected sample texts. The join key (sentence_id)
    is high-cardinality so the shuffle partitions evenly; role filters
    shrink both sides before the join.
    """
    base = labeled.select("sentence_id", "entity_id", "entity_name", "label", "text")
    a = base.filter(F.col("label") == left_label).alias("a")
    b = base.filter(F.col("label").isin(*right_labels)).alias("b")
    pairs = a.join(
        b,
        (F.col("a.sentence_id") == F.col("b.sentence_id"))
        & (F.col("a.entity_id") != F.col("b.entity_id")),
    )
    return (
        pairs.groupBy(
            F.col("a.entity_id").alias("src_id"),
            F.col("a.entity_name").alias("src_name"),
            F.col("b.entity_id").alias("dst_id"),
            F.col("b.entity_name").alias("dst_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("weight"),
            F.slice(F.sort_array(F.collect_set(F.col("a.text"))), 1, max_texts).alias(
                "sample_texts"
            ),
        )
    )


def company_topic_bipartite(
    screening: DataFrame,
    labeled_col: str = "label",
    blacklist: tuple[str, ...] = (),
) -> DataFrame:
    """Election bipartite company-topic edges (visualization_tools.py:
    573-695): explode topics, drop COMP-typed and blacklisted ones, count
    co-occurrences and attach the majority label per (company, topic)."""
    ex = screening.select(
        "entity_id",
        "entity_name",
        labeled_col,
        F.explode(F.arrays_zip("topics", "topics_type")).alias("t"),
    ).select(
        "entity_id",
        "entity_name",
        labeled_col,
        F.col("t.topics").alias("topic"),
        F.col("t.topics_type").alias("topic_type"),
    )
    filtered = ex.filter(F.col("topic_type") != "COMP")
    if blacklist:
        filtered = filtered.filter(~F.col("topic").isin(*blacklist))
    counts = filtered.groupBy("entity_id", "entity_name", "topic").agg(
        F.count(F.lit(1)).alias("weight")
    )
    majority = mode_per_group(
        filtered, ["entity_id", "topic"], labeled_col, out_col="majority_label"
    )
    return counts.join(majority, ["entity_id", "topic"], "left")
