"""Workflow recompositions (SURVEY.md §3) — thin pipelines over the layers.

Each mirrors a reference notebook skeleton with the LLM replaced by a
pluggable backend (deterministic stub in tests):

- thematic_screener: §3.1 ThematicScreener.ipynb cells 18-34
- dual_role_analysis: §3.2 AI_Cost_Cutting_Market_Analysis.ipynb cells 18-41
- narrative_timeseries: Narrative_Miners/src/tool.py:21-88 analytics
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.stage import Backend, llm_label_stage
from bigdata_cookbook_spark.operators.analytics import (
    calendar_densify,
    gaussian_smooth,
    pivot_composite,
    topk_per_group,
    zscore_per_series,
)
from bigdata_cookbook_spark.operators.graph import co_mention_pairs
from bigdata_cookbook_spark.operators.normalize import normalize_screening
from bigdata_cookbook_spark.query.algebra import QuerySpec, run_search, unified_chunk_frame


def thematic_screener(
    documents: DataFrame,
    chunks: DataFrame,
    entities: DataFrame,
    theme_labels: Sequence[str],
    backend: Backend,
    specs: list[QuerySpec] | None = None,
    watchlist: Sequence[str] | None = None,
) -> dict[str, DataFrame]:
    """§3.1: (optional search) -> normalize -> label -> per-company and
    per-industry theme score pivot with composite (A9/A14)."""
    if specs:
        hits = run_search(unified_chunk_frame(documents, chunks), specs)
        chunk_ids = hits.select("sentence_id").distinct()
        chunks = chunks.join(chunk_ids, "sentence_id", "left_semi")
    mode = "watchlist" if watchlist else "discovery"
    screening = normalize_screening(documents, chunks, entities, mode=mode, watchlist=watchlist)
    labeled = llm_label_stage(screening, backend)
    clean = labeled.filter(~F.col("label").isin("", "unassigned", "unclear", "U"))
    by_company = pivot_composite(
        clean,
        group_by=["entity_name", "entity_sector"],
        pivot_col="label",
        pivot_values=list(theme_labels),
        agg=F.count(F.lit(1)),
    )
    by_industry = pivot_composite(
        clean,
        group_by=["entity_industry"],
        pivot_col="label",
        pivot_values=list(theme_labels),
        agg=F.count(F.lit(1)),
    )
    return {"screening": screening, "labeled": labeled, "by_company": by_company, "by_industry": by_industry}


def dual_role_analysis(
    documents: DataFrame,
    chunks: DataFrame,
    entities: DataFrame,
    backend: Backend,
    top_k_per_sector: int = 5,
) -> dict[str, DataFrame]:
    """§3.2: normalize -> label P/A/N -> split -> top companies per sector
    (W1), weekly net-exposure time series (J9+A12), co-mention network
    (J8)."""
    screening = normalize_screening(documents, chunks, entities, mode="discovery")
    labeled = llm_label_stage(screening, backend)
    providers = labeled.filter(F.col("label") == "P")
    users = labeled.filter(F.col("label").isin("A", "N"))

    top_by_sector = topk_per_group(
        providers.groupBy("entity_sector", "entity_name").agg(
            F.countDistinct("sentence_id").alias("n_hits")
        ),
        ["entity_sector"],
        [F.col("n_hits").desc(), F.col("entity_name").asc()],
        k=top_k_per_sector,
    )

    weekly = (
        labeled.filter(F.col("label").isin("P", "A", "N"))
        .groupBy(
            F.date_trunc("week", "timestamp_utc").cast("date").alias("week"),
            "entity_name",
        )
        .agg(
            F.count(F.when(F.col("label") == "P", 1)).alias("pos_cnt"),
            F.count(F.when(F.col("label") != "P", 1)).alias("neg_cnt"),
        )
    )
    dense = calendar_densify(
        weekly,
        date_col="week",
        entity_cols=["entity_name"],
        value_cols={
            "pos_cnt": F.coalesce(F.col("pos_cnt"), F.lit(0)),
            "neg_cnt": F.coalesce(F.col("neg_cnt"), F.lit(0)),
        },
        step="interval 7 day",
    ).withColumn("net_exposure", F.abs(F.col("pos_cnt")) - F.abs(F.col("neg_cnt")))

    network = co_mention_pairs(labeled)
    return {
        "labeled": labeled,
        "providers": providers,
        "users": users,
        "top_by_sector": top_by_sector,
        "weekly_net": dense,
        "network": network,
    }


def narrative_timeseries(
    labeled: DataFrame,
    date_col: str = "timestamp_utc",
    label_col: str = "label",
    sigma: float = 2.0,
) -> DataFrame:
    """Narrative miner analytics: weekly counts per label -> z-score (W6)
    -> Gaussian smoothing (W7)."""
    weekly = labeled.groupBy(
        label_col, F.date_trunc("week", date_col).cast("date").alias("week")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    z = zscore_per_series(weekly, [label_col], "cnt", out_col="zscore")
    return gaussian_smooth(z, [label_col], [F.col("week").asc()], "zscore", sigma=sigma)
