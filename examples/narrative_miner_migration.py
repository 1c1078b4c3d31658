"""Runnable migration example: the reference Narrative Miners tool
(`Narrative_Miners/src/tool.py`) end-to-end on this engine — the last of
the four reference workflow skeletons to get a runnable recomposition
(Thematic Screener, Election Monitor, Report Generator examples are the
other three).

Reference flow -> engine flow (line numbers from the reference tool):

    tool.py:10-27  load_narrative_data (per-source
      Excel with a Label column)            -> fixture documents/chunks +
                                               llm_label_stage over a
                                               narrative choice backend
    tool.py:34-53  prepare_narrative_data
      (weekly pivot -> z-score ->
      gaussian_filter1d(sigma=2))           -> workflows.narrative_timeseries
                                               (W5 weekly bucket + W6
                                               zscore_per_series + W7
                                               gaussian_smooth)
    tool.py:55-69  calculate_source_scores
      (overall weekly z-score per source)   -> the same workflow with
                                               label_col="document_type"
    tool.py:79-88  cross-source index union
      + ffill alignment                     -> pivot on source + ordered
                                               last(ignorenulls) ffill (W9)
    tool.py:694-719  extract_narrative_insights
      (peak month per source, news-vs-
      filings peak lag)                     -> argmax_row_per_group (W8)
                                               + datediff vs the news peak
    tool.py:735-751  create_source_summary   -> per-source count / date
                                               span / distinct narratives
                                               (A17)
    tool.py:96-672  plotly figures + arrows  -> viz.timeseries_spec panels
                                               in ONE sinks.dashboard_html
    display(...) tables                      -> sinks.html_report +
                                               sinks.workbook_xlsx_sink

The LLM boundary runs a deterministic choice backend (llm/stub.py
make_choice_backend) over a fixed narrative list so the example executes
hermetically on the committed fixtures and its outputs are byte-stable
(tests/test_examples.py runs it twice and compares bytes). To mine the
narrative list itself with a live model, generate it with
llm.taxonomy.generate_theme_tree and swap in
llm.openai_backend.make_openai_backend() — every other line stays the
same.

Run:  python examples/narrative_miner_migration.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.stage import llm_label_stage
from bigdata_cookbook_spark.llm.stub import make_choice_backend
from bigdata_cookbook_spark.operators.analytics import argmax_row_per_group
from bigdata_cookbook_spark.operators.normalize import normalize_screening
from bigdata_cookbook_spark.sinks import (
    dashboard_html,
    html_report,
    workbook_xlsx_sink,
)
from bigdata_cookbook_spark.sources.fixtures import fixture_tables
from bigdata_cookbook_spark.viz import timeseries_spec, with_series_selector
from bigdata_cookbook_spark.workflows import narrative_timeseries

# ===== Narrative list (reference tool.py:10-27: the Label column of the
# mined per-source workbooks; here a fixed list the choice backend
# assigns deterministically) =====
NARRATIVES = [
    "Tariff Pass-Through",
    "Supply Chain Rerouting",
    "Margin Compression",
    "Consumer Demand Shift",
    "Nearshoring",
]
# the reference's three source workbooks (tool.py:24 Source_Type column)
SOURCES = ["news", "transcripts", "filings"]


def _ffill_aligned(per_source) -> "DataFrame":
    """tool.py:79-88: union of the per-source week indices, one column
    per source, forward-filled then zero-filled. The window is over the
    post-agg WEEKLY series (|rows| = |distinct weeks|, calendar-bounded,
    never the fact table) — same justification as the W9 registry query;
    at multi-decade span partition by year with seeded group_ffill."""
    wide = (
        per_source.groupBy("week")
        .pivot("document_type", SOURCES)
        .agg(F.first("smoothed"))
    )
    w = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return wide.select(
        "week",
        *[
            F.round(
                F.coalesce(F.last(s, ignorenulls=True).over(w), F.lit(0.0)), 4
            ).alias(s)
            for s in SOURCES
        ],
    ).orderBy("week")


def main(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Execute the narrative miner end-to-end; returns {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)

    entities, documents, chunks = fixture_tables(spark)

    # -- tool.py:10-27: each chunk gets a narrative Label. The dedup'd
    # label stage (L1) stands in for the reference's pre-labeled Excel
    # columns; the choice backend is the deterministic stub tier.
    screening = normalize_screening(documents, chunks, entities, mode="discovery")
    labeled = llm_label_stage(
        screening, make_choice_backend(NARRATIVES, salt="narrative")
    )

    # -- tool.py:34-53 prepare_narrative_data: weekly counts per
    # narrative -> per-series z-score -> Gaussian smoothing (sigma=2)
    per_narrative = narrative_timeseries(labeled, label_col="label").select(
        "label", "week", "cnt", F.round("smoothed", 4).alias("smoothed")
    )

    # -- tool.py:55-69 calculate_source_scores: the SAME pipeline keyed
    # by source instead of narrative (document_type = the reference's
    # Source_Type column)
    per_source = narrative_timeseries(labeled, label_col="document_type").select(
        "document_type", "week", "cnt", F.round("smoothed", 4).alias("smoothed")
    )

    # -- tool.py:79-88: align the three source series on one week spine
    aligned = _ffill_aligned(per_source)

    # -- tool.py:694-719 extract_narrative_insights: peak week per
    # source (W8 argmax) and each source's peak lag vs the news peak
    peaks = argmax_row_per_group(
        per_source, ["document_type"], [F.col("smoothed").desc(), F.col("week").asc()]
    ).select(
        "document_type",
        F.col("week").alias("peak_week"),
        F.col("smoothed").alias("peak_score"),
    )
    news_peak = peaks.filter(F.col("document_type") == "news").select(
        F.col("peak_week").alias("news_peak_week")
    )
    top_per_source = argmax_row_per_group(
        labeled.groupBy("document_type", "label").agg(
            F.count(F.lit(1)).alias("n_mentions")
        ),
        ["document_type"],
        [F.col("n_mentions").desc(), F.col("label").asc()],
    ).select("document_type", F.col("label").alias("top_narrative"), "n_mentions")
    insights = (
        peaks.join(F.broadcast(news_peak))
        .withColumn(
            "lag_days_vs_news", F.datediff("peak_week", "news_peak_week")
        )
        .drop("news_peak_week")
        .join(top_per_source, "document_type")
        .orderBy("document_type")
    )

    # -- tool.py:735-751 create_source_summary (A17)
    summary = (
        labeled.groupBy("document_type")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.to_date(F.min("timestamp_utc")).alias("min_date"),
            F.to_date(F.max("timestamp_utc")).alias("max_date"),
            F.countDistinct("label").alias("n_narratives"),
        )
        .orderBy("document_type")
    )

    # -- tool.py:96-672: the two figures — per-narrative smoothed
    # z-score lines (with the reference's narrative dropdown) and the
    # cross-source comparison — on one static dashboard page
    narrative_panel = with_series_selector(
        timeseries_spec(
            per_narrative.select("week", "smoothed", "label").orderBy(
                "label", "week"
            ),
            x="week",
            y="smoothed",
            series="label",
            title="Narrative prevalence (weekly z-score, smoothed)",
        ),
        "label",
        label="Narrative: ",
    )
    source_panel = timeseries_spec(
        per_source.select("week", "smoothed", "document_type").orderBy(
            "document_type", "week"
        ),
        x="week",
        y="smoothed",
        series="document_type",
        title="Cross-source narrative prevalence",
    )
    dash_path = os.path.join(out_dir, "narrative_dashboard.html")
    with open(dash_path, "w", encoding="utf-8") as f:
        f.write(
            dashboard_html(
                {
                    "Narratives": narrative_panel,
                    "Cross-source comparison": source_panel,
                },
                title="Narrative miner",
            )
        )

    # -- the insights display() tables as an HTML report
    html_path = os.path.join(out_dir, "narrative_insights.html")
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(
            html_report(
                insights,
                group_col="document_type",
                title="Narrative insights",
                body_cols=[
                    "peak_week",
                    "peak_score",
                    "lag_days_vs_news",
                    "top_narrative",
                    "n_mentions",
                ],
                heading_col="document_type",
            )
        )

    # -- the per-source workbook export (summary + insights + aligned
    # comparison frame)
    xlsx_path = os.path.join(out_dir, "narrative_miner.xlsx")
    workbook_xlsx_sink(
        {
            "Source Summary": summary,
            "Peak Insights": insights,
            "Aligned Scores": aligned,
        },
        xlsx_path,
    )
    return {"dashboard": dash_path, "html": html_path, "xlsx": xlsx_path}


if __name__ == "__main__":
    from bigdata_cookbook_spark.session import get_spark

    out = main(
        get_spark("narrative-miner-example"),
        sys.argv[1] if len(sys.argv) > 1 else "out/narrative_miner",
    )
    for k, v in out.items():
        print(f"{k}: {v}")
