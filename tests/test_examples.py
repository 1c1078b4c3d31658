"""The examples/ scripts must actually run (MIGRATION.md made
executable) and produce byte-stable artifacts — run twice, compare
bytes."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)

import thematic_screener_migration as example


def _digest(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


@pytest.mark.full  # multi-minute double-run tier (VERDICT r11 item 1);
# byte-stability runs every close-out under SPARK_GRAFT_FULL_TESTS=1
def test_thematic_screener_example_runs_and_is_byte_stable(spark, tmp_path):
    p1 = example.main(spark, str(tmp_path / "run1"))
    p2 = example.main(spark, str(tmp_path / "run2"))

    for key in ("html", "xlsx", "chart", "dashboard"):
        assert os.path.getsize(p1[key]) > 0
        assert _digest(p1[key]) == _digest(p2[key]), key

    dash = open(p1["dashboard"], encoding="utf-8").read()
    assert "vegaEmbed" in dash          # exposure + industry panels
    assert "<ul class='tree'>" in dash  # taxonomy mind-map panel

    html = open(p1["html"], encoding="utf-8").read()
    assert "Thematic exposure" in html
    assert "<section>" in html  # at least one sector section rendered
    # xlsx is a real zip container (stdlib OOXML writer)
    assert open(p1["xlsx"], "rb").read(2) == b"PK"
    # chart is a valid Vega-Lite v5 spec with data inlined
    import json

    spec = json.load(open(p1["chart"], encoding="utf-8"))
    assert spec["$schema"].endswith("vega-lite/v5.json")
    assert spec["data"]["values"]


@pytest.mark.full  # multi-minute double-run tier (VERDICT r11 item 1);
# byte-stability runs every close-out under SPARK_GRAFT_FULL_TESTS=1
def test_pretraining_pipeline_example_runs_and_is_deterministic(spark, tmp_path):
    import json

    import pretraining_data_pipeline as pex

    p1 = pex.main(spark, str(tmp_path / "run1"))
    p2 = pex.main(spark, str(tmp_path / "run2"))

    a1 = json.load(open(p1["accounting"], encoding="utf-8"))
    a2 = json.load(open(p2["accounting"], encoding="utf-8"))
    assert a1 == a2
    stages = dict(a1["stages"])
    # every optional stage reported, totals reconcile
    assert {
        "dropped_domain_blocklist", "dropped_url_dedup",
        "dropped_line_filter", "dropped_quality", "dropped_exact",
        "dropped_neardup", "dropped_quality_prune", "dropped_semantic",
        "dropped_contaminated", "dropped_dsir", "dropped_mixing",
    } == set(stages)
    # the round-8 web-ingest stages do real work on the planted URLs
    assert stages["dropped_domain_blocklist"] > 0
    assert stages["dropped_url_dedup"] > 0
    assert stages["dropped_dsir"] > 0
    assert a1["kept"] > 0
    assert a1["kept"] + sum(stages.values()) == 500  # sf0.001 corpus

    ts1 = {tuple(r) for r in spark.read.parquet(p1["training_set"]).collect()}
    ts2 = {tuple(r) for r in spark.read.parquet(p2["training_set"]).collect()}
    assert ts1 == ts2 and len(ts1) == a1["kept"]

    # run dashboard: byte-stable, one Vega-Lite panel per figure
    assert _digest(p1["dashboard"]) == _digest(p2["dashboard"])
    dash = open(p1["dashboard"], encoding="utf-8").read()
    assert dash.count("vegaEmbed('#panel") == 5


@pytest.mark.full  # multi-minute double-run tier (VERDICT r11 item 1);
# byte-stability runs every close-out under SPARK_GRAFT_FULL_TESTS=1
def test_incremental_ingest_example_runs(spark, tmp_path):
    import json

    import incremental_ingest_pipeline as iex

    paths = iex.main(spark, str(tmp_path / "run"))
    s = json.load(open(paths["summary"], encoding="utf-8"))
    assert s["batches"] == 3 and s["kept"] > 0
    assert s["parity_vs_batch_chain"] is True
    assert set(s["state_tables"]) == {
        "seen_hashes", "shingles", "buckets", "paras", "spans",
        "embeddings", "drops",
    }
    # the streaming audit trail reconciles: every batch's kept + drops
    # partition the batch's docs
    total_dropped = sum(s["drop_audit"].values())
    assert s["kept"] + total_dropped == 500  # sf0.001 corpus
    # post-maintenance layout: the two older deltas merged into one,
    # the newest preserved for crash replay -> exactly 2 dirs per table
    for t in s["state_tables"]:
        dirs = [
            d
            for d in os.listdir(os.path.join(paths["state"], t))
            if d.startswith("ingest_batch=")
        ]
        assert len(dirs) == 2, t
    # the maintenance stats made it into the summary (content-equality
    # through consolidation is asserted inside the example itself)
    assert set(s["maintenance"]) == set(s["state_tables"])
    assert any(m["merged"] >= 2 for m in s["maintenance"].values())


def test_election_network_monitor_example_runs_and_is_byte_stable(spark, tmp_path):
    import election_network_monitor as nex

    p1 = nex.main(spark, str(tmp_path / "run1"))
    p2 = nex.main(spark, str(tmp_path / "run2"))

    for key in ("dashboard", "dot"):
        assert os.path.getsize(p1[key]) > 0
        assert _digest(p1[key]) == _digest(p2[key]), key

    dash = open(p1["dashboard"], encoding="utf-8").read()
    # two d3-force node-link panels (co-mention + bipartite) and two
    # Vega-Lite panels (time series + bar)
    assert dash.count("forceSimulation") == 2
    assert dash.count("vegaEmbed('#panel") == 2
    # bipartite nodes carry the majority-label group the reference
    # colors by
    assert '"group":"company"' in dash
    # widget-level parity: the rangeslider brush (overview+detail) and
    # the sector dropdown param ride inside the embedded specs
    assert '"name":"brush"' in dash
    assert '"name":"series_sel"' in dash

    dot = open(p1["dot"], encoding="utf-8").read()
    assert dot.startswith("graph g {") and " -- " in dot


@pytest.mark.full  # multi-minute double-run tier (VERDICT r11 item 1);
# byte-stability runs every close-out under SPARK_GRAFT_FULL_TESTS=1
def test_inflation_drivers_example_runs_and_is_byte_stable(spark, tmp_path):
    """SURVEY §3.3 Tracking_Inflation_Drivers end-to-end: taxonomy ->
    search -> leaf-label -> per-(theme, topic) map-reduce summarize ->
    driver-tag -> intro reduce -> HTML report + 3-sheet xlsx, structure
    per reference summarize.py:222-285."""
    import inflation_drivers_report as iex

    p1 = iex.main(spark, str(tmp_path / "run1"))
    p2 = iex.main(spark, str(tmp_path / "run2"))

    for key in ("html", "xlsx", "dashboard", "chart"):
        assert os.path.getsize(p1[key]) > 0
        assert _digest(p1[key]) == _digest(p2[key]), key

    html = open(p1["html"], encoding="utf-8").read()
    # reference create_html_report structure: h1 theme report, intro
    # paragraph, one h2 per driver-tag group, per-topic summary blocks
    assert "<h1>United States Inflation Report</h1>" in html
    assert "<p class='intro'>Report from 2024-01-01 to 2024-12-31." in html
    assert html.count("<section>") >= 2  # >=2 driver tags got topics
    assert "<b>topic_summary:</b>" in html and "<b>n_documents:</b>" in html
    # every taxonomy leaf that survived labeling is summarized exactly once
    assert html.count("<div class='item'>") == 6

    # xlsx: real zip, three sheets
    import zipfile

    with zipfile.ZipFile(p1["xlsx"]) as z:
        sheets = [n for n in z.namelist() if n.startswith("xl/worksheets/")]
        assert len(sheets) == 3

    dash = open(p1["dashboard"], encoding="utf-8").read()
    assert "vegaEmbed" in dash and "<ul class='tree'>" in dash


def test_narrative_miner_example_runs_and_is_byte_stable(spark, tmp_path):
    """SURVEY §3 Narrative_Miners end-to-end (the fourth and last
    reference workflow skeleton to get a runnable example): label ->
    weekly z-score + Gaussian smoothing per narrative and per source
    (tool.py:34-69) -> cross-source ffill alignment (:79-88) -> peak/lag
    insights (:694-719) -> source summary (:735-751) -> dashboard +
    insights HTML + 3-sheet xlsx."""
    import narrative_miner_migration as nex

    p1 = nex.main(spark, str(tmp_path / "run1"))
    p2 = nex.main(spark, str(tmp_path / "run2"))

    for key in ("dashboard", "html", "xlsx"):
        assert os.path.getsize(p1[key]) > 0
        assert _digest(p1[key]) == _digest(p2[key]), key

    dash = open(p1["dashboard"], encoding="utf-8").read()
    assert "vegaEmbed" in dash
    assert "Narrative prevalence" in dash and "Cross-source" in dash

    html = open(p1["html"], encoding="utf-8").read()
    # one section per source workbook, each carrying the W8 peak/lag
    # fields and the top-narrative count (reference insights dict keys)
    for src in ("news", "transcripts", "filings"):
        assert f"<h2>{src}</h2>" in html
    assert "<b>peak_week:</b>" in html and "<b>lag_days_vs_news:</b>" in html
    assert "<b>top_narrative:</b>" in html
    # the news series is its own lag reference: lag_days_vs_news == 0
    import re

    news_sec = html.split("<h2>news</h2>")[1].split("</section>")[0]
    lag = re.search(r"<b>lag_days_vs_news:</b> (-?\d+)", news_sec)
    assert lag and lag.group(1) == "0"

    # xlsx: real zip, three sheets (summary / insights / aligned scores)
    import zipfile

    with zipfile.ZipFile(p1["xlsx"]) as z:
        sheets = [n for n in z.namelist() if n.startswith("xl/worksheets/")]
        assert len(sheets) == 3


@pytest.mark.full  # multi-minute double-run tier (VERDICT r11 item 1);
# byte-stability runs every close-out under SPARK_GRAFT_FULL_TESTS=1
def test_regulatory_issues_example_runs_and_is_byte_stable(spark, tmp_path):
    """SURVEY §3 Report_Generator family end-to-end: two-source label ->
    per-(entity, topic) summarize + risk/uncertainty assessment (A13
    ints per reference summary.py:425-429) -> mitigation extraction
    with the filings->news fallback coalesce (J10) -> criterion-box
    HTML report (reference html_report.py structure) + risk scatter +
    3-sheet xlsx."""
    import regulatory_issues_report as rex

    p1 = rex.main(spark, str(tmp_path / "run1"))
    p2 = rex.main(spark, str(tmp_path / "run2"))

    for key in ("html", "dashboard", "xlsx"):
        assert os.path.getsize(p1[key]) > 0
        assert _digest(p1[key]) == _digest(p2[key]), key

    html = open(p1["html"], encoding="utf-8").read()
    # reference generate_html_report structure: title, report date, the
    # two sections, theme boxes, per-entity criterion boxes, responses
    assert "<h1>Regulatory Issues in Technology Report</h1>" in html
    assert "<h2>Sector-Wide Issues</h2>" in html
    assert "<h2>Company-Specific Issues</h2>" in html
    assert html.count("report-theme-box") == 3  # stub taxonomy: 3 themes
    n_entities = html.count("<div class='report-entity'>")
    assert n_entities > 0
    # exactly the three prepare_data_report_0 criteria per entity
    assert html.count("1. Most Reported Issue") == n_entities
    assert html.count("2. Biggest Risk") == n_entities
    assert html.count("3. Most Uncertain Issue") == n_entities
    assert "Company's Response:" in html

    # the J10 fallback must be a real branch: some companies answer from
    # filings/transcripts, the rest fall back to news summaries
    import zipfile

    with zipfile.ZipFile(p1["xlsx"]) as z:
        sheets = [n for n in z.namelist() if n.startswith("xl/worksheets/")]
        assert len(sheets) == 3
        company_sheet = z.read("xl/worksheets/sheet2.xml").decode()
    assert "risk_score" in company_sheet and "uncertainty_score" in company_sheet

    dash = open(p1["dashboard"], encoding="utf-8").read()
    assert "vegaEmbed" in dash


def test_regulatory_issues_fallback_coalesce_takes_both_branches(spark):
    """The mitigation join must exercise BOTH sides of the coalesce on
    the committed fixtures: filings-backed responses where filings or
    transcripts were labeled with the topic, news fallback elsewhere."""
    import regulatory_issues_report as rex
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.llm.stage import llm_label_stage
    from bigdata_cookbook_spark.llm.stub import make_choice_backend
    from bigdata_cookbook_spark.llm.taxonomy import (
        generate_theme_tree,
        leaf_labels,
    )
    from bigdata_cookbook_spark.operators.normalize import normalize_screening
    from bigdata_cookbook_spark.sources.fixtures import fixture_tables

    entities, documents, chunks = fixture_tables(spark)
    topics = leaf_labels(generate_theme_tree(rex.THEME))
    screening = normalize_screening(documents, chunks, entities, mode="discovery")
    labeler = make_choice_backend([*topics, "unassigned"], salt="reg-topic")
    news = (
        llm_label_stage(
            screening.filter(F.col("document_type") == "news"),
            labeler,
            guardrail=False,
        )
        .filter(~F.col("label").isin("", "unassigned", "unclear"))
        .withColumnRenamed("label", "topic")
    )
    ft = (
        llm_label_stage(
            screening.filter(
                F.col("document_type").isin("filings", "transcripts")
            ),
            labeler,
            guardrail=False,
        )
        .filter(~F.col("label").isin("", "unassigned", "unclear"))
        .withColumnRenamed("label", "topic")
    )
    news_keys = news.select("entity_name", "topic").distinct()
    ft_keys = ft.select("entity_name", "topic").distinct()
    n_filings_backed = news_keys.join(
        ft_keys, ["entity_name", "topic"], "left_semi"
    ).count()
    n_fallback = news_keys.join(
        ft_keys, ["entity_name", "topic"], "left_anti"
    ).count()
    assert n_filings_backed > 0 and n_fallback > 0
