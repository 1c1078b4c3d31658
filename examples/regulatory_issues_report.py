"""Runnable migration example: the reference Report_Generator family
(`Report_Generator_Regulatory_Issues_in_Tech/src/report_generator.py`,
`Report_Generator_AI_Threats/src/report_generator.py` — the two
notebooks share the flow), step for step, on this engine — the last
reference entry-point family made executable.

Reference flow -> engine flow (step numbers from report_generator.py):

    step 1  Bigdata(user, pass) + watchlist      -> a SparkSession over parquet
                                                    tables; the entities dim IS
                                                    the watchlist
    step 2  themes_tree_dict (seeded taxonomy)   -> llm.taxonomy.generate_theme_tree;
                                                    leaves = regulatory-issue topics,
                                                    label_to_parent = topic -> theme
    step 3  search news / filings / transcripts  -> ONE normalize_screening pass,
            as three populations                    split by document_type (the
                                                    engine's declarative twin of
                                                    three remote search calls)
    step 4a TopicSummarizerSector.summarize      -> hierarchical_summarize keyed
            (df_by_theme)                           on (theme, topic) over news
    step 4b TopicSummarizerCompany               -> hierarchical_summarize keyed
            .process_topic_by_company               on (entity, topic) + TWO
            (topic_summary, risk_magnitude ->       llm_label_stage passes over the
            risk_score, uncertainty ->              summary table: risk magnitude
            uncertainty_score,                      {High,Medium,Low,Neutral} and
            summary.py:348-429)                     uncertainty {High,Medium,Low,
                                                    Past}, each mapped to ints
                                                    3/2/1/0 (A13) exactly as
                                                    summary.py:425-429
    step 5  CompanyResponseProcessor over        -> hierarchical_summarize keyed on
            filings+transcripts, then again         (entity, topic) over the F/T
            over news; response_summary =           population, again over news;
            filings fillna news                     J10 fallback coalesce
            (report_generator.py:426-470)           filings -> news
    step 6  Report(themes_tree, by_theme,        -> the reference html_report.py
            by_company_with_responses) +            structure verbatim: Sector-Wide
            html_report.generate_html_report        Issues theme boxes + per-entity
            (prepare_data_report_0:                 criterion boxes (1. Most
            Most Reported / Biggest Risk /          Reported Issue / 2. Biggest
            Most Uncertain criterion boxes,         Risk / 3. Most Uncertain Issue
            Company's Response list)                via topk_per_group) + Company's
                                                    Response list
    extra   risk scatter (media attention vs     -> viz.scatter_spec bubble: x =
            risk, the Risk_Analyzer-style           n_documents, y = risk_score,
            scored view of the same table)          size = uncertainty_score
    export  to_pickle stage checkpoints          -> workbook_xlsx_sink (3 sheets)

The LLM boundary runs deterministic stubs (topic labeler, risk and
uncertainty assessors, stub_summarizer) so the example executes
hermetically on the committed fixtures and its outputs are byte-stable
(tests/test_examples.py runs it twice and compares bytes). To run
against a live model, swap make_choice_backend for
llm.openai_backend.make_openai_backend() — every other line stays the
same.

Scale notes (the 100 TB story): search/normalize/label run corpus-wide
as lazy DataFrame stages; BOTH summarize passes and BOTH assessor
passes operate on tables bounded by (watchlist x taxonomy), never by
the corpus — the reference's asyncio driver loops over entity x topic
(summary.py process_topic_by_company) become cluster-parallel
map-reduces keyed on those columns. The only collects are the bounded
report/sink tables.

Run:  python examples/regulatory_issues_report.py [out_dir]
"""

from __future__ import annotations

import html as _html
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.stage import llm_label_stage
from bigdata_cookbook_spark.llm.stub import make_choice_backend
from bigdata_cookbook_spark.llm.summarize import (
    hierarchical_summarize,
    stub_summarizer,
)
from bigdata_cookbook_spark.llm.taxonomy import (
    generate_theme_tree,
    label_to_parent,
    leaf_labels,
)
from bigdata_cookbook_spark.operators.analytics import topk_per_group
from bigdata_cookbook_spark.operators.normalize import normalize_screening
from bigdata_cookbook_spark.sinks import dashboard_html, workbook_xlsx_sink
from bigdata_cookbook_spark.sources.fixtures import fixture_tables
from bigdata_cookbook_spark.viz import scatter_spec

# ===== Watchlist + theme config (report_generator.py step 1-2) =====
THEME = "Regulatory Issues in Technology"
REPORT_DATE = "December 31, 2024"  # fixed: byte-stable golden artifacts

# ===== A13 integer mappings, verbatim from summary.py:425-429 =====
RISK_LEVELS = {"High": 3, "Medium": 2, "Low": 1, "Neutral": 0}
UNCERTAINTY_LEVELS = {"High": 3, "Medium": 2, "Low": 1, "Past": 0}


def _score_map(levels: dict[str, int]):
    m = F.create_map(
        *[F.lit(x) for k, v in sorted(levels.items()) for x in (k, v)]
    )

    def apply(col):
        return F.coalesce(m[col], F.lit(0)).cast("int")

    return apply


def _summaries(
    labeled: DataFrame, keys: list[str], out: str, n_out: str
) -> DataFrame:
    """One summary row per key tuple (L5) with its distinct-doc count —
    TopicSummarizer's output contract (summary.py:369-371)."""
    return (
        hierarchical_summarize(
            labeled,
            keys=keys,
            text_col="masked_text",
            doc_col="document_id",
            backend=stub_summarizer,
        )
        .withColumnRenamed("summary", out)
        .withColumnRenamed("n_documents", n_out)
    )


def _render_report(
    title: str, by_theme_rows: list, top_rows: list, response_rows: list
) -> str:
    """The reference html_report.generate_html_report structure:
    Section 1 'Sector-Wide Issues' theme boxes (h3 theme + topic list),
    Section 2 'Company-Specific Issues' per-entity criterion boxes +
    a 'Company's Response' list. Deterministic ordering throughout."""
    e = _html.escape
    out = [
        "<!DOCTYPE html>",
        "<html><head><meta charset='utf-8'>",
        f"<title>{e(title)}</title></head><body>",
        "<div class='report-container'>",
        f"<h1>{e(title)}</h1>",
        f"<div class='report-date'>{e(REPORT_DATE)}</div>",
        "<h2>Sector-Wide Issues</h2>",
    ]
    themes: dict[str, list] = {}
    for r in by_theme_rows:
        themes.setdefault(r["theme"], []).append(r)
    for theme in sorted(themes):
        out.append("<div class='report-theme-box'>")
        out.append(f"<h3>{e(theme)}</h3><ul>")
        for r in sorted(themes[theme], key=lambda r: r["topic"]):
            out.append(
                f"<li><strong>{e(r['topic'])}</strong>: "
                f"{e(r['topic_summary'])} [{r['n_documents']} News]</li>"
            )
        out.append("</ul></div>")

    out.append("<h2>Company-Specific Issues</h2>")
    ents: dict[str, list] = {}
    for r in top_rows:
        ents.setdefault(r["entity_name"], []).append(r)
    resp: dict[str, list] = {}
    for r in response_rows:
        resp.setdefault(r["entity_name"], []).append(r)
    for entity in sorted(ents):
        out.append("<div class='report-entity'>")
        out.append(f"<h3>{e(entity)}</h3>")
        out.append("<div class='report-flex-container'>")
        for r in sorted(ents[entity], key=lambda r: r["criterion"]):
            out.append("<div class='report-criterion-box'>")
            out.append(
                f"<strong class='report-criterion'>{e(r['criterion'])}"
                "</strong><br/>"
            )
            out.append(
                f"<strong class='topic'>{e(r['topic'])}:</strong> "
                f"{e(r['headline'])}<br>[{r['n_documents']} News]<br/>"
            )
            out.append("</div>")
        out.append("</div>")
        entity_resp = [
            r for r in resp.get(entity, []) if r["response_summary"]
        ]
        if entity_resp:
            out.append("<div class='report-response-summary'>")
            out.append("<strong>Company's Response:</strong><br/><ul>")
            for r in sorted(entity_resp, key=lambda r: r["topic"]):
                out.append(
                    f"<li><strong>{e(r['topic'])}</strong>: "
                    f"{e(r['response_summary'])}</li>"
                )
            out.append("</ul></div>")
        out.append("</div>")
    out.append("</div></body></html>")
    return "\n".join(out)


def main(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Execute the regulatory-issues report end-to-end; returns
    {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)

    entities, documents, chunks = fixture_tables(spark)

    # -- step 2: seeded taxonomy; leaves = issue topics, parents = themes
    tree = generate_theme_tree(THEME)
    topics = leaf_labels(tree)
    l2p = label_to_parent(tree)
    theme_map = F.create_map(
        *[F.lit(x) for pair in sorted(l2p.items()) for x in pair]
    )

    # -- step 3: one normalize pass, split into the notebook's two
    # source populations (news vs filings+transcripts)
    screening = normalize_screening(documents, chunks, entities, mode="discovery")
    topic_labeler = make_choice_backend([*topics, "unassigned"], salt="reg-topic")

    def label_topics(df: DataFrame) -> DataFrame:
        return (
            llm_label_stage(df, topic_labeler, guardrail=False)
            .filter(~F.col("label").isin("", "unassigned", "unclear"))
            .withColumnRenamed("label", "topic")
            .withColumn("theme", theme_map[F.col("topic")])
        )

    news_labeled = label_topics(
        screening.filter(F.col("document_type") == "news")
    )
    ft_labeled = label_topics(
        screening.filter(F.col("document_type").isin("filings", "transcripts"))
    )

    # -- step 4a: sector-wide issue summaries per (theme, topic)
    df_by_theme = _summaries(
        news_labeled, ["theme", "topic"], "topic_summary", "n_documents"
    )

    # -- step 4b: company-level issue summaries per (entity, topic) +
    # the TWO assessor passes (risk magnitude, uncertainty) over the
    # SUMMARY table — each a bounded label stage, ints per A13
    df_by_company = _summaries(
        news_labeled, ["entity_name", "topic"], "topic_summary", "n_documents"
    )
    risk_score = _score_map(RISK_LEVELS)
    unc_score = _score_map(UNCERTAINTY_LEVELS)
    assessed = (
        llm_label_stage(
            df_by_company,
            make_choice_backend(list(RISK_LEVELS), salt="risk"),
            key_cols=("entity_name", "topic"),
            text_col="topic_summary",
            guardrail=False,
        )
        .withColumnRenamed("label", "risk_magnitude")
        .withColumnRenamed("motivation", "risk_summary")
    )
    assessed = (
        llm_label_stage(
            assessed,
            make_choice_backend(list(UNCERTAINTY_LEVELS), salt="uncertainty"),
            key_cols=("entity_name", "topic"),
            text_col="topic_summary",
            guardrail=False,
        )
        .withColumnRenamed("label", "uncertainty")
        .withColumnRenamed("motivation", "uncertainty_explanation")
        .withColumn("risk_score", risk_score(F.col("risk_magnitude")))
        .withColumn("uncertainty_score", unc_score(F.col("uncertainty")))
    )

    # -- step 5: mitigation extraction — filings+transcripts first,
    # news as the fallback (J10 coalesce, report_generator.py:426-470)
    ft_resp = _summaries(
        ft_labeled,
        ["entity_name", "topic"],
        "filings_response_summary",
        "filings_n_response_documents",
    )
    news_resp = _summaries(
        news_labeled,
        ["entity_name", "topic"],
        "news_response_summary",
        "news_n_response_documents",
    )
    df_final = (
        assessed.join(ft_resp, ["entity_name", "topic"], "left")
        .join(news_resp, ["entity_name", "topic"], "left")
        .withColumn(
            "response_summary",
            F.coalesce("filings_response_summary", "news_response_summary"),
        )
        .withColumn(
            "n_response_documents",
            F.when(
                F.col("filings_response_summary").isNotNull(),
                F.col("filings_n_response_documents"),
            ).otherwise(F.col("news_n_response_documents")),
        )
    )

    # -- step 6a: prepare_data_report_0's three criterion boxes — top-1
    # per entity by volume / risk / uncertainty (W1 with tiebreaks)
    criteria = [
        ("1. Most Reported Issue", "topic_summary",
         [F.col("n_documents").desc(), F.col("topic").asc()]),
        ("2. Biggest Risk", "risk_summary",
         [F.col("risk_score").desc(), F.col("n_documents").desc(),
          F.col("topic").asc()]),
        ("3. Most Uncertain Issue", "uncertainty_explanation",
         [F.col("uncertainty_score").desc(), F.col("n_documents").desc(),
          F.col("topic").asc()]),
    ]
    tops = None
    for criterion, headline_col, order in criteria:
        t = topk_per_group(df_final, ["entity_name"], order, k=1).select(
            "entity_name",
            "topic",
            F.col(headline_col).alias("headline"),
            "n_documents",
            F.lit(criterion).alias("criterion"),
        )
        tops = t if tops is None else tops.unionByName(t)

    # -- step 6b: the rendered report (reference html_report.py layout)
    html_path = os.path.join(out_dir, "regulatory_issues_report.html")
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(
            _render_report(
                f"{THEME} Report",
                [r.asDict() for r in df_by_theme.orderBy("theme", "topic").collect()],
                [r.asDict() for r in tops.orderBy("entity_name", "criterion").collect()],
                [
                    r.asDict()
                    for r in df_final.select(
                        "entity_name", "topic", "response_summary"
                    ).orderBy("entity_name", "topic").collect()
                ],
            )
        )

    # -- the scored scatter: media attention vs risk, bubble size =
    # uncertainty (the Risk_Analyzer-style view of the same table)
    scatter = scatter_spec(
        df_final.select(
            "entity_name", "topic", "n_documents",
            "risk_score", "uncertainty_score",
        ),
        x="n_documents",
        y="risk_score",
        size="uncertainty_score",
        group="entity_name",
        tooltip=["entity_name", "topic"],
        title="Media attention vs risk by (company, issue)",
    )
    dash_path = os.path.join(out_dir, "risk_scatter.html")
    with open(dash_path, "w", encoding="utf-8") as f:
        f.write(
            dashboard_html(
                {"Risk vs attention": scatter},
                title=f"{THEME}: scored issues",
            )
        )

    # -- export: the reference's stage checkpoints, as one workbook
    xlsx_path = os.path.join(out_dir, "regulatory_issues_results.xlsx")
    workbook_xlsx_sink(
        {
            "Issues by Theme": df_by_theme.orderBy("theme", "topic"),
            "Issues by Company": df_final.select(
                "entity_name", "topic", "topic_summary", "n_documents",
                "risk_magnitude", "risk_score", "risk_summary",
                "uncertainty", "uncertainty_score", "uncertainty_explanation",
                "response_summary", "n_response_documents",
            ).orderBy("entity_name", "topic"),
            "Top Issues": tops.orderBy("entity_name", "criterion"),
        },
        xlsx_path,
    )
    return {"html": html_path, "dashboard": dash_path, "xlsx": xlsx_path}


if __name__ == "__main__":
    from bigdata_cookbook_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "output/regulatory_issues"
    paths = main(get_spark("regulatory-issues-example"), out)
    for k, v in paths.items():
        print(f"{k}: {v}")
