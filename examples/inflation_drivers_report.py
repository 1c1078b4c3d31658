"""Runnable migration example: the reference Tracking_Inflation_Drivers
notebook (`Tracking_Inflation_Drivers/Tracking_Inflation_Drivers.ipynb`),
cell for cell, on this engine — SURVEY.md §3.3 made executable (the
macro-theme-tracking workflow: taxonomy -> search -> label -> map-reduce
summarize per topic -> driver-tag -> intro reduce -> HTML report).

Reference flow -> engine flow (cell numbers from the notebook):

    cell 14  Bigdata(user, pass) client        -> a SparkSession over parquet tables
    cell 16  theme/focus/date config           -> THEME/START/END below
    cell 19  generate_theme_tree(main_theme,   -> llm.taxonomy.generate_theme_tree;
             focus) + get_summaries()             leaf_summaries = the query
             + get_label_to_parent_mapping()      sentences, label_to_parent = the
                                                  leaf->theme rollup map
    cell 22  search_by_any(sentences, dates)   -> one QuerySpec(Similarity, DateRange)
             via the remote search service        per leaf over unified_chunk_frame
    cell 24  ScreenerLabeler.get_labels over   -> normalize_screening ->
             masked_text + merge                  llm_label_stage (leaf-label backend)
    cell 25  drop 'Not Applicable', map label  -> filter + broadcast map literal
             -> theme                             (the taxonomy is tiny by contract)
    cell 27  summarize_topic_by_theme          -> llm.summarize.hierarchical_summarize
             (TokenManager chunking + per-        keyed on (theme, topic): relational
             chunk LLM + reduce, driver loop      token packing + one applyInPandas per
             over theme x topic,                  tree level — every (theme, topic)
             summarize.py:62-126)                 reduces in parallel, no driver loop;
                                                  n_documents = countDistinct(doc id)
    cell 29  driver-tag prompt over each       -> llm_label_stage on the summary table
             topic summary (L8)                   (keys=(theme, topic)), one of the five
                                                  notebook driver tags per topic
    cell 31  create_intro_section              -> llm.summarize.reduce_summaries —
             (summarize.py:129-219)               driver-side by design: the input is
                                                  one row per topic, bounded by the
                                                  taxonomy size, never by the corpus
    cell 31  create_html_report                -> sinks.html_report(intro=...) —
             (summarize.py:222-285: h1 theme,     same structure: h1 title, intro <p>,
             intro <p>, h2 per driver group,      h2 per driver-tag group, one block
             one <p> per topic summary)           per (theme, topic) summary
    cell 33  ExcelManager.save_workbook        -> sinks.workbook_xlsx_sink (3 sheets)

The LLM boundary runs deterministic stubs (leaf labeler, driver tagger,
stub_summarizer) so the example executes hermetically on the committed
fixtures and its outputs are byte-stable (tests/test_examples.py runs it
twice and compares bytes). To run against a live model, swap the stubs
for llm.openai_backend.make_openai_backend() / a real SummarizeBackend —
every other line stays the same.

Scale notes (the 100 TB story): search/normalize/label/summarize are all
lazy DataFrame stages — the only collects are (a) the per-topic summary
table for the intro reduce and the HTML sink, bounded by the TAXONOMY
size (#themes x #topics), and (b) nothing else. The reference's driver
loop over theme x topic (summarize.py:76-124) is replaced by one
cluster-parallel map-reduce keyed on (theme, topic).

Run:  python examples/inflation_drivers_report.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.summarize import (
    hierarchical_summarize,
    reduce_summaries,
    stub_summarizer,
)
from bigdata_cookbook_spark.llm.stage import llm_label_stage
from bigdata_cookbook_spark.llm.taxonomy import (
    generate_theme_tree,
    label_to_parent,
    leaf_labels,
    leaf_summaries,
    tree_to_edges,
)
from bigdata_cookbook_spark.operators.normalize import normalize_screening
from bigdata_cookbook_spark.query.algebra import (
    DateRange,
    QuerySpec,
    Similarity,
    run_search,
    unified_chunk_frame,
)
from bigdata_cookbook_spark.llm.stub import make_choice_backend
from bigdata_cookbook_spark.sinks import html_report, workbook_xlsx_sink
from bigdata_cookbook_spark.sources.fixtures import fixture_tables

# ===== Theme definition (notebook cell 16) =====
THEME = "United States Inflation"
START, END = "2024-01-01", "2024-12-31"

# ===== Driver tags (notebook cell 29, verbatim semantic constants) =====
DRIVER_TAGS = [
    "Demand-pull",
    "Cost-push",
    "Wage increases",
    "Global factors",
    "Monetary policy",
]


def main(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Execute the inflation-drivers report end-to-end; returns
    {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)

    # -- corpus: the committed fixture tables stand in for the remote
    # search service's index (entities / documents / chunks)
    entities, documents, chunks = fixture_tables(spark)

    # -- embedding production (same contract as the thematic screener
    # example: the reference embeds server-side; a migrating user
    # rebuilds the corpus embedding column with the pluggable backend)
    from bigdata_cookbook_spark.llm.embedding_backend import (
        embed_stage,
        make_hash_embedding_backend,
    )

    emb_backend = make_hash_embedding_backend(dim=16)
    chunks = embed_stage(chunks.drop("embedding"), emb_backend)

    # -- cell 19: taxonomy; leaves are the search sentences, the
    # label->parent map rolls topics up to themes in cell 25
    tree = generate_theme_tree(THEME)
    labels = leaf_labels(tree)
    sentences = leaf_summaries(tree)
    l2p = label_to_parent(tree)

    # -- cell 22: one similarity query per taxonomy leaf over the date
    # window (search_by_any's open discovery — no watchlist)
    frame = unified_chunk_frame(documents, chunks)
    specs = [
        QuerySpec(
            query_id=label,
            similarity=Similarity(
                sentence, embedder=lambda t, d: emb_backend([t])[0]
            ),
            filters=(DateRange(START, END),),
        )
        for label, sentence in zip(labels, sentences)
    ]
    hits = run_search(frame, specs)

    # -- cell 24: normalize + leaf-label the hit chunks (ScreenerLabeler
    # over masked_text; dedup'd label stage, one call per unique pair)
    screening = normalize_screening(
        documents,
        chunks.join(hits.select("sentence_id").distinct(), "sentence_id", "left_semi"),
        entities,
        mode="discovery",
    )
    # ScreenerLabeler stub: hash-bucket into the taxonomy's terminal
    # labels + 'Not Applicable' (one bucket, so the cell-25 drop path is
    # always exercised); lives in llm.stub so executors can import it
    leaf_labeler = make_choice_backend([*labels, "Not Applicable"], salt="leaf")
    labeled = llm_label_stage(screening, leaf_labeler, guardrail=False)

    # -- cell 25: drop non-assignments, map leaf label -> parent theme.
    # The taxonomy is tiny by contract, so the map is a broadcast-free
    # literal expression (no join, no shuffle).
    theme_map = F.create_map(
        *[F.lit(x) for pair in sorted(l2p.items()) for x in pair]
    )
    df_labeled = (
        labeled.filter(
            ~F.col("label").isin("", "Not Applicable", "unassigned", "unclear")
        )
        .withColumnRenamed("label", "topic")
        .withColumn("theme", theme_map[F.col("topic")])
    )

    # -- cell 27: per-(theme, topic) map-reduce summaries with document
    # counts — the reference's summarize_topic_by_theme driver loop as
    # ONE parallel hierarchical reduce
    df_summaries = (
        hierarchical_summarize(
            df_labeled,
            keys=["theme", "topic"],
            text_col="masked_text",
            doc_col="document_id",
            backend=stub_summarizer,
        )
        .withColumnRenamed("summary", "topic_summary")
    )

    # -- cell 29: driver-tag each topic summary (L8 — the same dedup'd
    # label-stage combinator, keyed on the summary table's key)
    df_tagged = (
        llm_label_stage(
            df_summaries,
            make_choice_backend(DRIVER_TAGS, salt="driver"),
            key_cols=("theme", "topic"),
            text_col="topic_summary",
            guardrail=False,
        )
        .withColumnRenamed("label", "driver_tag")
        .withColumnRenamed("motivation", "tag_rationale")
    )

    # -- cell 31a: intro section — reduce the per-topic summaries into
    # one overview. Driver-side by design: one row per (theme, topic),
    # bounded by the taxonomy, never by the corpus.
    topic_rows = df_tagged.orderBy("theme", "topic").collect()
    intro = reduce_summaries(
        [r.topic_summary for r in topic_rows], backend=stub_summarizer
    )

    # -- cell 31b/32: the HTML report, reference structure
    # (summarize.py:222-285): h1 theme, intro <p>, one <h2> per driver
    # group, one block per (theme, topic) summary
    html_path = os.path.join(out_dir, "inflation_drivers_report.html")
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(
            html_report(
                df_tagged,
                group_col="driver_tag",
                title=f"{THEME} Report",
                body_cols=["theme", "topic", "topic_summary", "n_documents"],
                heading_col="topic",
                intro=f"Report from {START} to {END}. {intro}",
            )
        )

    # -- cell 33: Excel export, the notebook's three sheets
    xlsx_path = os.path.join(out_dir, "inflation_analysis_results.xlsx")
    workbook_xlsx_sink(
        {
            "Labeled Inflation Data": df_labeled.select(
                "document_id", "sentence_id", "entity_name", "theme",
                "topic", "masked_text",
            ).orderBy("sentence_id", "entity_name"),
            "Topic Summaries": df_summaries.orderBy("theme", "topic"),
            "Final Tagged Report": df_tagged.orderBy("theme", "topic"),
        },
        xlsx_path,
    )

    # -- cell 19's theme_tree.visualize() + a volume panel, as the
    # engine's static dashboard (CDN Vega-Lite + nested-list mind map)
    import json

    from bigdata_cookbook_spark.sinks import dashboard_html
    from bigdata_cookbook_spark.viz import bar_chart_spec, tree_json

    volumes = bar_chart_spec(
        df_tagged.select("topic", "n_documents", "driver_tag"),
        category="topic",
        value="n_documents",
        group="driver_tag",
        title="Documents per topic",
    )
    dash_path = os.path.join(out_dir, "dashboard.html")
    with open(dash_path, "w", encoding="utf-8") as f:
        f.write(
            dashboard_html(
                {
                    "Topic volumes": volumes,
                    "Theme taxonomy": tree_json(
                        tree_to_edges(spark, tree), root_label=tree["Label"]
                    ),
                },
                title=f"Tracking drivers: {THEME}",
            )
        )

    spec_path = os.path.join(out_dir, "topic_volumes.vl.json")
    with open(spec_path, "w", encoding="utf-8") as f:
        json.dump(volumes, f, indent=1, sort_keys=True)

    return {
        "html": html_path,
        "xlsx": xlsx_path,
        "dashboard": dash_path,
        "chart": spec_path,
    }


if __name__ == "__main__":
    from bigdata_cookbook_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "output/inflation_drivers"
    paths = main(get_spark("inflation-drivers-example"), out)
    for k, v in paths.items():
        print(f"{k}: {v}")
