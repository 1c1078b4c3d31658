"""Runnable migration example: the reference Thematic Screener notebook
(`Thematic_Screener/ThematicScreener.ipynb`), cell for cell, on this
engine — MIGRATION.md's "Whole workflows" row made executable.

Reference flow -> engine flow (cell numbers from the notebook):

    cell 16  Bigdata(user, pass) client           -> a SparkSession over parquet tables
    cell 18  theme definition                     -> THEME + theme labels below
    cell 20  generate_theme_tree(...)             -> llm.taxonomy.generate_theme_tree
    cell 22  theme_tree.get_summaries()           -> taxonomy.leaf_labels / leaf_summaries
    cell 24  search: date ranges + similarity     -> QuerySpec(Similarity(...), DateRange(...))
             over the remote search service          compiled against unified_chunk_frame
    cells 27-28  ScreenerLabeler.get_labels       -> workflows.thematic_screener
             + df merge/postprocess                  (normalize -> llm_label_stage -> pivots)
    cell 30  df_company / df_industry             -> out["by_company"] / out["by_industry"]
    cell 31  display_figures_cookbooks(df_company) -> viz.bar_chart_spec
             (plotly figure)                          (Vega-Lite v5 JSON)
    cell 32  display(HTML(...))                   -> sinks.html_report
    cell 34  Excel export                         -> sinks.workbook_xlsx_sink

The LLM boundary runs the deterministic stub backend (llm/stub.py) so
the example executes hermetically on the committed fixtures and its
outputs are byte-stable (tests/test_examples.py runs it twice and
compares bytes). To run against a live model, swap ``stub_backend`` for
``llm.openai_backend.make_openai_backend()`` — every other line stays
the same.

Run:  python examples/thematic_screener_migration.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.stub import stub_backend
from bigdata_cookbook_spark.llm.taxonomy import (
    generate_theme_tree,
    leaf_labels,
    leaf_summaries,
)
from bigdata_cookbook_spark.query.algebra import (
    DateRange,
    QuerySpec,
    Similarity,
    run_search,
    unified_chunk_frame,
)
from bigdata_cookbook_spark.sinks import html_report, workbook_xlsx_sink
from bigdata_cookbook_spark.sources.fixtures import fixture_tables
from bigdata_cookbook_spark.workflows import thematic_screener

# ===== Theme definition (notebook cell 18) =====
THEME = "AI Cost Reduction"
START, END = "2024-01-01", "2024-12-31"
RERANK_THRESHOLD = 0.1  # notebook: rerank_threshold on the Similarity query


def main(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Execute the screener end-to-end; returns {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)

    # -- corpus: the committed fixture tables stand in for the remote
    # search service's index (entities / documents / chunks)
    entities, documents, chunks = fixture_tables(spark)

    # -- embedding production (the reference embeds server-side,
    # invisibly — Election_Monitor/src/query_builder.py:59-82; a
    # migrating user must produce the corpus embedding column
    # themselves). Drop the fixture's precomputed column and rebuild it
    # with the embedding backend so this example is copy-pasteable on a
    # corpus with NO embedding column: each unique chunk text is
    # embedded once (dedup -> mapInPandas -> join-back), and the SAME
    # backend embeds the query sentences below. Stub tier here
    # (deterministic, hermetic); for a live model swap in
    # make_openai_embedding_backend() — every other line stays the same.
    from bigdata_cookbook_spark.llm.embedding_backend import (
        embed_stage,
        make_hash_embedding_backend,
    )

    emb_backend = make_hash_embedding_backend(dim=16)
    chunks = embed_stage(chunks.drop("embedding"), emb_backend)

    # -- cell 20/22: mindmap the theme into a taxonomy; its leaf
    # summaries become the per-sub-theme search sentences
    tree = generate_theme_tree(THEME)  # stub TreeBackend: deterministic
    labels = leaf_labels(tree)
    summaries = leaf_summaries(tree)

    # -- cell 24: one similarity query per sub-theme over the date
    # window. The reference pushes these to the search API in entity
    # batches; here each spec is a filtered branch of ONE DataFrame
    # plan, and the whole watchlist joins at once (MIGRATION.md Q7).
    frame = unified_chunk_frame(documents, chunks)
    # query-side embedding uses the SAME backend as the corpus column
    # above (one text, embedded once at plan build — never per row)
    specs = [
        QuerySpec(
            query_id=label,
            similarity=Similarity(
                sentence, embedder=lambda t, d: emb_backend([t])[0]
            ),
            filters=(DateRange(START, END),),
            rerank_threshold=RERANK_THRESHOLD,
        )
        for label, sentence in zip(labels, summaries)
    ]
    hits = run_search(frame, specs)

    # -- cells 27-28: normalize + label + assess exposure. The workflow
    # recomposes the notebook's ScreenerLabeler + pandas post-processing
    # as one lazy plan: chunk-explode normalization, dedup'd LLM label
    # stage, and the company/industry score pivots with composite.
    out = thematic_screener(
        documents,
        chunks.join(hits.select("sentence_id").distinct(), "sentence_id", "left_semi"),
        entities,
        theme_labels=["P", "A", "N"],
        backend=stub_backend,
    )
    by_company = out["by_company"].orderBy(
        F.col("composite_score").desc(), "entity_name"
    )
    by_industry = out["by_industry"].orderBy(
        F.col("composite_score").desc(), "entity_industry"
    )

    # -- cell 31: the exposure figure, as a renderer-agnostic Vega-Lite
    # spec (the notebook's plotly bar chart of company composite scores)
    import json

    from bigdata_cookbook_spark.viz import bar_chart_spec

    spec = bar_chart_spec(
        by_company.limit(25),
        category="entity_name",
        value="composite_score",
        group="entity_sector",
        stacked=True,
        title=f"Top thematic exposure: {THEME}",
    )
    spec_path = os.path.join(out_dir, "exposure_chart.vl.json")
    with open(spec_path, "w", encoding="utf-8") as f:
        json.dump(spec, f, indent=1, sort_keys=True)

    # -- cell 32: HTML exposure report (one section per sector)
    html_path = os.path.join(out_dir, "thematic_exposure.html")
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(
            html_report(
                by_company,
                group_col="entity_sector",
                title=f"Thematic exposure: {THEME}",
                body_cols=["entity_name", "P", "A", "N", "composite_score"],
                heading_col="entity_name",
            )
        )

    # -- cell 34: Excel export (real multi-sheet .xlsx, stdlib OOXML)
    xlsx_path = os.path.join(out_dir, "thematic_screener.xlsx")
    workbook_xlsx_sink(
        {"By Company": by_company, "By Industry": by_industry}, xlsx_path
    )

    # -- cells 20+31 rendered together: one static dashboard page — the
    # notebook's plotly figures + mind map as a self-contained HTML file
    # (CDN-rendered Vega-Lite + nested-list tree; sinks.dashboard_html)
    from bigdata_cookbook_spark.llm.taxonomy import tree_to_edges
    from bigdata_cookbook_spark.sinks import dashboard_html
    from bigdata_cookbook_spark.viz import tree_json

    edges = tree_to_edges(spark, tree)

    # the Risk_Analyzer top-themes bubble (tool.py:221-350): melt the
    # per-company label pivot to rows and put the score on the size
    # channel — x=company, y=label, bubble area = exposure
    from bigdata_cookbook_spark.viz import scatter_spec

    melted = by_company.limit(10).selectExpr(
        "entity_name", "stack(3, 'P', P, 'A', A, 'N', N) as (label, score)"
    ).filter("score > 0")
    bubble = scatter_spec(
        melted,
        x="entity_name",
        y="label",
        size="score",
        group="entity_name",
        title="Top label exposure per company",
    )

    dash_path = os.path.join(out_dir, "dashboard.html")
    with open(dash_path, "w", encoding="utf-8") as f:
        f.write(
            dashboard_html(
                {
                    "Company exposure": spec,
                    "Industry exposure": bar_chart_spec(
                        by_industry.limit(15),
                        category="entity_industry",
                        value="composite_score",
                    ),
                    "Label exposure bubbles": bubble,
                    "Theme taxonomy": tree_json(
                        edges, root_label=tree["Label"]
                    ),
                },
                title=f"Thematic screener: {THEME}",
            )
        )
    return {
        "html": html_path,
        "xlsx": xlsx_path,
        "chart": spec_path,
        "dashboard": dash_path,
    }


if __name__ == "__main__":
    from bigdata_cookbook_spark.session import get_spark

    dest = sys.argv[1] if len(sys.argv) > 1 else "out/thematic_screener"
    session = get_spark("thematic-screener-example")
    session.sparkContext.setLogLevel("ERROR")
    paths = main(session, dest)
    for name, p in paths.items():
        print(f"{name}: {p}")
