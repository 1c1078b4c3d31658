"""Runnable network-monitor example: the reference Election Monitor's
network figures (`Election_Monitor/src/network_analysis.py:129-201`,
`Election_Monitor/src/visualization_tools.py:500-570,573-695`) on this
engine — the co-mention node-link graph, the company-topic bipartite
graph, the weekly net-exposure time series, and the top-companies bar
chart, all emitted into one static dashboard page.

Reference flow -> engine flow:

    network_analysis.get_network_df (pandas row loop
      over co-mentions)                    -> workflows.dual_role_analysis
                                              (normalize -> label -> J8
                                              self-join co_mention_pairs)
    visualization_tools.create_network_figure
      (networkx spring layout + plotly)    -> viz.node_link_json +
                                              sinks.dashboard_html
                                              (d3-force, client-side)
    visualization_tools.create_bipartite_figure
      (company-topic edges, label colors)  -> graph.company_topic_bipartite
                                              -> viz.node_link_json(groups)
    visualization_tools. weekly exposure
      time series (plotly line)            -> viz.timeseries_spec
    top companies per sector bar           -> viz.bar_chart_spec
    (plotly write_html per figure)         -> ONE sinks.dashboard_html page
                                              + a Graphviz DOT export of the
                                              co-mention network

The LLM boundary runs the deterministic stub backend (llm/stub.py) so
the example is hermetic and byte-stable (tests/test_examples.py runs it
twice and compares bytes). Swap ``stub_backend`` for
``llm.openai_backend.make_openai_backend()`` for a live model.

Run:  python examples/election_network_monitor.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigdata_cookbook_spark.llm.stub import stub_backend
from bigdata_cookbook_spark.operators.graph import company_topic_bipartite
from bigdata_cookbook_spark.sinks import dashboard_html, graph_dot
from bigdata_cookbook_spark.sources.fixtures import fixture_tables
from bigdata_cookbook_spark.viz import (
    bar_chart_spec,
    node_link_json,
    timeseries_with_overview_spec,
    with_series_selector,
)
from bigdata_cookbook_spark.workflows import dual_role_analysis


def main(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Execute the network monitor end-to-end; returns {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)

    entities, documents, chunks = fixture_tables(spark)

    # -- §3.2 dual-role workflow: normalize -> stub-label -> split ->
    # top-per-sector (W1) + weekly net exposure (J9+A12) + co-mention
    # network (J8). One pass produces every frame the figures need.
    out = dual_role_analysis(documents, chunks, entities, stub_backend)

    # -- co-mention node-link graph (network_analysis.py:129-201):
    # provider x user edges within a chunk, weight = co-mention count.
    network = out["network"]
    net_spec = node_link_json(network)  # src_name/dst_name/weight defaults

    # -- company-topic bipartite (visualization_tools.py:573-695):
    # explode topics, drop COMP-typed, majority label per edge colors
    # the topic side like the reference's label-colored nodes.
    bipartite = company_topic_bipartite(out["labeled"]).withColumn(
        "side", F.lit("company")
    )
    bi_spec = node_link_json(
        bipartite,
        src="entity_name",
        dst="topic",
        weight="weight",
        src_group="side",
        dst_group="majority_label",
    )

    # -- weekly net-exposure time series for the busiest entities
    # (visualization_tools.py:500-570's media-attention lines). Bound
    # the series count the way the reference's dropdown does: top 5
    # entities by total activity.
    weekly = out["weekly_net"]
    top_entities = [
        r["entity_name"]
        for r in weekly.groupBy("entity_name")
        .agg(F.sum(F.col("pos_cnt") + F.col("neg_cnt")).alias("activity"))
        .orderBy(F.col("activity").desc(), "entity_name")
        .limit(5)
        .collect()
    ]
    # overview strip + brush = the reference's plotly x-axis rangeslider
    ts_spec = timeseries_with_overview_spec(
        weekly.filter(F.col("entity_name").isin(top_entities)).select(
            "week", "net_exposure", "entity_name"
        ),
        x="week",
        y="net_exposure",
        series="entity_name",
        title="Weekly net exposure (top 5 entities)",
    )

    # -- top companies per sector (provider role), the screener bar,
    # with the reference's sector dropdown (plotly updatemenus twin).
    bar_spec = with_series_selector(
        bar_chart_spec(
            out["top_by_sector"],
            category="entity_name",
            value="n_hits",
            group="entity_sector",
            title="Top provider companies per sector",
        ),
        "entity_sector",
        label="Sector: ",
    )

    dash_path = os.path.join(out_dir, "network_dashboard.html")
    with open(dash_path, "w", encoding="utf-8") as f:
        f.write(
            dashboard_html(
                {
                    "Co-mention network (provider x user)": net_spec,
                    "Company-topic bipartite": bi_spec,
                    "Weekly net exposure": ts_spec,
                    "Top providers per sector": bar_spec,
                },
                title="Election Monitor — network dashboard",
            )
        )

    # -- renderer-agnostic DOT export of the co-mention network (any
    # Graphviz layout engine consumes it; the engine twin of handing
    # the networkx graph to a different renderer).
    dot_path = os.path.join(out_dir, "co_mention_network.dot")
    with open(dot_path, "w", encoding="utf-8") as f:
        f.write(graph_dot(network, "src_name", "dst_name", weight_col="weight"))

    return {"dashboard": dash_path, "dot": dot_path}


if __name__ == "__main__":
    from bigdata_cookbook_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "out/election_network"
    paths = main(get_spark("election-network-monitor"), out_dir)
    for k, v in paths.items():
        print(f"{k}: {v}")
