"""Figure-spec sinks (viz.py): Vega-Lite v5 specs, d3 node-link JSON,
mind-map tree JSON — structure, type inference, determinism, and parity
with the operators that feed them."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.viz import (
    bar_chart_spec,
    heatmap_spec,
    node_link_json,
    timeseries_spec,
    tree_json,
    vega_lite_spec,
)


@pytest.fixture()
def weekly(spark):
    return spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), "P", 10),
            (datetime.date(2024, 1, 8), "P", 13),
            (datetime.date(2024, 1, 1), "N", 4),
            (datetime.date(2024, 1, 8), "N", 6),
        ],
        "week date, label string, cnt long",
    )


def test_timeseries_spec_types_and_determinism(weekly):
    s1 = timeseries_spec(weekly, "week", "cnt", series="label", title="vol")
    s2 = timeseries_spec(weekly, "week", "cnt", series="label", title="vol")
    assert json.dumps(s1, sort_keys=True) == json.dumps(s2, sort_keys=True)
    assert s1["$schema"].endswith("v5.json")
    assert s1["mark"] == {"type": "line"}
    assert s1["encoding"]["x"] == {"field": "week", "type": "temporal"}
    assert s1["encoding"]["y"] == {"field": "cnt", "type": "quantitative"}
    assert s1["encoding"]["color"] == {"field": "label", "type": "nominal"}
    assert len(s1["data"]["values"]) == 4
    assert s1["data"]["values"][0]["week"] == "2024-01-01"  # json-safe
    json.dumps(s1)  # fully serializable


def test_bar_grouped_vs_stacked(weekly):
    grouped = bar_chart_spec(weekly, "label", "cnt", group="label")
    assert grouped["encoding"]["xOffset"] == {"field": "label"}
    stacked = bar_chart_spec(weekly, "label", "cnt", group="label", stacked=True)
    assert "xOffset" not in stacked["encoding"]


def test_heatmap_quantitative_color(weekly):
    s = heatmap_spec(weekly, "week", "label", "cnt")
    assert s["mark"] == {"type": "rect"}
    assert s["encoding"]["color"] == {"field": "cnt", "type": "quantitative"}


def test_vega_lite_unknown_column_raises(weekly):
    with pytest.raises(KeyError):
        vega_lite_spec(weekly, "bar", "nope", "cnt")


def test_node_link_from_comention_edges(spark):
    """Weighted degree == sum of incident edge weights; deterministic
    ordering; groups carried per side (bipartite company/topic shape)."""
    edges = spark.createDataFrame(
        [
            ("acme", "ai", 3, "COMP", "TOPI"),
            ("acme", "cloud", 2, "COMP", "TOPI"),
            ("bolt", "ai", 1, "COMP", "TOPI"),
        ],
        "src_name string, dst_name string, weight long, st string, dt string",
    )
    g = node_link_json(edges, src_group="st", dst_group="dt")
    by_id = {n["id"]: n for n in g["nodes"]}
    assert by_id["acme"]["size"] == 5.0 and by_id["acme"]["group"] == "COMP"
    assert by_id["ai"]["size"] == 4.0 and by_id["ai"]["group"] == "TOPI"
    assert [l["source"] for l in g["links"]] == ["acme", "acme", "bolt"]
    json.dumps(g)


def test_series_selector_param_filters_and_is_deterministic(weekly):
    """with_series_selector: a bound <select> param + filter transform
    over the spec's own inlined data; options sorted/deduped with a
    blank show-all first entry; input spec not mutated; concat specs
    rejected (VL top-level transforms don't reach concat children)."""
    from bigdata_cookbook_spark.viz import timeseries_spec, with_series_selector

    base = timeseries_spec(weekly, x="week", y="cnt", series="label")
    spec = with_series_selector(base, "label")
    assert "params" not in base and "transform" not in base  # no mutation
    (param,) = spec["params"]
    assert param["select"] == {"type": "point", "fields": ["label"]}
    opts = param["bind"]["options"]
    assert opts[0] is None and opts[1:] == sorted(set(opts[1:]))
    assert {"filter": {"param": "series_sel"}} in spec["transform"]
    json.dumps(spec)

    with pytest.raises(ValueError):
        with_series_selector({"vconcat": [], "data": {"values": []}}, "x")


def test_timeseries_overview_brush_drives_detail_domain(weekly):
    """timeseries_with_overview_spec: vconcat detail+overview where the
    overview carries an x-interval brush and the detail's x-scale
    domain binds to it — the rangeslider twin. Data inlined once."""
    from bigdata_cookbook_spark.viz import timeseries_with_overview_spec

    spec = timeseries_with_overview_spec(
        weekly, x="week", y="cnt", series="label", title="t"
    )
    detail, overview = spec["vconcat"]
    assert detail["encoding"]["x"]["scale"] == {"domain": {"param": "brush"}}
    (brush,) = overview["params"]
    assert brush["name"] == "brush"
    assert brush["select"] == {"type": "interval", "encodings": ["x"]}
    assert "data" in spec and "data" not in detail and "data" not in overview
    assert spec["data"]["values"]  # inlined rows present
    json.dumps(spec)


def test_node_link_conflicting_groups_resolve_in_sorted_edge_order(spark):
    """A node whose incident edges carry DIFFERENT group values gets the
    group from its first edge in sorted (src, dst) order — not Spark's
    partition-arrival order. Pinned because the election-network
    dashboard's bipartite panel (topic nodes with per-company majority
    labels) was byte-unstable before this contract existed."""
    rows = [("zeta", "ai", 1, "N"), ("acme", "ai", 1, "P"), ("mid", "ai", 1, "A")]
    schema = "src_name string, dst_name string, weight long, lbl string"
    # shuffle physical row order across partitions; result must not move
    for parts in (1, 3):
        edges = spark.createDataFrame(rows, schema).repartition(parts)
        g = node_link_json(edges, dst_group="lbl")
        by_id = {n["id"]: n for n in g["nodes"]}
        assert by_id["ai"]["group"] == "P"  # acme sorts first


def test_tree_json_roundtrips_taxonomy(spark):
    """taxonomy tree -> edge frame -> nested JSON reproduces the tree's
    parent/child structure exactly."""
    from bigdata_cookbook_spark.llm.taxonomy import (
        generate_theme_tree,
        tree_to_edges,
    )

    tree = generate_theme_tree("AI Cost Reduction")
    edges = tree_to_edges(spark, tree)
    nested = tree_json(edges, root_label=tree["Label"])

    def labels(node, out):
        out.add(node["label"])
        for c in node.get("children", []):
            labels(c, out)
        return out

    def ref_labels(node, out):
        out.add(node["Label"])
        for c in node.get("Children") or []:
            ref_labels(c, out)
        return out

    assert labels(nested, set()) == ref_labels(tree, set())
    # children of the root match the reference tree's first level
    want = sorted(c["Label"] for c in tree["Children"])
    assert [c["label"] for c in nested["children"]] == want


def test_tree_json_detects_bad_root(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "parent_label string, child_label string"
    )
    with pytest.raises(ValueError, match="not a root"):
        tree_json(edges, root_label="b")


def test_specs_over_real_workflow_outputs(spark, sf_dir):
    """End-to-end: the engine's own analytics frames feed the spec sinks
    without adaptation — weekly event counts to a line spec, top-k parts
    to a bar spec."""
    from bigdata_cookbook_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.groupBy(F.date_trunc("week", "ts").cast("date").alias("week"), "event_type")
        .count()
    )
    s = timeseries_spec(weekly, "week", "count", series="event_type")
    assert s["encoding"]["x"]["type"] == "temporal"
    assert len(s["data"]["values"]) == weekly.count()


def test_dashboard_html_byte_stable_and_structured(spark, weekly):
    """dashboard_html: one static page embedding Vega-Lite panels (CDN
    vega-embed), a d3-force node-link graph, and a nested-list tree —
    byte-stable, all data inline, panel markup per spec kind."""
    from bigdata_cookbook_spark.sinks import dashboard_html

    bar = bar_chart_spec(weekly, "label", "cnt")
    ts = timeseries_spec(weekly, "week", "cnt", series="label")
    edges = spark.createDataFrame(
        [("acme", "ai", 3), ("bolt", "ai", 1)],
        "src_name string, dst_name string, weight long",
    )
    net = node_link_json(edges)
    tree = {
        "label": "root <x>",
        "children": [
            {"label": "a", "children": []},
            {"label": "b", "children": [{"label": "c", "children": []}]},
        ],
    }
    panels = {"Bar & <co>": bar, "Trend": ts, "Network": net, "Map": tree}
    h1 = dashboard_html(panels, title="Run <dash>")
    h2 = dashboard_html(panels, title="Run <dash>")
    assert h1 == h2
    assert h1.count("class='panel'") == 4
    # vega panels render via vegaEmbed with inline data
    assert "vegaEmbed('#panel0'" in h1 and "vegaEmbed('#panel1'" in h1
    assert '"values":' in h1
    # node-link renders via d3-force, tree as nested list (no JS)
    assert "forceSimulation" in h1
    assert "<ul class='tree'>" in h1
    # titles/labels HTML-escaped
    assert "Run &lt;dash&gt;" in h1 and "Bar &amp; &lt;co&gt;" in h1
    assert "root &lt;x&gt;" in h1
    # self-contained page: CDN script tags only, no local assets
    assert h1.startswith("<!DOCTYPE html>")
    assert "cdn.jsdelivr.net/npm/vega-embed@6" in h1


def test_dashboard_html_script_injection_escaped(spark):
    """A corpus-derived string containing '</script>' inside a spec must
    not terminate the inline <script> block: all '<' in embedded JSON are
    \\u003c-escaped, in both the vega and d3 paths."""
    from bigdata_cookbook_spark.sinks import dashboard_html

    evil = "</script><script>alert(1)</script>"
    vega = {
        "mark": "bar",
        "data": {"values": [{"label": evil, "cnt": 1}]},
        "encoding": {},
    }
    edges = spark.createDataFrame(
        [(evil, "ai", 3)], "src_name string, dst_name string, weight long"
    )
    net = node_link_json(edges)
    h = dashboard_html({"V": vega, "N": net}, title="inj")
    # the payload never appears raw anywhere in the page
    assert evil not in h
    assert h.count("\\u003c/script") >= 2  # escaped form present per panel
    # exactly the page's own script tags remain: CDN x4 + one inline pair
    assert h.count("</script>") == 5


def test_scatter_spec_bubble_size_channel(weekly):
    """scatter_spec: point mark with the score column on the size
    channel (the Risk_Analyzer top-themes bubble figure) — quantitative
    size, nominal color per group, unknown size column rejected."""
    from bigdata_cookbook_spark.viz import scatter_spec

    s = scatter_spec(weekly, x="label", y="week", size="cnt", group="label")
    assert s["mark"] == {"type": "point"}
    assert s["encoding"]["size"] == {"field": "cnt", "type": "quantitative"}
    assert s["encoding"]["color"] == {"field": "label", "type": "nominal"}
    json.dumps(s)

    with pytest.raises(KeyError):
        scatter_spec(weekly, x="label", y="week", size="nope")
