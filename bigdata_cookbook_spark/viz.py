"""Renderer-agnostic figure-spec sinks — the data side of the
reference's plotly/networkx visualization layer.

The reference renders interactively with plotly/networkx; this engine
scopes rendering out (SURVEY §1.3) but exports each figure's COMPLETE
specification as standard interchange JSON, so any renderer (Vega-Lite
editor/vl-convert, d3-force, plotly's own vega importer, Observable)
reproduces the figure without this repo growing a plotting dependency:

- ``vega_lite_spec`` — single-view Vega-Lite v5 spec with inlined data:
  the bar / line / scatter / heatmap families behind
  `Election_Monitor/src/visualization_tools.py:132-228` (top companies
  per sector bars), `AI_Cost_Cutting_Market_Analysis/src/tool.py:
  378-552` (confidence basket grouped bars), `tool.py:593-756` (weekly
  volume lines), `tool.py:1462-1544` (media-attention comparison), and
  the `mind_map_tools.py:559-578` pivot score heatmap.
- ``timeseries_spec`` / ``bar_chart_spec`` — presets of the above with
  the reference figures' shapes (multi-series lines; grouped or stacked
  bars).
- ``node_link_json`` — d3-force node-link dict for the co-mention /
  company-topic networks (`visualization_tools.py:654-792` builds the
  same structure via networkx before handing plotly the layout); node
  size/color columns map 1:1 to the reference's degree-scaled sizes and
  label colors.
- ``tree_json`` — nested mind-map tree (`mind_map_tools.py:298-440`)
  from llm.taxonomy's edge frame.
- ``with_series_selector`` / ``timeseries_with_overview_spec`` — the
  widget-level parity tier: the reference's plotly dropdown menus and
  x-axis range sliders, expressed as standard Vega-Lite ``params``
  (bound ``<select>`` input; interval brush driving the detail
  x-domain) — interactivity lives in the spec JSON, still zero
  rendering dependencies.

All are driver-edge sinks behind the bounded `_collect_small` guardrail
(post-aggregation frames only — the same row cap as the HTML/xlsx
sinks), deterministic (rows sorted) so golden tests can hash them.
"""

from __future__ import annotations

import datetime as _dt
import decimal
from collections.abc import Sequence

from pyspark.sql import DataFrame

from bigdata_cookbook_spark.sinks import _collect_small

_VL_SCHEMA = "https://vega.github.io/schema/vega-lite/v5.json"

_TEMPORAL = (_dt.date, _dt.datetime)
_QUANT = (int, float, decimal.Decimal)


def _jsonable(v):
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _vl_type(values: list) -> str:
    """Infer the Vega-Lite encoding type from observed python values."""
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return "nominal"
        if isinstance(v, _TEMPORAL):
            return "temporal"
        if isinstance(v, _QUANT):
            return "quantitative"
        return "nominal"
    return "nominal"


def vega_lite_spec(
    df: DataFrame,
    mark: str,
    x: str,
    y: str,
    color: str | None = None,
    tooltip: Sequence[str] | None = None,
    title: str | None = None,
    stacked: bool = False,
    sort_by: Sequence[str] | None = None,
    size: str | None = None,
) -> dict:
    """One single-view Vega-Lite v5 spec with the frame inlined as
    ``data.values``. ``mark``: 'bar' | 'line' | 'point' | 'rect' (rect +
    a quantitative color = heatmap). Encoding types are inferred from
    the collected values (temporal / quantitative / nominal). With
    ``color`` on a bar mark, ``stacked=False`` emits the reference's
    grouped form via an xOffset channel; True leaves Vega-Lite's default
    stacking. Rows are sorted (by ``sort_by`` or all columns) so the
    spec is byte-deterministic for golden tests.
    """
    rows = _collect_small(df)
    cols = list(df.columns)
    for c in (
        x,
        y,
        *([color] if color else []),
        *([size] if size else []),
        *(tooltip or []),
    ):
        if c not in cols:
            raise KeyError(f"column {c!r} not in frame {cols}")
    keys = list(sort_by) if sort_by else cols
    rows.sort(key=lambda r: tuple(str(r.get(k)) for k in keys))
    values = [{c: _jsonable(r.get(c)) for c in cols} for r in rows]

    def enc(col: str) -> dict:
        return {"field": col, "type": _vl_type([r.get(col) for r in rows])}

    encoding: dict = {"x": enc(x), "y": enc(y)}
    if color is not None:
        encoding["color"] = enc(color)
        if mark == "bar" and not stacked:
            encoding["xOffset"] = {"field": color}
    if size is not None:
        encoding["size"] = enc(size)
    if tooltip:
        encoding["tooltip"] = [enc(c) for c in tooltip]
    spec = {
        "$schema": _VL_SCHEMA,
        "mark": {"type": mark},
        "data": {"values": values},
        "encoding": encoding,
    }
    if title:
        spec["title"] = title
    return spec


def timeseries_spec(
    df: DataFrame,
    x: str,
    y: str,
    series: str | None = None,
    title: str | None = None,
) -> dict:
    """Multi-series line chart — the weekly-volume / basket-tracking /
    media-attention figure family (`AI_Cost_Cutting.../src/tool.py:
    593-756,1462-1544`; `visualization_tools.py:500-570`)."""
    return vega_lite_spec(df, "line", x, y, color=series, title=title)


def bar_chart_spec(
    df: DataFrame,
    category: str,
    value: str,
    group: str | None = None,
    stacked: bool = False,
    title: str | None = None,
) -> dict:
    """Grouped/stacked bar — top-companies-per-sector and confidence
    basket figures (`visualization_tools.py:132-228`,
    `AI_Cost_Cutting.../src/tool.py:378-552`)."""
    return vega_lite_spec(
        df, "bar", category, value, color=group, stacked=stacked, title=title
    )


def scatter_spec(
    df: DataFrame,
    x: str,
    y: str,
    size: str | None = None,
    group: str | None = None,
    tooltip: Sequence[str] | None = None,
    title: str | None = None,
) -> dict:
    """Scatter / bubble chart — the top-themes-per-company bubble figure
    (`Risk_Analyzer/src/tool.py:221-350`: x=company, y=theme, marker
    area scaled to the exposure score, one color per company). ``size``
    maps the score column to the VL size channel (area-scaled, the
    plotly ``sizemode='area'`` twin); feed it the top-k rows from
    ``operators.analytics.topk_per_group`` for the reference's top-3
    selection."""
    return vega_lite_spec(
        df, "point", x, y, color=group, tooltip=tooltip, title=title, size=size
    )


def heatmap_spec(
    df: DataFrame, x: str, y: str, value: str, title: str | None = None
) -> dict:
    """rect + quantitative color — the pivot score-matrix figure
    (`mind_map_tools.py:559-578` renders the same matrix)."""
    spec = vega_lite_spec(df, "rect", x, y, title=title)
    spec["encoding"]["color"] = {"field": value, "type": "quantitative"}
    return spec


def with_series_selector(
    spec: dict,
    field: str,
    label: str | None = None,
) -> dict:
    """Add a dropdown series selector to a single-view Vega-Lite spec —
    the widget-level twin of the reference's plotly ``updatemenus``
    dropdowns (`visualization_tools.py:500-570` entity pickers,
    `AI_Cost_Cutting.../src/tool.py:379-1015` metric menus), expressed
    as a standard VL ``params`` point-selection bound to an HTML
    ``<select>``: choosing a value filters the view to that series;
    the blank first option clears the selection and shows all.

    Pure spec JSON — no new dependency; vega-embed (the dashboard
    sink's renderer) wires the widget client-side. Options are derived
    from the spec's OWN inlined data (sorted, deduped) so the menu is
    deterministic for golden tests. The input spec is not mutated.
    """
    if any(k in spec for k in ("vconcat", "hconcat", "concat")):
        # VL top-level transforms don't distribute into concat children
        raise ValueError("series selector applies to single-view specs only")
    values = spec.get("data", {}).get("values", [])
    # NATIVE values, not str(): the VL point selection compares with
    # === — a stringified option over a numeric field would never
    # match and selecting it would blank the chart. Values are already
    # JSON-safe (the spec's data was _jsonable'd); key=str only orders
    # the menu deterministically.
    options = sorted(
        {r[field] for r in values if r.get(field) is not None}, key=str
    )
    out = {k: v for k, v in spec.items()}
    out["params"] = list(spec.get("params", [])) + [
        {
            "name": "series_sel",
            "select": {"type": "point", "fields": [field]},
            "bind": {
                "input": "select",
                "options": [None, *options],
                "name": (label or f"{field}: "),
            },
        }
    ]
    out["transform"] = list(spec.get("transform", [])) + [
        {"filter": {"param": "series_sel"}}
    ]
    return out


def timeseries_with_overview_spec(
    df: DataFrame,
    x: str,
    y: str,
    series: str | None = None,
    title: str | None = None,
    overview_height: int = 60,
) -> dict:
    """Detail + overview time series with a brush-driven range control —
    the twin of plotly's x-axis ``rangeslider``
    (`visualization_tools.py:500-570`, `tool.py:593-756` attach one to
    every volume/attention figure). Vega-Lite idiom: a vconcat of the
    detail line over a thin overview strip carrying an interval
    selection on x; the detail's x-scale domain is bound to the brush
    param, so dragging on the strip zooms the detail — all inside the
    spec, rendered by any vega-embed consumer.

    Same determinism contract as vega_lite_spec (sorted rows, inlined
    data); data is inlined ONCE at the top level and shared by both
    views.
    """
    base = vega_lite_spec(df, "line", x, y, color=series)
    enc = base["encoding"]
    detail_enc = {
        "x": {**enc["x"], "scale": {"domain": {"param": "brush"}}},
        "y": enc["y"],
        **({"color": enc["color"]} if "color" in enc else {}),
    }
    overview_enc = {
        "x": enc["x"],
        "y": {**enc["y"], "axis": {"tickCount": 2, "title": None}},
        **({"color": enc["color"]} if "color" in enc else {}),
    }
    spec = {
        "$schema": _VL_SCHEMA,
        "data": base["data"],
        "vconcat": [
            {"mark": {"type": "line"}, "encoding": detail_enc},
            {
                "height": int(overview_height),
                "mark": {"type": "line"},
                "params": [
                    {"name": "brush", "select": {"type": "interval", "encodings": ["x"]}}
                ],
                "encoding": overview_enc,
            },
        ],
    }
    if title:
        spec["title"] = title
    return spec


def node_link_json(
    edges: DataFrame,
    src: str = "src_name",
    dst: str = "dst_name",
    weight: str | None = "weight",
    src_group: str | None = None,
    dst_group: str | None = None,
) -> dict:
    """d3-force node-link structure {nodes, links} from an edge frame
    (co_mention_pairs / company_topic_bipartite output — the engine data
    twins of `visualization_tools.py:654-792`, which feeds the identical
    structure through networkx for plotly). Node ``size`` = weighted
    degree, mirroring the reference's count-scaled node sizes
    (`visualization_tools.py:640-652`); ``group`` is carried from the
    per-side group columns when given (the reference's label colors).
    Deterministic: nodes and links sorted, AND the edge rows are
    processed in sorted (src, dst) order before any first-wins choice —
    a node touched by edges carrying different group values (a topic
    linked to companies with different majority labels) gets the group
    from its first edge in sorted order, not in Spark's
    partition-arrival order, so repeated runs emit identical bytes.
    """
    rows = sorted(_collect_small(edges), key=lambda r: (str(r[src]), str(r[dst])))
    nodes: dict[str, dict] = {}
    links = []
    for r in rows:
        s, d = str(r[src]), str(r[dst])
        w = float(r[weight]) if weight and r.get(weight) is not None else 1.0
        for key, grp_col in ((s, src_group), (d, dst_group)):
            n = nodes.setdefault(key, {"id": key, "size": 0.0})
            n["size"] += w
            if grp_col and r.get(grp_col) is not None and "group" not in n:
                n["group"] = str(r[grp_col])
        links.append({"source": s, "target": d, "weight": w})
    return {
        "nodes": sorted(nodes.values(), key=lambda n: n["id"]),
        "links": sorted(links, key=lambda l: (l["source"], l["target"])),
    }


def tree_json(edges: DataFrame, root_label: str) -> dict:
    """Nested {label, children} mind-map tree from llm.taxonomy
    tree_to_edges output (parent_label, child_label, ...) — the
    render-ready form of `mind_map_tools.py:298-440`'s plotly mind map.
    Children are sorted by label; a cycle or missing root raises.
    """
    rows = _collect_small(edges)
    children: dict[str, list[str]] = {}
    seen_child = set()
    for r in rows:
        children.setdefault(str(r["parent_label"]), []).append(str(r["child_label"]))
        seen_child.add(str(r["child_label"]))
    if root_label in seen_child:
        raise ValueError(f"root {root_label!r} appears as a child — not a root")

    def build(label: str, depth: int) -> dict:
        if depth > 100:
            raise ValueError("tree depth > 100 — cycle in edge frame?")
        kids = sorted(children.get(label, []))
        node: dict = {"label": label}
        if kids:
            node["children"] = [build(k, depth + 1) for k in kids]
        return node

    return build(root_label, 0)
