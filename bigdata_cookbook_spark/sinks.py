"""Report sinks (SURVEY.md §2.1 S6/S7).

These are edge operators: results reaching a sink are small (post-
aggregation), so collection to the driver is by design — the engine never
collects fact tables (BASELINE.md north star). Reference:

- S7 HTML report: Tracking_Inflation_Drivers/src/summarize.py:222-285 and
  Report_Generator_AI_Threats/src/tool.py:131-351 assemble f-string HTML
  grouped by label, one section per group with quote/motivation blocks.
- S6 Excel workbook: Thematic_Screener/ThematicScreener.ipynb cell 34
  writes a multi-sheet workbook of result frames. ``workbook_xlsx_sink``
  writes the real multi-sheet .xlsx via the stdlib OOXML writer
  (sources/xlsx.py); ``workbook_sink`` remains as the CSV-per-sheet
  flavor.
- Graph exports: the reference's network/mind-map renderings
  (Election_Monitor/src/visualization_tools.py:300-560) are presentation
  (scoped out, SURVEY §1.3); ``graph_dot`` emits the data side as
  Graphviz DOT — the standard interchange any renderer consumes.
"""

from __future__ import annotations

import html
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

_MAX_SINK_ROWS = 100_000  # guardrail: sinks are for post-aggregation results


def _collect_small(df: DataFrame, limit: int = _MAX_SINK_ROWS) -> list[dict]:
    rows = [r.asDict() for r in df.limit(limit + 1).collect()]
    if len(rows) > limit:
        raise ValueError(
            f"sink input exceeds {limit} rows — aggregate before sinking; "
            "fact-table exports belong in df.write.parquet"
        )
    return rows


def html_report(
    df: DataFrame,
    group_col: str,
    title: str,
    body_cols: Sequence[str],
    heading_col: str | None = None,
    intro: str | None = None,
) -> str:
    """S7: one <section> per distinct ``group_col`` value, each row
    rendered as a block of the requested body columns. Deterministic
    ordering (group, then row order by the body columns) so the output is
    byte-stable for golden tests. ``intro`` renders as a leading
    paragraph under the <h1> (the reference's intro-section slot,
    Tracking_Inflation_Drivers/src/summarize.py:222-285)."""
    rows = _collect_small(df)
    groups: dict[str, list[dict]] = {}
    for r in rows:
        groups.setdefault(str(r.get(group_col)), []).append(r)

    out = [
        "<!DOCTYPE html>",
        "<html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title></head><body>",
        f"<h1>{html.escape(title)}</h1>",
    ]
    if intro is not None:
        out.append(f"<p class='intro'>{html.escape(intro)}</p>")
    for g in sorted(groups):
        out.append("<section>")
        out.append(f"<h2>{html.escape(g)}</h2>")
        grows = sorted(
            groups[g], key=lambda r: tuple(str(r.get(c)) for c in body_cols)
        )
        for r in grows:
            out.append("<div class='item'>")
            if heading_col is not None:
                out.append(f"<h3>{html.escape(str(r.get(heading_col)))}</h3>")
            for c in body_cols:
                out.append(
                    f"<p><b>{html.escape(c)}:</b> {html.escape(str(r.get(c)))}</p>"
                )
            out.append("</div>")
        out.append("</section>")
    out.append("</body></html>")
    return "\n".join(out)


def workbook_sink(sheets: Mapping[str, DataFrame], out_dir: str) -> dict[str, str]:
    """S6 (CSV flavor): multi-sheet workbook of result frames -> one CSV
    per sheet under ``out_dir`` (driver-side, small results only).
    Returns {sheet_name: file_path}. See ``workbook_xlsx_sink`` for the
    reference's actual single-file .xlsx format."""
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}
    for name, df in sheets.items():
        safe = "".join(ch if ch.isalnum() or ch in "-_" else "_" for ch in name)
        path = os.path.join(out_dir, f"{safe}.csv")
        df.limit(_MAX_SINK_ROWS + 1).toPandas().to_csv(path, index=False)
        paths[name] = path
    return paths


def workbook_xlsx_sink(sheets: Mapping[str, DataFrame], path: str) -> str:
    """S6: multi-sheet .xlsx workbook of result frames — the reference's
    ExcelManager surface (ThematicScreener.ipynb cell 34), written with
    the stdlib OOXML writer (sources/xlsx.py). Driver-side under the
    bounded-sink guardrail; fact-scale data never flows through here."""
    payload = {}
    for name, df in sheets.items():
        rows = df.limit(_MAX_SINK_ROWS + 1).collect()
        if len(rows) > _MAX_SINK_ROWS:
            raise ValueError(
                f"sheet {name!r} exceeds the {_MAX_SINK_ROWS}-row workbook "
                "guardrail; aggregate or sample before exporting"
            )
        payload[name] = (df.columns, [tuple(r) for r in rows])
    from bigdata_cookbook_spark.sources.xlsx import write_xlsx

    write_xlsx(payload, path)
    return path


def graph_dot(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None = None,
    directed: bool = False,
    name: str = "g",
) -> str:
    """Edge frame -> Graphviz DOT text (the renderer-agnostic half of the
    reference's network/mind-map visualizations — any layout engine
    consumes DOT). Nodes are the distinct endpoints; edge labels carry
    the weight column when given. Deterministic output: nodes and edges
    sorted. Driver-side under the bounded-sink guardrail."""
    rows = _collect_small(edges)
    arrow = "->" if directed else "--"
    kind = "digraph" if directed else "graph"

    def q(v) -> str:
        return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'

    nodes = sorted({str(r[src_col]) for r in rows} | {str(r[dst_col]) for r in rows})
    safe_name = "".join(ch for ch in name if ch.isalnum() or ch == "_") or "g"
    lines = [f"{kind} {safe_name} {{"]
    for n in nodes:
        lines.append(f"  {q(n)};")
    for r in sorted(rows, key=lambda r: (str(r[src_col]), str(r[dst_col]))):
        attr = f' [label={q(r[weight_col])}]' if weight_col else ""
        lines.append(f"  {q(r[src_col])} {arrow} {q(r[dst_col])}{attr};")
    lines.append("}")
    return "\n".join(lines)


def dashboard_html(
    panels: Mapping[str, dict],
    title: str,
    columns: int = 2,
) -> str:
    """Self-contained static dashboard: N figure specs rendered into one
    HTML page — the rendered-dashboard experience of the reference's
    plotly notebooks (Election_Monitor/src/visualization_tools.py:300-560,
    AI_Cost_Cutting_Market_Analysis/src/tool.py:379-1015) over this
    engine's renderer-agnostic viz.py specs.

    ``panels`` maps panel title -> spec dict, where each spec is one of:

    - a Vega-Lite spec (viz.vega_lite_spec / bar_chart_spec /
      timeseries_spec / heatmap_spec — recognized by its ``$schema`` or
      ``mark`` key): rendered client-side by vega-embed,
    - a node-link graph (viz.node_link_json — ``nodes``+``links``
      keys): rendered by a small inline d3-force script,
    - a tree (viz.tree_json — ``label``+``children``): rendered as a
      nested HTML list, no JS.

    The page embeds all data inline (the specs already carry their
    values) and loads vega/vega-lite/vega-embed/d3 from CDN script tags
    at VIEW time — writing the file needs no network and no new Python
    dependency. Output is byte-stable for a given input (sorted-key
    JSON, insertion-ordered panels) so golden tests can pin it.
    """
    import json

    def script_json(spec: dict) -> str:
        # Escape '<' for <script>-context embedding: a corpus-derived
        # string containing '</script>' or '<!--' would otherwise
        # terminate the script tag and inject HTML/JS into the page.
        # < is valid JSON and decodes back to '<' in JS.
        return json.dumps(
            spec, sort_keys=True, separators=(",", ":")
        ).replace("<", "\\u003c")

    head = [
        "<!DOCTYPE html>",
        "<html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        "<script src='https://cdn.jsdelivr.net/npm/vega@5'></script>",
        "<script src='https://cdn.jsdelivr.net/npm/vega-lite@5'></script>",
        "<script src='https://cdn.jsdelivr.net/npm/vega-embed@6'></script>",
        "<script src='https://cdn.jsdelivr.net/npm/d3@7'></script>",
        "<style>",
        "body{font-family:sans-serif;margin:1.5em}",
        f".grid{{display:grid;grid-template-columns:repeat({int(columns)},1fr);gap:1.5em}}",
        ".panel{border:1px solid #ddd;border-radius:6px;padding:1em}",
        ".panel h2{margin-top:0;font-size:1.05em}",
        "ul.tree{list-style:none;padding-left:1.2em}",
        "</style></head><body>",
        f"<h1>{html.escape(title)}</h1>",
        "<div class='grid'>",
    ]
    body: list[str] = []
    scripts: list[str] = []

    def tree_ul(node: dict) -> str:
        kids = node.get("children") or []
        inner = "".join(f"<li>{tree_ul(k)}</li>" for k in kids)
        label = html.escape(str(node.get("label")))
        return label + (f"<ul class='tree'>{inner}</ul>" if inner else "")

    for i, (name, spec) in enumerate(panels.items()):
        pid = f"panel{i}"
        body.append("<div class='panel'>")
        body.append(f"<h2>{html.escape(name)}</h2>")
        if "nodes" in spec and "links" in spec:
            body.append(f"<svg id='{pid}' width='420' height='320'></svg>")
            data = script_json(spec)
            scripts.append(
                "(function(){var g=" + data + ";"
                f"var svg=d3.select('#{pid}'),W=420,H=320;"
                "var sim=d3.forceSimulation(g.nodes)"
                ".force('link',d3.forceLink(g.links).id(function(d){return d.id;}).distance(60))"
                ".force('charge',d3.forceManyBody().strength(-80))"
                ".force('center',d3.forceCenter(W/2,H/2));"
                "var link=svg.append('g').selectAll('line').data(g.links).join('line')"
                ".attr('stroke','#999').attr('stroke-width',function(d){return Math.sqrt(d.weight||1);});"
                "var node=svg.append('g').selectAll('circle').data(g.nodes).join('circle')"
                ".attr('r',5).attr('fill','#4682b4');"
                "node.append('title').text(function(d){return d.id;});"
                "sim.on('tick',function(){"
                "link.attr('x1',function(d){return d.source.x;}).attr('y1',function(d){return d.source.y;})"
                ".attr('x2',function(d){return d.target.x;}).attr('y2',function(d){return d.target.y;});"
                "node.attr('cx',function(d){return d.x;}).attr('cy',function(d){return d.y;});});"
                "})();"
            )
        elif "label" in spec and "children" in spec:
            body.append(f"<ul class='tree'>{tree_ul(spec)}</ul>")
        else:
            body.append(f"<div id='{pid}'></div>")
            data = script_json(spec)
            scripts.append(
                f"vegaEmbed('#{pid}', " + data + ", {actions: false});"
            )
        body.append("</div>")

    tail = ["</div>", "<script>", *scripts, "</script>", "</body></html>"]
    return "\n".join(head + body + tail)


def write_webdataset_shards(
    df,
    out_dir: str,
    key_col: str = "doc_id",
    content_cols: Mapping[str, str] | None = None,
    shard_col: str = "shard_id",
    max_shard_bytes: int | None = None,
):
    """WebDataset-style tar shards — the packaging convention large
    multimodal training runs consume (one ``.tar`` per shard; each
    sample is one or more members named ``<key>.<ext>``; readers stream
    tars sequentially). Composes with sampling.pack_shards: pack assigns
    byte-targeted ``shard_id``s in training order, this sink realizes
    ``shard-<id>.tar`` files.

    ``content_cols`` maps column -> member extension (default
    ``{"text": "txt"}``); string columns write utf-8, binary columns
    write bytes as-is (the multimodal ``binary`` payload path), NULLs
    skip the member. Distributed shape: one repartition ON THE SHARD KEY
    (each task owns whole shards, so a tar is written exactly once, by
    one task) + a within-partition sort on (shard, key) so member order
    — and therefore the tar BYTES — are deterministic; tar metadata is
    pinned (mtime=0, uid/gid=0, USTAR) for byte-stable reruns. Each tar
    lands via write-to-temp + atomic rename, so a killed task never
    leaves a half-written shard visible (same crash discipline as
    plans/layout.py). The temp name embeds the Spark task ATTEMPT id,
    so a speculative or zombie-retried attempt writes its own file and
    the rename publishes whichever attempt finishes — never an
    interleaving of two writers. Stale ``.inprogress.*`` files from
    killed attempts are invisible to readers (the source's glob is
    ``shard-*.tar``) and safe to delete any time no write job is
    running.

    Contracts enforced per row (fail-loud, not fail-garbage):
    ``key_col`` values must be non-null and dot-free — '.' separates
    the sample key from the member extension in WebDataset's naming, so
    a dotted key would silently split wrong on every reader; content
    values must be str (utf-8 encoded) or bytes-like — anything else
    raises TypeError rather than falling through to ``bytes(v)``
    (which for an int builds a ZERO-FILLED buffer of that length).
    ``max_shard_bytes`` (optional) fails the write if a finished tar
    exceeds it — the knob to catch pack_shards misconfiguration before
    oversized shards hit the reader's whole-tar-in-memory bound (see
    sources/webdataset.py).

    ``out_dir`` must be a filesystem every executor can write (local
    mode: any local path; a cluster points this at shared/fuse-mounted
    storage — writing tars through the object-store committer would
    need a custom FileFormat, declared out of scope). Returns a
    DataFrame (shard_id, path, n_samples, n_bytes) — the shard
    manifest; count it to force the write.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    cols = dict(content_cols or {"text": "txt"})
    os.makedirs(out_dir, exist_ok=True)
    src = (
        df.select(shard_col, key_col, *cols.keys())
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, key_col)
    )

    def run(batches):
        import tarfile

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        state: dict = {"sid": None, "tar": None, "tmp": None, "n": 0}

        def close_current():
            if state["tar"] is None:
                return None
            state["tar"].close()
            final = os.path.join(out_dir, f"shard-{state['sid']:06d}.tar")
            size = os.path.getsize(state["tmp"])
            if max_shard_bytes is not None and size > max_shard_bytes:
                os.remove(state["tmp"])
                raise ValueError(
                    f"shard {state['sid']} is {size} bytes, over "
                    f"max_shard_bytes={max_shard_bytes}; re-pack with a "
                    "smaller shard_bytes target (readers load each tar "
                    "whole into executor memory)"
                )
            os.replace(state["tmp"], final)
            row = (
                int(state["sid"]),
                final,
                int(state["n"]),
                int(size),
            )
            state.update(sid=None, tar=None, tmp=None, n=0)
            return row

        out_rows = []
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                sid = int(d[shard_col])
                if sid != state["sid"]:
                    done = close_current()
                    if done:
                        out_rows.append(done)
                    tmp = os.path.join(
                        out_dir, f".shard-{sid:06d}.tar.inprogress.{attempt}"
                    )
                    state.update(
                        sid=sid,
                        tmp=tmp,
                        tar=tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT),
                        n=0,
                    )
                key = d[key_col]
                if key is None or "." in str(key):
                    raise ValueError(
                        f"write_webdataset_shards: {key_col}={key!r} — sample "
                        "keys must be non-null and dot-free ('.' delimits "
                        "key from member extension in WebDataset naming)"
                    )
                for col, ext in cols.items():
                    v = d[col]
                    if v is None:
                        continue
                    if isinstance(v, str):
                        payload = v.encode("utf-8")
                    elif isinstance(v, (bytes, bytearray, memoryview)):
                        payload = bytes(v)
                    else:
                        raise TypeError(
                            f"write_webdataset_shards: column {col!r} value "
                            f"of type {type(v).__name__} — content columns "
                            "must be string or binary (cast numerics "
                            "explicitly; bytes(int) would write a "
                            "zero-filled buffer)"
                        )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    import io

                    state["tar"].addfile(info, io.BytesIO(payload))
                state["n"] += 1
        done = close_current()
        if done:
            out_rows.append(done)
        yield pd.DataFrame(
            out_rows, columns=["shard_id", "path", "n_samples", "n_bytes"]
        )

    return src.mapInPandas(
        run, "shard_id long, path string, n_samples long, n_bytes long"
    )
