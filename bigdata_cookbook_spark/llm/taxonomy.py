"""Theme taxonomy tree (SURVEY.md §1.1 item 5, §2.9 L4, §2.8 F15).

Reference: Tracking_Inflation_Drivers/src/mind_map_tools.py:134-296 — one
LLM call (temperature 0, seed 123) produces a nested dict
{Node:int, Label:str, Summary:str, Keywords:[str], Children:[...]}; leaf
labels/summaries feed query sentences and classifier label sets
(:103-130, :484-497); a label->parent map re-attaches leaves to their
theme (notebook: df['theme'] = df['label'].map(mapping)).

The tree is driver-side small JSON by design (tens of nodes). Engine
pieces:
- ``generate_theme_tree(theme, backend)`` — the backend is a callable
  ``prompt -> tree dict``; the default deterministic stub expands a fixed
  2-level shape from the theme string so tests are byte-stable.
- traversals (leaf_labels / leaf_summaries / label_to_parent) — plain
  recursion, F15;
- ``tree_to_edges(spark, tree)`` — the edges DataFrame used for mind-map
  style output (tools.py:92-107) and for joining label->theme at scale
  (broadcast the tiny map, never a driver loop over the fact table).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TreeBackend = Callable[[str], dict]


def stub_tree_backend(theme: str) -> dict:
    """Deterministic taxonomy: 3 branches x 2 leaves derived from the
    theme string's hash — stands in for the seeded LLM call."""
    h = hashlib.md5(theme.encode()).hexdigest()
    node = [0]

    def mk(label: str, summary: str, children: list[dict]) -> dict:
        node[0] += 1
        return {
            "Node": node[0],
            "Label": label,
            "Summary": summary,
            "Keywords": [w.lower() for w in label.split()],
            "Children": children,
        }

    branches = []
    for b in range(3):
        leaves = [
            mk(
                f"{theme} aspect {b}.{i}",
                f"Sentences about {theme} aspect {b}.{i} ({h[:6]})",
                [],
            )
            for i in range(2)
        ]
        branches.append(mk(f"{theme} branch {b}", f"Branch {b} of {theme}", leaves))
    return mk(theme, f"Root: {theme}", branches)


def generate_theme_tree(theme: str, backend: TreeBackend = stub_tree_backend) -> dict:
    """L4: taxonomy generation. Pluggable backend; default deterministic."""
    return backend(theme)


def _walk(tree: dict):
    yield tree
    for c in tree.get("Children", []) or []:
        yield from _walk(c)


def leaf_labels(tree: dict) -> list[str]:
    """F15: labels of all leaves, document order."""
    return [n["Label"] for n in _walk(tree) if not n.get("Children")]


def leaf_summaries(tree: dict) -> list[str]:
    """F15: summaries of all leaves — the query sentences."""
    return [n["Summary"] for n in _walk(tree) if not n.get("Children")]


def label_to_parent(tree: dict) -> dict[str, str]:
    """F15: leaf label -> parent (theme) label map."""
    out: dict[str, str] = {}

    def rec(node: dict, parent: str | None):
        children = node.get("Children") or []
        if not children and parent is not None:
            out[node["Label"]] = parent
        for c in children:
            rec(c, node["Label"])

    rec(tree, None)
    return out


def tree_to_edges(spark: SparkSession, tree: dict) -> DataFrame:
    """Edges DataFrame (parent_label, child_label, child_node, is_leaf) —
    broadcast-joinable onto labeled fact rows to roll leaves up to themes."""
    rows = []

    def rec(node: dict):
        for c in node.get("Children") or []:
            rows.append(
                (
                    node["Label"],
                    c["Label"],
                    int(c["Node"]),
                    not (c.get("Children") or []),
                )
            )
            rec(c)

    rec(tree)
    return spark.createDataFrame(
        rows, "parent_label string, child_label string, child_node int, is_leaf boolean"
    )
