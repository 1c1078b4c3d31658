"""Entity masking / unmasking (F2/F3 — the heart of the text layer).

Reference: offset-based splicing at
AI_Cost_Cutting_Market_Analysis/src/search.py:611-676 (mask) and
labeling.py:23-44 + Election_Monitor/src/visualization_tools.py:113-130
(unmask). The reference walks offsets in reverse with a *global* counter
across rows (a known quirk, SURVEY.md §7); our engine scopes the
"Other Company_<i>" counter per row with a stable per-entity index (first
occurrence order), and documents the deviation.

Implemented with array higher-order functions (array_sort comparator +
aggregate fold) — fully JVM-side, whole-stage-codegen friendly, no Python
UDF in the hot path. Assumes mention spans are non-overlapping (guaranteed
by the corpus contract; overlapping spans are skipped mid-fold).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TARGET_PLACEHOLDER = "Target Company"
OTHER_PREFIX = "Other Company_"


def sort_mentions_by_start(mentions: Column) -> Column:
    """Order an array<struct<...,start,end>> by character offset."""
    return F.array_sort(
        mentions,
        lambda a, b: F.when(a["start"] < b["start"], F.lit(-1))
        .when(a["start"] > b["start"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def distinct_other_keys(mentions: Column, target_id: Column) -> Column:
    """Non-target entity keys in first-occurrence (start-offset) order."""
    return F.array_distinct(
        F.transform(
            F.filter(sort_mentions_by_start(mentions), lambda e: e["key"] != target_id),
            lambda e: e["key"],
        )
    )


def other_entities_map_expr(mentions: Column, target_id: Column) -> Column:
    """array<struct<idx:int, name:string>> — placeholder index -> name."""
    keys = distinct_other_keys(mentions, target_id)
    return F.transform(
        keys,
        lambda k, i: F.struct(
            (i + 1).cast("int").alias("idx"),
            F.element_at(F.filter(mentions, lambda e: e["key"] == k), 1)["name"].alias("name"),
        ),
    )


def mask_text_expr(text: Column, mentions: Column, target_id: Column) -> Column:
    """Splice mention spans out of ``text``: target entity -> 'Target
    Company', others -> 'Other Company_<i>' (stable per-entity index).

    A single aggregate() fold over the start-sorted mention array carrying
    (built-string, consumed-position); spans starting before the consumed
    position (overlaps) are skipped, mirroring search.py:640-652.
    """
    sorted_m = sort_mentions_by_start(mentions)
    others = distinct_other_keys(mentions, target_id)
    zero = F.struct(F.lit("").alias("s"), F.lit(0).alias("pos"))

    def step(acc: Column, e: Column) -> Column:
        replacement = F.when(e["key"] == target_id, F.lit(TARGET_PLACEHOLDER)).otherwise(
            F.concat(F.lit(OTHER_PREFIX), F.array_position(others, e["key"]).cast("string"))
        )
        appended = F.struct(
            F.concat(
                acc["s"],
                F.substr(text, acc["pos"] + 1, e["start"] - acc["pos"]),
                replacement,
            ).alias("s"),
            e["end"].cast("int").alias("pos"),
        )
        return F.when(e["start"] < acc["pos"], acc).otherwise(appended)

    done = F.aggregate(
        sorted_m,
        zero,
        step,
        lambda acc: F.concat(acc["s"], F.substr(text, acc["pos"] + 1, F.length(text) - acc["pos"])),
    )
    return F.when(text.isNull(), F.lit(None).cast("string")).when(
        (mentions.isNull()) | (F.size(mentions) == 0), text
    ).otherwise(done)


def unmask_text_expr(masked: Column, other_map: Column, target_name: Column) -> Column:
    """Inverse of mask_text_expr given the row's other_entities_map.

    Replaces placeholders highest-index-first so 'Other Company_1' never
    clobbers the prefix of 'Other Company_12'.
    """
    restored = F.aggregate(
        F.reverse(other_map),
        masked,
        lambda acc, m: F.replace(
            acc, F.concat(F.lit(OTHER_PREFIX), m["idx"].cast("string")), m["name"]
        ),
    )
    return F.replace(restored, F.lit(TARGET_PLACEHOLDER), target_name)


def strip_braces(text: Column) -> Column:
    """F1: remove '{'/'}' noise (search.py:597-607)."""
    return F.translate(text, "{}", "")
