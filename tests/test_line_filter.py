"""RefinedWeb line-wise correction filtering (functions/text.py
LINE_FILTER_RULES / line_filter_exprs / line_filter_sql): the Spark
higher-order filter and the DuckDB twin compile from ONE rule table —
pin their agreement and the per-rule semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import (
    LINE_FILTER_RULES,
    line_filter_exprs,
    line_filter_sql,
)

DOCS = [
    # every rule fires once; the body survives
    "MENU\n2024 12 31\n17 likes\nAll rights reserved.\nreal body text stays here",
    # tiny lines (empty + single char); ALL-CAPS word dropped
    "x\n\nNORMAL Sentence here\nBODY",
    "only body line survives fine",
    # numeric variants; (?i) boilerplate; doc mostly boilerplate -> drop
    "123\n456,78\nClick Here to continue\nsome lowercase text",
    # two-char line is NOT tiny; counter is case-insensitive
    "A B C\nab\n99 Views\nsign in to comment\nlong real content line with words",
    # all-caps needs >=3 uppercase: "AB" survives the rule (but is 2 chars)
    "AB\nAB CD EF\nbody",
]


def test_engine_duckdb_agreement(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "doc_id long, text string"
    )
    exprs = line_filter_exprs(F.col("text"))
    rows = df.select(
        "doc_id", "text", *[c.alias(k) for k, c in exprs.items()]
    ).collect()
    con = duckdb.connect()
    for r in rows:
        lit = (
            "'"
            + r.text.replace("'", "''").replace("\n", "' || chr(10) || '")
            + "'"
        )
        frags = line_filter_sql(f"({lit})")
        sel = ", ".join(f"{v} AS {k}" for k, v in frags.items())
        dk = con.execute(f"SELECT {sel}").fetchone()
        for n, v in zip(list(frags), dk):
            assert getattr(r, n) == v, (r.doc_id, n)


def test_rule_semantics(spark):
    df = spark.createDataFrame([(0, DOCS[0])], "doc_id long, text string")
    exprs = line_filter_exprs(F.col("text"))
    r = df.select(*[c.alias(k) for k, c in exprs.items()]).collect()[0]
    assert r.text_clean == "real body text stays here"
    assert r.n_lines_total == 5 and r.n_lines_kept == 1
    for rule in ("numeric_only", "all_caps", "counter", "boilerplate"):
        assert getattr(r, f"n_{rule}") == 1, rule
    assert r.n_tiny == 0
    # 4 of 5 lines dropped -> kept text under half the original
    assert r.doc_keep is False


def test_mostly_clean_doc_keeps(spark):
    df = spark.createDataFrame(
        [(0, "a perfectly ordinary paragraph of text\nwith two lines")],
        "doc_id long, text string",
    )
    exprs = line_filter_exprs(F.col("text"))
    r = df.select(*[c.alias(k) for k, c in exprs.items()]).collect()[0]
    assert r.n_lines_kept == r.n_lines_total == 2
    assert r.doc_keep is True


@pytest.mark.parametrize(
    ("line", "expected_rules"),
    [
        ("2024 12 31", {"numeric_only"}),
        ("456,78", {"numeric_only"}),
        ("MENU HOME NEWS", {"all_caps"}),
        ("AB", set()),  # only 2 uppercase: below the >=3 bar (but tiny-adjacent)
        ("17 likes", {"counter"}),
        ("99 Views", {"counter"}),
        ("All rights reserved.", {"boilerplate"}),
        ("COOKIE POLICY", {"all_caps", "boilerplate"}),  # multi-rule line
        ("x", {"tiny"}),
        ("", {"tiny"}),
        ("normal sentence", set()),
    ],
)
def test_single_line_rule_matrix(line, expected_rules):
    import re

    hit = {name for name, pat in LINE_FILTER_RULES if re.search(pat, line)}
    assert hit == expected_rules, line


def test_pipeline_line_filter_stage(spark):
    """Capstone integration: line_filter=True rewrites kept docs to the
    line-cleaned text, drops mostly-boilerplate docs whole (booked as
    dropped_line_filter), and the accounting still sums exactly."""
    from bigdata_cookbook_spark.sources.testdata import load_table
    from bigdata_cookbook_spark.workflows import pretraining_pipeline

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # plant: every doc gets one boilerplate line on top of its body;
    # doc_id % 11 == 0 docs become MOSTLY boilerplate (drop whole)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat_ws(
                "\n",
                F.lit("MENU HOME NEWS"),
                F.lit("All rights reserved. Sign in."),
                F.lit("17 likes"),
                F.substring(F.col("text"), 1, 10),
            ),
        ).otherwise(F.concat_ws("\n", F.lit("MENU HOME NEWS"), F.col("text"))),
    )
    out = pretraining_pipeline(planted, line_filter=True)
    acc = {r.stage: r.n_dropped for r in out["accounting"].collect()}
    assert "dropped_line_filter" in acc and acc["dropped_line_filter"] > 0
    n_docs = planted.count()
    ts = out["training_set"].collect()
    assert n_docs - sum(acc.values()) == len(ts)
    # every mostly-boilerplate doc is gone from the training set
    ts_ids = {r.doc_id for r in ts}
    assert all(i % 11 != 0 for i in ts_ids)
    # surviving docs saw the REWRITTEN text: the boilerplate line must
    # not influence token counts (compare against the unplanted run)
    base = pretraining_pipeline(docs)
    base_tokens = {r.doc_id: r.n_tokens for r in base["clean"].collect()}
    got_tokens = {r.doc_id: r.n_tokens for r in out["clean"].collect()}
    shared = set(base_tokens) & set(got_tokens)
    assert shared and all(got_tokens[i] == base_tokens[i] for i in shared)
    out["clean"].unpersist()
    base["clean"].unpersist()
