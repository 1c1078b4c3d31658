"""HTML -> text extraction (functions/text.py): the Spark expression,
the DuckDB twin, and the Python reference compile from one step table
and must agree character-for-character."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import (
    html_to_text_expr,
    html_to_text_py,
    html_to_text_sql,
)

SAMPLES = [
    "<html><body><p>plain paragraph</p></body></html>",
    "<script>var x = '<p>not text</p>';</script><p>real</p>",
    "<STYLE>body{}</STYLE>After style",
    "<!-- hidden --><h1>Title</h1><div>block</div>tail",
    "line one<br>line two<br/>line three",
    "A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
    "&amp;lt; decodes one level only",
    "<p>multi\n  line\n  source</p><p>second</p>",
    "no markup at all",
    "",
    "<ul><li>one</li><li>two</li></ul>",
    "<script\n type='text/javascript'>multi\nline</script>kept",
]


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i int, h string")
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text_expr(F.col("h")).alias("t")).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == html_to_text_py(s), f"sample {i}: {s!r} -> {got[i]!r}"


def test_duckdb_twin_matches_python_reference():
    con = duckdb.connect()
    for i, s in enumerate(SAMPLES):
        expr = html_to_text_sql("h")
        row = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS h)", [s]
        ).fetchone()
        assert row[0] == html_to_text_py(s), f"sample {i}: {s!r} -> {row[0]!r}"


def test_block_structure_survives_for_paragraph_stage(spark):
    """Paragraph boundaries become newlines so the downstream
    paragraph/line dedup stages see structure, not one long line."""
    h = "<p>first</p><p>second</p><div>third</div>"
    assert html_to_text_py(h) == "first\nsecond\nthird"


def test_pipeline_html_input_stage(spark, sf_dir):
    """html_input=True extracts before every text stage: a corpus wrapped
    in HTML markup yields the same training set as the plain corpus."""
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.sources.testdata import load_table
    from bigdata_cookbook_spark.workflows import pretraining_pipeline

    docs = load_table(spark, sf_dir, "documents")
    wrapped = docs.withColumn(
        "text",
        F.concat(
            F.lit("<html><script>x()</script><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ),
    )
    plain = pretraining_pipeline(docs)
    html = pretraining_pipeline(wrapped, html_input=True)
    ids_plain = {r.doc_id for r in plain["training_set"].collect()}
    ids_html = {r.doc_id for r in html["training_set"].collect()}
    assert ids_html == ids_plain and len(ids_html) > 0
    plain["clean"].unpersist()
    html["clean"].unpersist()


def test_parser_tier_handles_numeric_refs_and_agrees_on_simple_html(spark):
    """The stdlib-parser tier decodes numeric character references (the
    regex tier's declared gap) and agrees with the expression tier on
    plain block-structured HTML."""
    from bigdata_cookbook_spark.functions.text import (
        _html_parser_extract,
        html_to_text_parsed,
    )

    # numeric refs: out of scope for the regex tier, exact here
    assert _html_parser_extract("<p>&#65;&#x42; &amp; C</p>") == "AB & C"
    # attribute containing '>' — a real parser gets this right
    assert (
        _html_parser_extract('<a title="a>b">link</a> tail') == "link tail"
    )

    simple = [
        "<html><body><p>plain paragraph</p></body></html>",
        "<script>var x = 1;</script><p>real</p>",
        "line one<br>line two",
        "<ul><li>one</li><li>two</li></ul>",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(simple)], "i int, text string"
    )
    got = {
        r.i: r.text_extracted
        for r in html_to_text_parsed(df).collect()
    }
    for i, s in enumerate(simple):
        assert got[i] == html_to_text_py(s), f"sample {i}"


def test_script_ratio_exprs(spark):
    """Script ratios: known mixed strings produce exact, portable ratios;
    whitespace-only text yields NULL."""
    from bigdata_cookbook_spark.functions.text import script_ratio_exprs

    rows = [
        (1, "abc 123"),          # 6 non-ws: 3 latin, 3 digit
        (2, "Привет"),           # 6 cyrillic
        (3, "深度学习"),          # 4 cjk
        (4, "   "),              # whitespace only -> NULL
        (5, "mix 深度 Пр 12"),    # 9 non-ws: 3 latin, 2 cjk, 2 cyr, 2 digit
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    r = script_ratio_exprs(F.col("t"))
    got = {
        x.i: (x.latin, x.cjk, x.cyrillic, x.digit)
        for x in df.select(
            "i",
            r["latin"].alias("latin"),
            r["cjk"].alias("cjk"),
            r["cyrillic"].alias("cyrillic"),
            r["digit"].alias("digit"),
        ).collect()
    }
    assert got[1] == (0.5, 0.0, 0.0, 0.5)
    assert got[2] == (0.0, 0.0, 1.0, 0.0)
    assert got[3] == (0.0, 1.0, 0.0, 0.0)
    assert got[4] == (None, None, None, None)
    assert got[5] == (round(3 / 9, 4), round(2 / 9, 4), round(2 / 9, 4), round(2 / 9, 4))
