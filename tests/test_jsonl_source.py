"""JSONL source (sources/jsonl.py): good/quarantine routing, reason
tagging, one-line-one-side invariant."""

from __future__ import annotations

from bigdata_cookbook_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    jsonl_parsed,
    read_jsonl,
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}',
    "",  # blank: dropped, not quarantined
    "{not json at all",  # unparseable
    '{"doc_id": 3, "lang": "en", "source": "web", "n_chars": 0}',  # missing text
    '{"doc_id": 4, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}',
]


def _write(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_read_jsonl_split(spark, tmp_path):
    path = _write(tmp_path)
    good, bad = read_jsonl(spark, path, DOCUMENTS_SCHEMA, required=("doc_id", "text"))
    got = {r.doc_id: r.text for r in good.collect()}
    assert got == {1: "hello world", 2: "bonjour", 4: "ok"}
    assert good.columns == [f.name for f in DOCUMENTS_SCHEMA.fields]
    reasons = sorted(r._reason for r in bad.collect())
    assert reasons == ["missing:text", "unparseable"]


def test_jsonl_every_nonblank_line_lands_once(spark, tmp_path):
    path = _write(tmp_path)
    tagged = jsonl_parsed(spark, path, DOCUMENTS_SCHEMA, required=("doc_id", "text"))
    n_nonblank = sum(1 for l in LINES if l.strip())
    assert tagged.count() == n_nonblank
    good, bad = read_jsonl(spark, path, DOCUMENTS_SCHEMA, required=("doc_id", "text"))
    assert good.count() + bad.count() == n_nonblank


def test_jsonl_no_schema_inference_scan(spark, tmp_path):
    """The plan must be a text scan + project — no JSON inference job, no
    shuffle."""
    path = _write(tmp_path)
    good, _ = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "from_json" in plan


def test_jsonl_roundtrip_matches_parquet_table(spark, sf_dir, tmp_path):
    """Exporting the documents table to JSONL and re-reading it through
    the source reproduces the table exactly."""
    import json

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [r.asDict() for r in docs.collect()]
    p = tmp_path / "roundtrip.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    good, bad = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, required=("doc_id",))
    assert bad.count() == 0
    assert good.count() == len(rows)
    want = {r["doc_id"]: r["text"] for r in rows}
    got = {r.doc_id: r.text for r in good.collect()}
    assert got == want
