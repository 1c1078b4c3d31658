"""Committed fixture parquet (tools/make_fixtures.py) fidelity.

The screening / dual-role oracles read <repo>/fixtures/*.parquet from
DuckDB while the Spark queries read the same files — these tests pin that
the committed files ARE generate_corpus(200, seed=7), so regenerating
never silently drifts the oracle inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_cookbook_spark.sources.fixtures import fixture_frames, fixture_tables


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fixture_parquet_matches_generated(spark):
    gen_e, gen_d, gen_c = fixture_frames(spark, n_docs=200, seed=7)
    par_e, par_d, par_c = fixture_tables(spark)
    assert _rows(par_e) == _rows(gen_e)
    assert _rows(par_d.drop("reporting_entities")) == _rows(gen_d.drop("reporting_entities"))
    assert sorted(map(tuple, par_d.select(
        "document_id", F.to_json("reporting_entities")).collect())) == sorted(
        map(tuple, gen_d.select("document_id", F.to_json("reporting_entities")).collect()))
    flat = lambda df: df.select(  # noqa: E731
        "sentence_id", "text", F.to_json("entities").alias("ents")
    )
    assert _rows(flat(par_c)) == _rows(flat(gen_c))


def test_collect_list_ordered_string_mirrors_array(spark, sf_dir):
    import __spark_entry__ as m

    s = {r["user_id"]: r["first_values"] for r in m.q_collect_list_ordered(spark, sf_dir).collect()}
    a = {r["user_id"]: r["first_values"] for r in m.q_collect_list_ordered_array(spark, sf_dir).collect()}
    assert set(s) == set(a)
    for uid, arr in a.items():
        assert s[uid] == ";".join(f"{v:.4f}" for v in arr)
