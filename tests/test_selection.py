"""DSIR importance-resampling data selection (operators/selection.py):
feature parity with a Python reference, exact-integer score portability,
deterministic + Gumbel selection semantics."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import ANALYZER_SEP_RE
from bigdata_cookbook_spark.operators.selection import (
    LR_SCALE,
    dsir_logratio_table,
    dsir_scores,
    dsir_scores_projected,
    dsir_select,
    dsir_topk,
    gram_array_expr,
    gram_bucket_expr,
    gumbel_topk,
)

TEXTS = [
    "Spark reads fast; Spark writes fast.",
    "duck db reads",
    "one",
    "",
    "spark spark spark joins",
    "target words appear here: alignment safety evals",
    "alignment safety evals alignment safety",
]

# Python reference analyzer: the Java \pL/\pN classes over this ASCII
# test data reduce to [^a-z0-9]+ after lowercasing
_SEP = re.compile(r"[^a-z0-9]+")


def _grams(text: str) -> list[str]:
    toks = [t for t in _SEP.split(text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram: str, n: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gram_array_matches_python_reference(spark):
    rows = (
        _docs(spark)
        .select("doc_id", gram_array_expr(F.col("text")).alias("g"))
        .orderBy("doc_id")
        .collect()
    )
    for r in rows:
        assert r.g == _grams(TEXTS[r.doc_id]), TEXTS[r.doc_id]


def test_bucket_matches_python_md5(spark):
    grams = sorted({g for t in TEXTS for g in _grams(t)})
    df = spark.createDataFrame([(g,) for g in grams], "gram string")
    rows = df.select(
        "gram", gram_bucket_expr(F.col("gram"), 64).alias("b")
    ).collect()
    for r in rows:
        assert r.b == _bucket(r.gram, 64), r.gram


def _py_logratio(target_texts, raw_texts, n_buckets, alpha=1.0):
    def counts(texts):
        ct = [0] * n_buckets
        for t in texts:
            for g in _grams(t):
                ct[_bucket(g, n_buckets)] += 1
        return ct

    ct_t, ct_r = counts(target_texts), counts(raw_texts)
    tt, tr = sum(ct_t), sum(ct_r)
    b = float(n_buckets)
    out = {}
    for i in range(n_buckets):
        lr = math.log((ct_t[i] + alpha) / (tt + alpha * b)) - math.log(
            (ct_r[i] + alpha) / (tr + alpha * b)
        )
        # Python round() is half-even, Spark/DuckDB ROUND is half-away;
        # ln values never land exactly on the micro lattice, so floor
        # of x+0.5 (half-away for positives, close enough off-lattice)
        # agrees — pinned here by exact equality on real values
        out[i] = math.floor(lr * LR_SCALE + 0.5)
    return out, ct_t, ct_r


def test_logratio_table_exact(spark):
    n = 32
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") >= 5)
    lr = dsir_logratio_table(target, docs, n_buckets=n)
    got = {r.bucket: r.lr_micro for r in lr.collect()}
    want, _, _ = _py_logratio(TEXTS[5:], TEXTS, n)
    assert len(got) == n  # every bucket present incl. zero-count ones
    assert got == want
    assert dict(lr.dtypes)["lr_micro"] == "bigint"


def test_scores_exact_and_total_coverage(spark):
    n = 32
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") >= 5)
    lr = dsir_logratio_table(target, docs, n_buckets=n)
    scores = {
        r.doc_id: r.score
        for r in dsir_scores(docs, lr, n_buckets=n).collect()
    }
    want_lr, _, _ = _py_logratio(TEXTS[5:], TEXTS, n)
    assert len(scores) == len(TEXTS)  # every doc scored
    for i, t in enumerate(TEXTS):
        want = sum(want_lr[_bucket(g, n)] for g in _grams(t)) / LR_SCALE
        assert scores[i] == pytest.approx(want, abs=0), (i, t)
    # the empty document has no grams -> exactly 0.0
    assert scores[3] == 0.0
    # target-looking docs outscore off-target ones
    assert scores[6] > scores[0]


def test_projected_scores_match_join_path(spark):
    n = 32
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") >= 5)
    lr = dsir_logratio_table(target, docs, n_buckets=n)
    join_path = {
        r.doc_id: r.score for r in dsir_scores(docs, lr, n_buckets=n).collect()
    }
    projected = {
        r.doc_id: r.score for r in dsir_scores_projected(docs, lr).collect()
    }
    assert projected == join_path  # exact — both are integer micro sums
    # the projected plan must stay a pure projection: no exchange
    plan = dsir_scores_projected(docs, lr)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re as _re

    nodes = _re.findall(r"^\(\d+\) (\S+)", plan, _re.M)
    assert sum(1 for x in nodes if x == "Exchange") == 0
    assert not any("Join" in x for x in nodes)


def test_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    rows = dsir_topk(df, 2).collect()
    assert [(r.doc_id, r.score) for r in rows] == [(1, 2.0), (2, 2.0)]


def test_gumbel_seeded_and_temperature_limits(spark):
    n = 32
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") >= 5)
    lr = dsir_logratio_table(target, docs, n_buckets=n)
    scores = dsir_scores(docs, lr, n_buckets=n)
    a = {r.doc_id for r in gumbel_topk(scores, 3, seed=1).collect()}
    b = {r.doc_id for r in gumbel_topk(scores, 3, seed=1).collect()}
    assert a == b  # deterministic given the seed
    # temperature -> 0: score/T dominates the noise, recovering top-k
    cold = {
        r.doc_id for r in gumbel_topk(scores, 3, temperature=1e-9).collect()
    }
    det = {r.doc_id for r in dsir_topk(scores, 3).collect()}
    assert cold == det
    # a different seed eventually differs (3-of-7 draws, 10 seeds)
    assert any(
        {r.doc_id for r in gumbel_topk(scores, 3, seed=s).collect()} != a
        for s in range(2, 12)
    )


def test_dsir_select_end_to_end_and_mode_contract(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") >= 5)
    top = dsir_select(docs, target, k=2, n_buckets=32)
    ids = [r.doc_id for r in top.collect()]
    assert ids == [5, 6]  # the target docs themselves win
    with pytest.raises(ValueError, match="mode"):
        dsir_select(docs, target, k=2, n_buckets=32, mode="nope")


def test_pipeline_dsir_stage(spark):
    """Capstone integration: dsir_target keeps exactly dsir_keep_k
    survivors, spiked target-like docs win, accounting sums exactly."""
    from pyspark.sql import functions as SF

    from bigdata_cookbook_spark.sources.testdata import load_table
    from bigdata_cookbook_spark.workflows import pretraining_pipeline

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # spike doc_id % 9 == 0 docs with distinctive grams, interleaving a
    # per-doc token so spiked docs do NOT become near-duplicates of each
    # other (an identical long suffix would be deduped away upstream),
    # and repeated enough to dominate the per-gram penalty the doc body
    # pays under the target LM (unnormalized DSIR weights scale with
    # length)
    planted = docs.withColumn(
        "text",
        SF.when(
            SF.col("doc_id") % 9 == 0,
            SF.concat(
                SF.col("text"),
                SF.expr(
                    "repeat(concat(' alignment safety evals u', "
                    "cast(doc_id as string)), 12)"
                ),
            ),
        ).otherwise(SF.col("text")),
    )
    # target = the spiked distribution itself: common corpus grams stay
    # ~neutral in the log-ratio, the spike grams carry the weight
    target = planted.filter(SF.col("doc_id") % 9 == 0).select("text")
    # 50 docs at sf0.001 -> ~6 spiked; keep k BELOW the spiked-survivor
    # count so "all kept are spiked" is the strongest assertable claim
    k = 4
    out = pretraining_pipeline(
        planted, dsir_target=target, dsir_keep_k=k, dsir_n_buckets=256
    )
    acc = {r.stage: r.n_dropped for r in out["accounting"].collect()}
    assert "dropped_dsir" in acc
    kept = out["clean"].collect()
    assert len(kept) == k
    assert planted.count() - sum(acc.values()) == out["training_set"].count()
    # every selected doc is a spiked one (spiked docs dominate the LR)
    assert all(r.doc_id % 9 == 0 for r in kept)
    out["clean"].unpersist()


def test_pipeline_dsir_requires_k(spark):
    import pytest as _pytest

    from bigdata_cookbook_spark.workflows import pretraining_pipeline

    df = spark.createDataFrame(
        [(1, "t", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    with _pytest.raises(ValueError, match="dsir_keep_k"):
        pretraining_pipeline(df, dsir_target=df.select("text"))


def test_normalized_scores_remove_length_bias(spark):
    """Raw DSIR weights scale with length; the normalized form ranks a
    short on-target doc above a long off-target one."""
    from bigdata_cookbook_spark.operators.selection import (
        dsir_scores_projected as proj,
    )

    texts = [
        "alignment safety evals",  # short, pure target
        ("spark table join merge window sort " * 30).strip(),  # long, off-target
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [("alignment safety evals alignment safety evals",)], "text string"
    )
    lr = dsir_logratio_table(target, docs, n_buckets=64)
    norm = {r.doc_id: r.score for r in proj(docs, lr, normalize=True).collect()}
    assert norm[0] > norm[1]
    # normalized score of the pure-target doc is its mean per-gram lr:
    # strictly positive; the off-target doc's is negative
    assert norm[0] > 0 > norm[1]


def test_dsir_gate_stateless_and_batch_split_invariant(spark):
    """The gate is a pure per-row predicate: running it on two halves
    of the corpus yields exactly the rows of one whole-corpus run, and
    the same expression attaches to a streaming DataFrame."""
    from bigdata_cookbook_spark.operators.selection import dsir_gate

    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") >= 5)
    lr = dsir_logratio_table(target, docs, n_buckets=32)
    whole = {r.doc_id for r in dsir_gate(docs, lr, threshold=0.0).collect()}
    a = dsir_gate(docs.filter(F.col("doc_id") % 2 == 0), lr, 0.0)
    b = dsir_gate(docs.filter(F.col("doc_id") % 2 == 1), lr, 0.0)
    halves = {r.doc_id for r in a.collect()} | {r.doc_id for r in b.collect()}
    assert halves == whole and whole  # non-empty, split-invariant
    # streaming composability: the gate attaches to a readStream frame
    # without touching unsupported operations (no sort, no limit)
    import tempfile

    d = tempfile.mkdtemp(prefix="dsir_stream_")
    docs.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)
    gated = dsir_gate(stream, lr, threshold=0.0)
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory")
        .queryName("dsir_gate_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.sql("SELECT doc_id FROM dsir_gate_t").collect()
    }
    assert got == whole
