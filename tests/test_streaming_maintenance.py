"""State-table lifecycle (streaming/maintenance.py): delta
consolidation must bound file/dir counts WITHOUT changing state
content or any subsequent batch's results; the SRP plane guard must
fail loud on staleness and the re-bucket migration must land the state
a fresh pipeline at the new count would have built."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.sources.testdata import load_table
from bigdata_cookbook_spark.streaming.maintenance import (
    STATE_TABLES,
    consolidate_deltas,
    maintain_state,
    rebucket_srp_state,
    srp_planes_recommended,
)
from bigdata_cookbook_spark.streaming.pipeline import (
    _read_state,
    incremental_corpus_clean,
    streaming_corpus_clean,
)

SF = "/root/testdata/sf0.001"


def _delta_dirs(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        d for d in os.listdir(path) if d.startswith("ingest_batch=")
    )


def _rows(spark, path: str) -> set[tuple]:
    def h(v):
        return tuple(v) if isinstance(v, list) else v

    return {
        tuple(h(v) for v in r)
        for r in spark.read.parquet(path).drop("ingest_batch").collect()
    }


@pytest.fixture(scope="module")
def drained_state(spark, tmp_path_factory):
    """A 3-batch streaming_corpus_clean run with paragraph + span +
    semantic stages on (all six state tables + drop log populated),
    drained clean."""
    tmp = tmp_path_factory.mktemp("maint")
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # planted per-source boilerplate gives the paragraph stage real
    # cross-doc duplicates (the corpus itself has no newlines)
    docs = docs.withColumn(
        "text",
        F.concat(
            F.lit("BOILERPLATE-"),
            F.col("source"),
            F.lit("\n"),
            F.col("text"),
        ),
    )
    emb = load_table(spark, SF, "embeddings")
    sample = docs.filter(F.col("doc_id") < 3000)
    spool = str(tmp / "spool")
    os.makedirs(spool)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        sample.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(os.path.join(spool, f"f{i}"))
    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(spool, "*", "*.parquet"))
    )
    state = str(tmp / "state")
    q = streaming_corpus_clean(
        stream,
        state_dir=state,
        output_dir=str(tmp / "out"),
        checkpoint_dir=str(tmp / "ckpt"),
        near_dup="lsh",
        paragraph_sep="\n",
        span_tokens=5,
        embeddings_df=emb,
        semantic_n_planes=4,
    )
    assert q.awaitTermination(240), "stream did not drain"
    return {"state": state, "docs": docs, "emb": emb, "tmp": str(tmp)}


def test_maintain_state_bounds_dirs_preserves_content_and_next_batch(
    spark, drained_state
):
    """After 3 batches every state table holds 3 delta dirs; after
    maintain_state(keep_last=1) at most 2 (consolidated + newest) and
    one file per consolidated dir — with IDENTICAL content, and a 4th
    incremental batch computed against the compacted state equal in
    kept ids, every drop set, and every state delta to the same batch
    against an uncompacted copy."""
    state = drained_state["state"]
    # uncompacted twin for the next-batch comparison
    twin = os.path.join(drained_state["tmp"], "state_twin")
    shutil.copytree(state, twin)

    populated = [
        t for t in STATE_TABLES if os.path.isdir(os.path.join(state, t))
    ]
    assert set(populated) == set(STATE_TABLES)  # all seven in this run
    before = {t: _rows(spark, os.path.join(state, t)) for t in populated}
    for t in populated:
        assert len(_delta_dirs(os.path.join(state, t))) == 3

    stats = maintain_state(spark, state, keep_last=1, semantic_n_planes=4)
    for t in populated:
        dirs = _delta_dirs(os.path.join(state, t))
        assert len(dirs) <= 2, (t, dirs)
        assert stats[t]["merged"] == 2
        assert stats[t]["files_after"] <= stats[t]["files_before"]
        assert _rows(spark, os.path.join(state, t)) == before[t], t
    # idempotence: nothing left to merge at keep_last=1
    again = maintain_state(spark, state, keep_last=1)
    assert all(v["merged"] == 0 for v in again.values())

    # 4th batch against compacted vs uncompacted state: identical
    batch4 = (
        drained_state["docs"]
        .filter((F.col("doc_id") >= 3000) & (F.col("doc_id") < 4000))
    )
    emb = drained_state["emb"]
    band_cols = ["doc_id", "band", "k0", "k1"]

    def run(state_dir):
        return incremental_corpus_clean(
            batch4,
            seen_hashes=_read_state(spark, os.path.join(state_dir, "seen_hashes"), ["text_hash"]),
            shingle_state=_read_state(spark, os.path.join(state_dir, "shingles"), ["doc_id", "shingle", "n_sh"]),
            near_dup="lsh",
            bucket_state=_read_state(spark, os.path.join(state_dir, "buckets"), band_cols),
            paragraph_sep="\n",
            para_state=_read_state(spark, os.path.join(state_dir, "paras"), ["para_hash", "para"]),
            span_tokens=5,
            span_state=_read_state(spark, os.path.join(state_dir, "spans"), ["span_hash", "span"]),
            embeddings_df=emb,
            srp_state=_read_state(spark, os.path.join(state_dir, "embeddings"), ["vec_id", "bucket", "vec", "norm"]),
            semantic_n_planes=4,
        )

    got, want = run(state), run(twin)
    for key in sorted(set(got) & set(want)):
        g = {tuple(r) for r in got[key].collect()}
        w = {tuple(r) for r in want[key].collect()}
        assert g == w, key
    assert set(got) == set(want)


def test_consolidate_crash_rolls_forward(spark, tmp_path):
    """A manifest published but not promoted (crash mid-commit) must
    roll forward to the exact consolidated content on the next
    consolidate_deltas call — staged data wins, old deltas retire."""
    import json
    import uuid

    root = str(tmp_path / "t")
    for i, vals in enumerate([[1, 2], [3], [4, 5]]):
        spark.createDataFrame(
            [(v,) for v in vals], "x bigint"
        ).coalesce(1).write.parquet(os.path.join(root, f"ingest_batch={i}"))
    # stage what a keep_last=1 run would stage, write the manifest, then
    # "crash" before promoting anything
    cid = uuid.uuid4().hex[:8]
    tmp = os.path.join(root, f"._state_compact_{cid}")
    spark.read.parquet(
        os.path.join(root, "ingest_batch=0"), os.path.join(root, "ingest_batch=1")
    ).coalesce(1).write.parquet(os.path.join(tmp, "ingest_batch=0"))
    os.makedirs(os.path.join(tmp, "ingest_batch=1"))
    manifest = os.path.join(root, f"._commit_manifest_{cid}.json")
    with open(manifest + ".tmp", "w") as f:
        json.dump(
            {"base": root, "tmp": tmp, "promote": ["ingest_batch=0", "ingest_batch=1"]},
            f,
        )
    os.rename(manifest + ".tmp", manifest)

    r = consolidate_deltas(spark, root, keep_last=1)  # recovers, then no-op
    assert not os.path.exists(manifest)
    assert _rows(spark, root) == {(1,), (2,), (3,), (4,), (5,)}
    assert r["merged"] == 0  # roll-forward consumed the pending merge
    dirs = _delta_dirs(root)
    assert len([d for d in dirs if _rows(spark, os.path.join(root, d))]) <= 2


def test_plane_guard_raises_and_rebucket_migrates(spark, tmp_path):
    """Grow the embeddings state past its bucket target: maintain_state
    fail-louds naming the recommended count; rebucket_srp_state then
    rewrites every bucket at the new count in one consolidated delta —
    equal to what a pipeline pinned at the new count would persist
    (every-arrival state rule: same vectors, recomputed buckets) — and
    the next batch's semantic drops match a fresh-state run."""
    from bigdata_cookbook_spark.operators.dedup import (
        default_srp_planes_for,
        semantic_dedup_incremental,
        srp_bucket_expr,
        srp_planes,
    )

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n = emb.count()
    assert n > 64 * 2**4  # enough rows that recommended > pinned 4
    rec_expected = default_srp_planes_for(n)

    state_dir = str(tmp_path / "state")
    emb_root = os.path.join(state_dir, "embeddings")
    # build a 2-delta state at the stale pinned count (4 planes),
    # via the real incremental operator
    mid = int(emb.approxQuantile("vec_id", [0.5], 0.0)[0])
    b1 = emb.filter(F.col("vec_id") <= mid)
    b2 = emb.filter(F.col("vec_id") > mid)
    r1 = semantic_dedup_incremental(b1, None, n_planes=4, dim=64)
    r1["new_state"].write.parquet(os.path.join(emb_root, "ingest_batch=0"))
    st0 = _read_state(spark, emb_root, ["vec_id", "bucket", "vec", "norm"])
    r2 = semantic_dedup_incremental(b2, st0, n_planes=4, dim=64)
    r2["new_state"].write.parquet(os.path.join(emb_root, "ingest_batch=1"))

    assert srp_planes_recommended(spark, state_dir) == rec_expected
    with pytest.raises(RuntimeError, match=f"calls for {rec_expected}"):
        maintain_state(spark, state_dir, semantic_n_planes=4)

    new_planes = rebucket_srp_state(spark, state_dir)
    assert new_planes == rec_expected
    assert len(_delta_dirs(emb_root)) == 1  # whole state consolidated
    migrated = spark.read.parquet(emb_root)
    # every bucket equals the expression at the new plane count
    planes = srp_planes(64, new_planes)
    mismatch = migrated.withColumn(
        "want", srp_bucket_expr(F.col("vec"), planes)
    ).filter(F.col("bucket") != F.col("want"))
    assert mismatch.count() == 0
    # guard satisfied at the new pin
    maintain_state(spark, state_dir, semantic_n_planes=new_planes)

    # next batch at the new count == the same batch against a state
    # built from scratch at the new count (every-arrival rule makes the
    # vector sets identical, so only buckets could differ)
    nxt = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding", "label"
    ).limit(200)
    mig_state = _read_state(spark, emb_root, ["vec_id", "bucket", "vec", "norm"])
    fresh = semantic_dedup_incremental(
        emb, None, n_planes=new_planes, dim=64
    )["new_state"]
    got = semantic_dedup_incremental(
        nxt, mig_state, n_planes=new_planes, dim=64
    )
    want = semantic_dedup_incremental(
        nxt, fresh, n_planes=new_planes, dim=64
    )
    assert {r[0] for r in got["dropped"].collect()} == {
        r[0] for r in want["dropped"].collect()
    }


def test_keep_last_above_delta_count_keeps_everything(spark, tmp_path):
    """keep_last greater than the number of deltas must merge NOTHING —
    the naive python slice ids[:len-keep] would wrap negative and merge
    all but one delta, the opposite of what the caller asked for."""
    root = str(tmp_path / "hashes")
    for i in range(3):
        spark.createDataFrame([(f"h{i}",)], "text_hash string").write.parquet(
            os.path.join(root, f"ingest_batch={i}")
        )
    before = _rows(spark, root)
    stats = consolidate_deltas(spark, root, keep_last=5)
    assert stats["merged"] == 0
    assert _delta_dirs(root) == [f"ingest_batch={i}" for i in range(3)]
    assert _rows(spark, root) == before


def test_orphaned_staging_dir_is_swept(spark, tmp_path):
    """A crash BEFORE the manifest publishes leaves a ._state_compact_*
    staging dir with a full consolidated copy; no manifest references
    it, so the next consolidation must sweep it instead of leaking a
    state-sized copy per failed run."""
    root = str(tmp_path / "hashes")
    for i in range(3):
        spark.createDataFrame([(f"h{i}",)], "text_hash string").write.parquet(
            os.path.join(root, f"ingest_batch={i}")
        )
    orphan = os.path.join(root, "._state_compact_deadbeef")
    os.makedirs(os.path.join(orphan, "ingest_batch=0"))
    with open(os.path.join(orphan, "ingest_batch=0", "junk.parquet"), "w") as f:
        f.write("x")
    before = _rows(spark, root)
    consolidate_deltas(spark, root, keep_last=1)
    assert not os.path.exists(orphan)
    assert _rows(spark, root) == before


def test_rebucket_on_schema_only_state_is_noop(spark, tmp_path):
    """Every micro-batch writes its embeddings delta even when zero
    docs carried embeddings; rebucket over such a schema-only state
    must return the plane count without crashing on the dim probe."""
    state = str(tmp_path / "state")
    emb_root = os.path.join(state, "embeddings")
    empty = spark.createDataFrame(
        [], "vec_id bigint, vec array<float>, bucket string"
    )
    empty.write.parquet(os.path.join(emb_root, "ingest_batch=0"))
    got = rebucket_srp_state(spark, state, n_planes=6)
    assert got == 6


def test_refresh_prune_thresholds_roundtrip(spark, tmp_path):
    """Maintenance recomputes the per-domain cut over the accumulated
    kept output and the restarted stream's pinned prune equals a batch
    prune of that same corpus."""
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.operators.corpus import quality_prune
    from bigdata_cookbook_spark.sources.testdata import load_table
    from bigdata_cookbook_spark.streaming.maintenance import (
        refresh_prune_thresholds,
    )
    from bigdata_cookbook_spark.streaming.pipeline import (
        incremental_corpus_clean,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out_dir = str(tmp_path / "kept")
    # simulate two shipped batches of kept output
    r1 = incremental_corpus_clean(docs.filter(F.col("doc_id") % 2 == 0))
    r1["kept"].write.mode("overwrite").parquet(out_dir + "/ingest_batch=0")
    r2 = incremental_corpus_clean(
        docs.filter(F.col("doc_id") % 2 == 1),
        seen_hashes=r1["new_hashes"],
        shingle_state=r1["new_shingles"],
    )
    r2["kept"].write.mode("overwrite").parquet(out_dir + "/ingest_batch=1")

    thr_path = refresh_prune_thresholds(
        spark, out_dir, str(tmp_path / "prune_thresholds"), keep_frac=0.5
    )
    thr = spark.read.parquet(thr_path)
    corpus = spark.read.parquet(out_dir)
    want = {
        r.doc_id
        for r in quality_prune(corpus, "n_tokens", "source", 0.5).collect()
    }
    got = {
        r.doc_id
        for r in quality_prune(
            corpus, "n_tokens", "source", thresholds=thr
        ).collect()
    }
    assert got == want and len(got) > 0
