"""Runnable example: continuous-ingest corpus cleaning — the streaming
twin of examples/pretraining_data_pipeline.py, with every optional
stage on:

    [paragraph dedup vs paragraph state]
    -> [span dedup vs span state] -> quality (+ Gopher repetition rules)
    -> exact dedup (vs hash state) -> LSH near-dup (vs bucket state,
    exact-Jaccard verified) -> decontamination vs a held-out eval set
    -> semantic dedup (vs SRP embedding state)

Three document batches are spooled as files and drained one per
micro-batch through streaming_corpus_clean (foreachBatch over
Structured Streaming). Each batch signs in against six append-only
parquet state tables (seen_hashes / shingles / buckets / paras /
spans / embeddings) whose per-batch deltas land under ingest_batch=<id>
directories — the crash-replay-safe discipline of
streaming/pipeline.py. A further drain pass demonstrates replay
safety: no new files, no state growth, nothing re-kept. Finally the
NIGHTLY MAINTENANCE step runs with the stream quiesced
(streaming.maintenance.maintain_state, keep_last=1): the two older
deltas of every state table consolidate into one directory, the
newest stays intact for crash replay, the pinned SRP plane count is
staleness-checked, and the example asserts state CONTENT is preserved
exactly through the consolidation.

Outputs under <out_dir>:

    kept/ingest_batch=<id>/   per-batch survivors (the training corpus,
                              growing as ingest proceeds)
    state/...                 the six state tables
    summary.json              per-batch kept/drop accounting + the
                              parity check vs the batch-callable chain

Run:  python examples/incremental_ingest_pipeline.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
# three ingest batches by doc_id range (sf0.001 corpus = ids 0..499)
BATCH_RANGES = [(0, 170), (170, 340), (340, 500)]


def _state_rows(spark: SparkSession, path: str) -> set[tuple]:
    """Content snapshot of one state table, ignoring which delta a row
    lives in (ingest_batch changes when deltas merge; rows must not)."""

    def h(v):
        return tuple(v) if isinstance(v, list) else v

    return {
        tuple(h(v) for v in r)
        for r in spark.read.parquet(path).drop("ingest_batch").collect()
    }


def main(spark: SparkSession, out_dir: str) -> dict:
    from bigdata_cookbook_spark.sources.testdata import load_table
    from bigdata_cookbook_spark.streaming.pipeline import (
        incremental_corpus_clean,
        streaming_corpus_clean,
    )

    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # the synthetic corpus has no newlines; plant one boilerplate
    # paragraph per source (the repeated-footer shape the paragraph
    # stage exists for) so the stage has real work to do
    docs = docs.withColumn(
        "text",
        F.concat(
            F.lit("BOILERPLATE-"),
            F.col("source"),
            F.lit("\n"),
            F.col("text"),
        ),
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    eval_df = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id", "text")

    # spool: one file per ingest batch, drained in order (the stand-in
    # for a message queue / landing bucket). Three batches so the
    # maintenance pass below has something to consolidate (keep_last=1
    # preserves the newest; the older two merge into one delta).
    spool = os.path.join(out_dir, "spool")
    os.makedirs(spool, exist_ok=True)
    for i, (lo, hi) in enumerate(BATCH_RANGES, start=1):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(spool, f"f{i}")
        )

    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(spool, "*", "*.parquet"))
    )

    state = os.path.join(out_dir, "state")
    kept_dir = os.path.join(out_dir, "kept")
    ckpt = os.path.join(out_dir, "ckpt")
    stages = dict(
        near_dup="lsh",
        paragraph_sep="\n",
        span_tokens=5,
        repetition_filter=True,
        embeddings_df=emb,
        semantic_n_planes=4,
    )
    q = streaming_corpus_clean(
        stream,
        state_dir=state,
        output_dir=kept_dir,
        checkpoint_dir=ckpt,
        eval_df=eval_df,
        **stages,
    )
    # three micro-batches with every stage on: ~2-4 min under CI load
    if not q.awaitTermination(720):
        raise RuntimeError("stream did not drain")

    kept = spark.read.parquet(kept_dir)
    n_batches = kept.select("ingest_batch").distinct().count()
    n_kept = kept.count()

    # replay safety: draining again (same spool, same checkpoint) adds
    # nothing — the checkpoint says all three files are processed
    q2 = streaming_corpus_clean(
        stream,
        state_dir=state,
        output_dir=kept_dir,
        checkpoint_dir=ckpt,
        eval_df=eval_df,
        **stages,
    )
    q2.awaitTermination(240)
    assert spark.read.parquet(kept_dir).count() == n_kept

    # parity: the batch-callable chain over the same three batches
    # yields the same kept ids (the foreachBatch sink is just plumbing)
    want: set[int] = set()
    chain_state: dict = {}
    delta_keys = [
        ("seen_hashes", "new_hashes"),
        ("shingle_state", "new_shingles"),
        ("bucket_state", "new_buckets"),
        ("para_state", "new_paras"),
        ("span_state", "new_spans"),
        ("srp_state", "new_embeddings"),
    ]
    for lo, hi in BATCH_RANGES:
        b = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        r = incremental_corpus_clean(b, eval_df=eval_df, **chain_state, **stages)
        want |= {row.doc_id for row in r["kept"].select("doc_id").collect()}
        # the new_* outputs are per-batch DELTAS: the chain's state is
        # the running union (exactly what the parquet state dirs hold).
        # localCheckpoint cuts the lineage — without it batch N's plan
        # re-executes every earlier batch's whole cleaning chain per
        # state reference (measured 3x the wall-clock at three batches).
        for param, out_key in delta_keys:
            prev = chain_state.get(param)
            chain_state[param] = (
                r[out_key] if prev is None else prev.unionByName(r[out_key])
            ).localCheckpoint()
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got == want, "streaming kept set != batch-callable chain"

    # the streaming audit trail: per-batch, per-stage drop counts from
    # the (stage, doc_id) drop log — the batch capstone's accounting,
    # reconstructable at any point of the corpus's life
    drops = spark.read.parquet(os.path.join(state, "drops"))
    audit = {
        f"batch{r.ingest_batch}/{r.stage}": r.n
        for r in drops.groupBy("ingest_batch", "stage")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # nightly maintenance (stream quiesced — both drains terminated):
    # consolidate each state table's per-batch deltas into one delta +
    # the newest (keep_last=1, the crash-replay guard), with the
    # pinned plane count checked for staleness. Content must be
    # preserved exactly: the audit trail and every future batch's
    # dedup decisions read the same rows afterward.
    from bigdata_cookbook_spark.streaming.maintenance import maintain_state

    pre_rows = {
        t: _state_rows(spark, os.path.join(state, t))
        for t in sorted(os.listdir(state))
    }
    maint = maintain_state(
        spark, state, keep_last=1, semantic_n_planes=stages["semantic_n_planes"]
    )
    for t, rows in pre_rows.items():
        assert _state_rows(spark, os.path.join(state, t)) == rows, t

    summary = {
        "batches": n_batches,
        "kept": n_kept,
        "maintenance": {
            t: {"merged": m["merged"], "files_after": m["files_after"]}
            for t, m in sorted(maint.items())
        },
        "state_tables": sorted(os.listdir(state)),
        "per_batch_kept": {
            str(r.ingest_batch): r.n
            for r in kept.groupBy("ingest_batch")
            .agg(F.count("*").alias("n"))
            .collect()
        },
        "drop_audit": audit,
        "parity_vs_batch_chain": True,
    }
    summary_path = os.path.join(out_dir, "summary.json")
    with open(summary_path, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return {"kept": kept_dir, "state": state, "summary": summary_path}


if __name__ == "__main__":
    from bigdata_cookbook_spark.session import get_spark

    session = get_spark("incremental-ingest-example")
    session.sparkContext.setLogLevel("ERROR")
    paths = main(session, sys.argv[1] if len(sys.argv) > 1 else "out/incremental_ingest")
    print(json.dumps(paths))
