"""Runnable example: continuous-ingest corpus cleaning — the streaming
twin of examples/pretraining_data_pipeline.py, with every round-5 stage
on:

    [span dedup vs span state] -> quality (+ Gopher repetition rules)
    -> exact dedup (vs hash state) -> LSH near-dup (vs bucket state,
    exact-Jaccard verified) -> decontamination vs a held-out eval set
    -> semantic dedup (vs SRP embedding state)

Two document batches are spooled as files and drained one per
micro-batch through streaming_corpus_clean (foreachBatch over
Structured Streaming). Each batch signs in against five append-only
parquet state tables (seen_hashes / shingles / buckets / spans /
embeddings) whose per-batch deltas land under ingest_batch=<id>
directories — the crash-replay-safe discipline of
streaming/pipeline.py. A third drain pass demonstrates replay safety:
no new files, no state growth, nothing re-kept.

Outputs under <out_dir>:

    kept/ingest_batch=<id>/   per-batch survivors (the training corpus,
                              growing as ingest proceeds)
    state/...                 the five state tables
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
MID = 250  # doc_id split between the two ingest batches


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
    emb = load_table(spark, SF_DIR, "embeddings")
    eval_df = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id", "text")

    # spool: one file per ingest batch, drained in order (the stand-in
    # for a message queue / landing bucket)
    spool = os.path.join(out_dir, "spool")
    os.makedirs(spool, exist_ok=True)
    docs.filter(F.col("doc_id") <= MID).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(spool, "f1"))
    docs.filter(F.col("doc_id") > MID).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(spool, "f2"))

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
    if not q.awaitTermination(300):
        raise RuntimeError("stream did not drain")

    kept = spark.read.parquet(kept_dir)
    n_batches = kept.select("ingest_batch").distinct().count()
    n_kept = kept.count()

    # replay safety: draining again (same spool, same checkpoint) adds
    # nothing — the checkpoint says both files are processed
    q2 = streaming_corpus_clean(
        stream,
        state_dir=state,
        output_dir=kept_dir,
        checkpoint_dir=ckpt,
        eval_df=eval_df,
        **stages,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(kept_dir).count() == n_kept

    # parity: the batch-callable chain over the same two batches yields
    # the same kept ids (the foreachBatch sink is just plumbing)
    b1 = docs.filter(F.col("doc_id") <= MID)
    b2 = docs.filter(F.col("doc_id") > MID)
    r1 = incremental_corpus_clean(b1, eval_df=eval_df, **stages)
    r2 = incremental_corpus_clean(
        b2,
        seen_hashes=r1["new_hashes"],
        shingle_state=r1["new_shingles"],
        bucket_state=r1["new_buckets"],
        span_state=r1["new_spans"],
        srp_state=r1["new_embeddings"],
        eval_df=eval_df,
        **stages,
    )
    want = {r.doc_id for r in r1["kept"].select("doc_id").collect()} | {
        r.doc_id for r in r2["kept"].select("doc_id").collect()
    }
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

    summary = {
        "batches": n_batches,
        "kept": n_kept,
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
