"""Checkpoint-based restart: a restarted stream resumes from committed
source offsets (no reprocessing, no duplicates) — the exactly-once
ingestion contract the streaming tier's production story rests on."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Row


def _write_file(spark, rows, spool, name):
    tmp = os.path.join(spool, f"__tmp_{name}")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), os.path.join(spool, f"{name}.parquet"))
    shutil.rmtree(tmp)


def _drain_to_parquet(spark, spool, out, ckpt):
    stream = spark.readStream.schema("event_id bigint, k string").parquet(spool)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_restart_resumes_from_offsets_no_duplicates(spark, tmp_path):
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(spool)

    batch1 = [Row(event_id=i, k="a") for i in range(100)]
    _write_file(spark, batch1, spool, "f1")
    q1 = _drain_to_parquet(spark, spool, out, ckpt)
    assert spark.read.parquet(out).count() == 100

    # "restart": a NEW query over the same checkpoint; f1 must not rerun
    batch2 = [Row(event_id=i, k="b") for i in range(100, 150)]
    _write_file(spark, batch2, spool, "f2")
    q2 = _drain_to_parquet(spark, spool, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 150, "restart must process only the new file"
    assert got.select("event_id").distinct().count() == 150, "no duplicates"
    # the second run's progress shows only batch2's rows were read
    read_rows = sum(p["numInputRows"] for p in q2.recentProgress)
    assert read_rows == 50


def test_fresh_checkpoint_reprocesses_everything(spark, tmp_path):
    """Control: without the old checkpoint the source starts from scratch
    — proving the resume above came from the offset log, not the sink."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _write_file(spark, [Row(event_id=i, k="a") for i in range(40)], spool, "f1")
    _write_file(spark, [Row(event_id=i, k="b") for i in range(40, 60)], spool, "f2")
    out = str(tmp_path / "out_fresh")
    q = _drain_to_parquet(spark, spool, out, str(tmp_path / "ckpt_fresh"))
    assert spark.read.parquet(out).count() == 60
    assert sum(p["numInputRows"] for p in q.recentProgress) == 60
