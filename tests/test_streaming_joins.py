"""Streaming join parity: drained stream results == the batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_cookbook_spark.sources.testdata import load_table
from bigdata_cookbook_spark.streaming.events import stream_events
from bigdata_cookbook_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)


def _drain(stream_df, name: str, spark, mode: str = "append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    batch_events = load_table(spark, sf_dir, "events")
    dim = (
        batch_events.select("event_type")
        .distinct()
        .withColumn("type_code", F.crc32("event_type") % 1000)
    )
    stream = stream_events(spark, sf_dir)
    out = _drain(
        stream_static_enrich(stream, dim, "event_type").select(
            "event_id", "event_type", "type_code"
        ),
        "enrich_sink",
        spark,
    )
    batch = batch_events.join(dim, "event_type").select(
        "event_id", "event_type", "type_code"
    )
    assert _canon(out) == _canon(batch)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    batch_events = load_table(spark, sf_dir, "events")
    # correlate each user's click with purchases within the next 2 hours
    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        return clicks, purchases

    sc, sp = split(stream_events(spark, sf_dir))
    out = _drain(
        stream_stream_interval_join(sc, sp, "user_id", max_delay="2 hours"),
        "ssj_sink",
        spark,
    )
    bc, bp = split(batch_events)
    batch = (
        bc.alias("l")
        .join(
            bp.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") > F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 2 hours")),
        )
        .select(
            F.col("l.user_id").alias("user_id"),
            F.col("l.ts").alias("l_ts"),
            F.col("l.event_id").alias("l_event_id"),
            F.col("r.ts").alias("r_ts"),
            F.col("r.event_id").alias("r_event_id"),
        )
    )
    assert out.count() > 0, "fixture must produce at least one correlated pair"
    assert _canon(out) == _canon(batch)
