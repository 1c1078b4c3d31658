"""Structured Streaming tier (SURVEY.md §2.10 — extension, not parity).

The reference is batch-only; this tier re-expresses the W5 bucketing
family on event-time with watermarks so the same analytics run over a
live stream. Declared engine semantics:

- event time = ``ts``; late data beyond the watermark is dropped;
- tumbling windows via ``window(ts, size)``; results identical to the
  batch date_trunc aggregation once the stream is drained (tested with
  availableNow + memory sink vs the batch plan);
- streaming dedup = dropDuplicates on event_id within the watermark.

At scale the source is Kafka/Delta instead of parquet-file streaming; the
transformations are unchanged (that's the point of Structured Streaming).

Late-data caveat (measured, pinned by tests/test_streaming_latedata.py):
under the default microbatch trigger, rows older than the watermark are
dropped at the state operator (the canonical contract). Under
Trigger.AvailableNow, the late filter evaluates with the run-START
watermark, so late files arriving within the same drain are NOT dropped —
fine for the total-drain parity tests (in-order data), but real late-data
enforcement needs the default trigger across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str, stream_dir: str | None = None) -> DataFrame:
    """readStream over an events parquet directory with the same ts
    normalization as the batch loader (nanos -> timestamp).

    Spark's file streaming source requires a *directory* (it tails new
    files); ``stream_dir`` points at one containing events-schema parquet
    files. Defaults to staging the sf events file into a local spool dir —
    at scale the spool is the landing zone files arrive into.
    """
    from bigdata_cookbook_spark.sources.testdata import load_table

    batch_schema = load_table(spark, sf_dir, "events").schema
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    if stream_dir is None:
        import os
        import tempfile

        stream_dir = os.path.join(
            tempfile.gettempdir(), "bcs_stream", sf_dir.strip("/").replace("/", "_")
        )
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, "events.parquet")
        # ABSOLUTE target: a relative sf_dir would resolve relative to
        # the link's own directory — a dangling symlink that
        # os.path.exists() reports absent, so the old guard re-created
        # it into EEXIST on every later session. Replace any stale or
        # differently-targeted link (lexists sees dangling ones).
        target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
        if os.path.lexists(link):
            if os.path.islink(link) and os.readlink(link) == target:
                pass  # correct link already in place
            else:
                os.remove(link)
        if not os.path.lexists(link):
            os.symlink(target, link)
    stream = spark.readStream.schema(raw_schema).format("parquet").load(stream_dir)
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # watermarks require TIMESTAMP; under the loader's UTC session the
        # cast preserves wall-clock values (same rule as the batch loader)
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    assert stream.schema == batch_schema
    return stream


def windowed_counts(
    stream: DataFrame,
    window_size: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """W5 on event time: tumbling-window counts per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "cnt",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """O4 on a stream: exactly-once rows per event_id within the
    watermark horizon (state bounded by the watermark)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def sliding_counts(
    stream: DataFrame,
    window_size: str = "2 days",
    slide: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding event-time windows: each event lands in size/slide
    overlapping windows (window_size must be a multiple of slide)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").cast("date").alias("win_start"),
            F.col("w.end").cast("date").alias("win_end"),
            "event_type",
            "cnt",
        )
    )


def session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-user session windows: events within ``gap`` of each other merge
    into one session (F.session_window — state bounded by watermark)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            F.round("session_value", 2).alias("session_value"),
        )
    )
