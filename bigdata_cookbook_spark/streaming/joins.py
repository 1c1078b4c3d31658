"""Streaming joins (Structured Streaming tier, SURVEY.md §2.10 extension).

Two join shapes a live deployment of the reference's workflows needs that
the batch tier gets for free:

- **stream-static enrichment** — the J11 broadcast-dim pattern on a
  stream: every micro-batch joins against the (slowly-changing) entity
  dimension. No watermark needed; the static side is re-resolvable per
  batch, which is exactly how dim updates propagate.

- **stream-stream interval join** — correlate two event streams on a key
  within a bounded event-time window (e.g. a click followed by a purchase
  from the same user within an hour). Both sides carry watermarks and the
  join condition carries the time interval — that pair is what lets the
  engine expire join state; an unbounded stream-stream equi-join would
  grow state forever and is rejected by Spark's unsupported-operation
  check.

Drained-stream parity with the equivalent batch join is the correctness
contract (tests/test_streaming_joins.py), mirroring the rest of the
streaming tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Enrich a stream with a static dimension (per-micro-batch join).

    The static side is marked broadcast: at scale the dim is orders of
    magnitude smaller than the stream's arrival rate, and a shuffle of
    stream state on the join key would otherwise dominate each batch.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_delay: str = "1 hour",
    watermark: str = "1 day",
    time_col: str = "ts",
) -> DataFrame:
    """Inner-join two event streams: rows share `key` and the right event
    lands within (left.ts, left.ts + max_delay].

    Watermarks on BOTH sides plus the interval predicate bound the join
    state: each side keeps at most watermark + max_delay of history per
    key. Output columns are the key, both timestamps, and both payloads
    prefixed l_/r_ (explicit projection — a raw `*, *` join of two
    same-schema streams would collide).
    """
    lw = left.withWatermark(time_col, watermark).alias("l")
    rw = right.withWatermark(time_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{time_col}") > F.col(f"l.{time_col}"))
        & (
            F.col(f"r.{time_col}")
            <= F.col(f"l.{time_col}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = lw.join(rw, cond, "inner")
    keep = [F.col(f"l.{key}").alias(key)]
    for side in ("l", "r"):
        src = left if side == "l" else right
        for c in src.columns:
            if c == key:
                continue
            keep.append(F.col(f"{side}.{c}").alias(f"{side}_{c}"))
    return joined.select(*keep)
