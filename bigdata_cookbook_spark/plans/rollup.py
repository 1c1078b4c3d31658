"""Continuous aggregate (hypertable-rollup style): an incrementally
maintained time-bucketed rollup table with transparent query rewrite.

The reference recomputes every weekly/monthly hit-count series from raw
rows per notebook run (tool.py:1219-1263). At 100 TB that full re-scan
per dashboard refresh is the dominant cost, and the standard fix is the
timescale/materialized-view pattern:

- a **rollup table** holds per-(bucket, keys) partial aggregates for all
  CLOSED buckets, laid out date-partitioned so refresh appends/overwrites
  only new bucket partitions (dynamic partition overwrite — idempotent
  under re-run, resumable after a crash);
- **refresh** scans only raw rows newer than the rollup's high-water
  mark (partition pruning on the raw side at scale);
- **query** unions the rollup for closed buckets with an on-the-fly
  aggregate of the raw tail (the current, still-open bucket), so results
  are always exact and fresh.

Only algebraic/partial-mergeable aggregates are maintainable this way —
count/sum/min/max here (avg = sum/count downstream). The same contract
that makes map-side combine and salted_agg (operators/skew.py) work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SUPPORTED = {"count", "sum", "min", "max"}


def _bucket(ts_col: str, bucket: str):
    return F.date_trunc(bucket, F.col(ts_col)).cast("timestamp")


def _agg_exprs(aggs: dict[str, tuple[str | None, str]]):
    out = []
    for name, (col, fn) in aggs.items():
        if fn not in _SUPPORTED:
            raise ValueError(f"{fn!r} is not partial-mergeable; supported: {sorted(_SUPPORTED)}")
        out.append(
            F.count(F.lit(1)).alias(name) if fn == "count" else getattr(F, fn)(col).alias(name)
        )
    return out


def rollup_refresh(
    spark: SparkSession,
    raw: DataFrame,
    path: str,
    ts_col: str,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    bucket: str = "day",
) -> int:
    """Bring the rollup at ``path`` up to date; returns #buckets written.

    Closed buckets = every bucket strictly before the raw max's bucket
    (the max bucket may still receive rows). Incremental: buckets at or
    after the stored high-water mark are (re)computed from raw and
    written with dynamic partition overwrite; older partitions are
    untouched. Re-running refresh with no new data rewrites at most one
    partition (idempotent).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = raw.withColumn("__bucket", _bucket(ts_col, bucket))
    closed_max = bucketed.agg(F.max("__bucket")).first()[0]
    if closed_max is None:
        return 0
    try:
        existing = spark.read.parquet(path)
        high_water = existing.agg(F.max("__bucket")).first()[0]
    except Exception:
        high_water = None
    todo = bucketed.filter(F.col("__bucket") < F.lit(closed_max))
    if high_water is not None:
        # recompute the (previously open) high-water bucket too: raw rows
        # may have kept arriving in it before it closed
        todo = todo.filter(F.col("__bucket") >= F.lit(high_water))
    out = todo.groupBy("__bucket", *keys).agg(*_agg_exprs(aggs))
    n = out.select("__bucket").distinct().count()
    if n:
        out.write.mode("overwrite").partitionBy("__bucket").parquet(path)
    return n


def rollup_query(
    spark: SparkSession,
    raw: DataFrame,
    path: str,
    ts_col: str,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    bucket: str = "day",
) -> DataFrame:
    """Exact per-bucket aggregates: rollup for closed buckets + raw tail.

    The raw side scans only rows at/after the rollup's high-water mark —
    with a date-partitioned raw table that filter is partition pruning,
    so steady-state query cost is O(one bucket of raw) + O(rollup rows).
    """
    bucketed = raw.withColumn("__bucket", _bucket(ts_col, bucket))
    try:
        rolled = spark.read.parquet(path)
        high_water = rolled.agg(F.max("__bucket")).first()[0]
    except Exception:
        rolled, high_water = None, None
    if rolled is None or high_water is None:
        tail = bucketed
        parts = []
    else:
        # rollup covers buckets < its high-water mark's successor; the
        # stored high-water bucket itself was closed at refresh time, so
        # the tail is everything strictly after it
        parts = [rolled.filter(F.col("__bucket") <= F.lit(high_water))]
        tail = bucketed.filter(F.col("__bucket") > F.lit(high_water))
    tail_agg = tail.groupBy("__bucket", *keys).agg(*_agg_exprs(aggs))
    out = tail_agg
    for p in parts:
        out = out.unionByName(p)
    return out.withColumnRenamed("__bucket", "bucket")
