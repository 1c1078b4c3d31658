"""Loaders for the driver-provided parquet testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. One parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/.

At 100 TB the fact tables (lineitem/orders/events/documents) would be
date-partitioned parquet/Delta directories; `spark.read.parquet` on a
directory plus Catalyst partition pruning covers that without code changes
here — loaders take a directory and never collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions we always hint for broadcast in joins (≪ fact tables at
# any scale factor; at 100 TB these stay ~KB-MB sized).
BROADCAST_DIMS = ("region", "nation", "customer", "supplier", "part")


# (session_id, sf_dir, table) -> DataFrame. A DataFrame is a reusable
# logical plan; memoizing skips the parquet footer read + analysis Spark
# pays on every spark.read.parquet — which otherwise dominates per-query
# latency at small SF (~130 ms/table measured at sf0.1).
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # pin the session to UTC: callers (the external driver included) may
    # hand us a session in any zone, and event-time bucketing
    # (date_trunc/to_date over the epoch-based ts) must agree with the
    # timezone-naive DuckDB oracle regardless
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # cached DataFrames hold a ref to their session, so id(spark) can't be
    # recycled while its cache entries live
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); a session without the
        # legacy flag hard-fails the scan (PARQUET_TYPE_ILLEGAL) — set it
        # here so an externally-provided session (the driver's) works too
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives in whatever physical form the driver generated this
        # round — normalize every variant to TIMESTAMP (LTZ) under the
        # UTC session pinned above, so downstream event-time machinery
        # (watermarks, unix_micros, window()) sees one type:
        # - TIMESTAMP(NANOS) parquet -> long nanos via nanosAsLong ->
        #   timestamp_micros (integer division: ns epochs ~1.7e18 exceed
        #   double's 2^53 exact range, so `/ 1000` would round +-1 us)
        # - naive micros parquet (isAdjustedToUTC=false) -> TIMESTAMP_NTZ
        #   under Spark's default NTZ inference -> cast to TIMESTAMP;
        #   under a UTC session the wall-clock values are unchanged, so
        #   the timezone-naive DuckDB oracle still agrees
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so operators can be expressed in spark.sql too."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# id(df) -> spread result; load_table memoizes the scan DataFrame per
# (session, sf_dir, table), so keying on the object identity makes the
# (driver-side) partition-count probe a once-per-table cost, not
# once-per-query. Values hold a ref to the keyed df so ids can't recycle.
_SPREAD_CACHE: dict[int, tuple[DataFrame, DataFrame]] = {}


def spread_for_cpu_bound(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a scan ONLY when it is narrower than the
    core count — the entry point for every CPU-bound projection battery
    (regex scoring, tokenizing, hashing) over raw document text.

    Scale rule, stated once instead of in seven docstrings: at the
    100-TB design point a documents scan yields thousands of input
    splits, the probe sees >= defaultParallelism partitions, and this is
    a NO-OP — the declared plan ships no raw-text exchange. The local
    test fixture is one parquet row group, so the scan is 1 partition
    and a CPU-bound battery would otherwise run on one core; there the
    spread costs one exchange of the tiny fixture and buys 32x
    parallelism. The probe (`df.rdd.getNumPartitions()`) is driver-side
    split arithmetic — no job — and is memoized per scan object.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    cached = _SPREAD_CACHE.get(id(df))
    if cached is not None:
        return cached[1]
    out = df if df.rdd.getNumPartitions() >= target else df.repartition(target)
    _SPREAD_CACHE[id(df)] = (df, out)
    return out


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/dir from its footers — pure
    driver-side metadata (pyarrow), no Spark job. The cheap cardinality
    source for operators that size work by row count (e.g.
    blocked_cosine_pairs' block grid): at 100 TB a count() job is a full
    scan, while footers are a few KB per file."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows
