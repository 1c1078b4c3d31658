"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same configs are what we would set on a
real cluster (AQE, skew handling, Arrow for the pandas-UDF boundary). At
100 TB the only knobs that change are shuffle partitions (sized to ~128 MB
per task post-compression) and the broadcast threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bigdata_cookbook_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Return a SparkSession with engine defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
      and dynamic join-strategy switching replace hand-tuned partition counts.
    - Arrow on: every pandas_udf / mapInPandas boundary is Arrow-batched.
    - shuffle partitions default to cpu count locally; on a cluster this is
      sized to data volume (AQE coalesces down, so err high).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata's events.ts is parquet TIMESTAMP(NANOS); read as
        # long and convert in the loader (Spark has no nanos timestamp type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
