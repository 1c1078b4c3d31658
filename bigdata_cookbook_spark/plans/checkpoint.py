"""Idempotent stage checkpoints (SURVEY.md §2.1 S3).

Reference: Report_Generator_AI_Threats/src/report_generator.py:142-187 —
every expensive stage optionally round-trips a pickle so a crashed run
resumes from the last completed stage.

Spark-native shape: parquet stage outputs. ``stage_checkpoint`` is a
memoizing wrapper — if the path already holds a committed parquet dataset
it is read back (the build function never runs); otherwise the builder's
DataFrame is written then re-read, so downstream stages consume the
materialized files rather than recomputing the lineage. At scale this also
truncates the logical plan (same reason Spark's ``df.checkpoint()``
exists) without requiring a checkpoint dir on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def stage_checkpoint(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    overwrite: bool = False,
) -> DataFrame:
    """Return the stage output at ``path``, computing it at most once.

    ``build`` is only invoked when no committed parquet exists (or
    ``overwrite=True``). Uses the _SUCCESS marker so a partially-written
    stage from a crashed run is rebuilt, not trusted.
    """
    if overwrite or not _committed(path):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
