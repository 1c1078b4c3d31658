"""S5 — external tabular (spreadsheet-shaped) source.

Reference: Narrative_Miners/src/tool.py:10-26 — ``read_excel(header=1)``,
drop ``Unnamed`` columns, parse a date column, tag each frame with its
source name.

This module reads the CSV export of such sheets; the real .xlsx format
is handled by the sibling ``sources/xlsx.py`` (stdlib OOXML reader/
writer — see ``read_excel_sheet`` there for the reference call shape).
Semantics preserved in both: skip leading junk rows above the header,
drop unnamed/blank columns, cast the date column, tag the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_sheet(
    spark: SparkSession,
    path: str,
    source_name: str,
    date_col: str | None = None,
    date_format: str | None = None,
    header_offset: int = 0,
) -> DataFrame:
    """Load one sheet-shaped CSV: drop ``header_offset`` junk rows before
    the header row, drop unnamed columns, parse ``date_col``, add a
    ``source`` tag column."""
    if header_offset:
        # monotonically_increasing_id preserves file order for a single
        # CSV file read; used only to cut the junk prologue
        raw = spark.read.option("header", "false").csv(path)
        raw = raw.withColumn("__rn", F.monotonically_increasing_id())
        header_vals = [
            str(v) for v in raw.filter(F.col("__rn") == header_offset).drop("__rn").head()
        ]
        body = raw.filter(F.col("__rn") > header_offset).drop("__rn")
        df = body.toDF(*header_vals)
    else:
        df = spark.read.option("header", "true").csv(path)

    keep = [
        c
        for c in df.columns
        if c and not c.lower().startswith("unnamed") and not c.startswith("_c")
    ]
    df = df.select(*keep)
    if date_col is not None and date_col in df.columns:
        df = df.withColumn(
            date_col,
            F.to_date(F.col(date_col), date_format) if date_format else F.to_date(date_col),
        )
    return df.withColumn("source", F.lit(source_name))
