"""JSONL (newline-delimited JSON) document source with corrupt-record
quarantine — the raw-ingest format a 100 TB pre-training pipeline actually
receives (crawl dumps, API exports) before anything is parquet.

Design: read as TEXT and parse with ``from_json`` against an explicit
schema, instead of ``spark.read.json``. Three reasons:

- Deterministic corrupt routing. The DataFrameReader's PERMISSIVE
  ``columnNameOfCorruptRecord`` column has a documented caveat (filtering
  on only the corrupt column requires a cache/materialization barrier);
  here the corrupt-record field rides inside the ``from_json`` struct, so
  "corrupt" is an ordinary map-side predicate with no caching footgun.
- No schema-inference pass. ``spark.read.json`` without a schema scans
  the data once just to infer types — at corpus scale that doubles the
  read. The schema here is an explicit contract.
- Required-field enforcement is the same predicate mechanism: a row that
  parses but misses a required field is quarantined with a reason, not
  silently nulled through the pipeline.

Everything is one scan, map-side, whole-stage-codegen (JacksonParser on
the JVM); the good/quarantine split is two filters over one cached-free
lineage — Spark scans the text twice only if both sides are consumed,
which at ingest is the norm (good -> parquet, quarantine -> audit sink)
and still beats an inference pass plus a parse pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jsonl_parsed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...] = (),
) -> DataFrame:
    """One-scan parse of a JSONL file/directory: returns every input line
    tagged with a ``_reason`` column — NULL for good rows, else
    'unparseable' | 'missing:<field>'. Blank lines are dropped (not
    quarantined: they carry no data and most dumps are newline-padded).

    Columns: the schema's fields + ``_raw`` (the original line) +
    ``_reason``. Use :func:`read_jsonl` for the split view.
    """
    lines = (
        spark.read.text(path)
        .withColumnRenamed("value", "_raw")
        .filter(F.length(F.trim("_raw")) > 0)
    )
    # PERMISSIVE from_json yields an ALL-NULL struct (not NULL) for
    # malformed input, indistinguishable from a parsed '{}' — so the
    # parse schema carries a corrupt-record field: malformed lines land
    # their raw text there, exactly like the DataFrameReader's
    # columnNameOfCorruptRecord, but as an ordinary struct field with no
    # caching caveat.
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = lines.withColumn(
        "_j",
        F.from_json(
            "_raw", parse_schema, {"columnNameOfCorruptRecord": "_corrupt"}
        ),
    )
    reason = F.when(
        F.col("_j").isNull() | F.col("_j").getField("_corrupt").isNotNull(),
        F.lit("unparseable"),
    )
    for f in required:
        reason = reason.when(
            F.col("_j").getField(f).isNull(), F.lit(f"missing:{f}")
        )
    out = parsed.withColumn("_reason", reason)
    return out.select(
        *[F.col("_j").getField(f.name).alias(f.name) for f in schema.fields],
        "_raw",
        "_reason",
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) split of a JSONL source.

    ``good`` carries exactly the schema's columns; ``quarantine`` carries
    (_raw, _reason) for the audit sink. A line lands in exactly one side.
    """
    tagged = jsonl_parsed(spark, path, schema, required)
    good = tagged.filter(F.col("_reason").isNull()).drop("_raw", "_reason")
    bad = tagged.filter(F.col("_reason").isNotNull()).select("_raw", "_reason")
    return good, bad


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)
