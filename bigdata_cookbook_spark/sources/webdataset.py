"""WebDataset-style tar shard SOURCE — the read side of
sinks.write_webdataset_shards, so shards round-trip through the engine.

Shape: ``spark.read.format("binaryFile")`` lists and reads the tars (one
row per tar, Spark's standard distributed binary ingest — splitting
happens at FILE granularity, which is exactly a WebDataset's unit of
parallelism), then an Arrow-batched mapInPandas untars each shard into
one row per member with its sample key and extension. Grouping members
back into samples is a plain pivot/groupBy on (shard, key) — left to the
caller because the wanted shape (wide columns vs long rows) is
schema-specific.

At 100 TB the tars live on shared/object storage; binaryFile reads each
tar whole (maxPartitionBytes does not split binary files), so shard size
(pack_shards' shard_bytes) IS the read-parallelism knob — the same knob
WebDataset tuning already turns.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession


def read_webdataset(
    spark: SparkSession,
    path: str,
    pattern: str = "shard-*.tar",
    max_shard_bytes: int | None = 4 << 30,
) -> DataFrame:
    """One row per tar member: (shard, key, ext, content binary).

    ``key``/``ext`` split the member name at the FIRST dot — the
    WebDataset convention (the sample key is everything before the
    first dot, so compound extensions like ``seg.png`` or ``json.gz``
    stay whole in ``ext``). The sink enforces dot-free keys, so its own
    tars split identically under either rule; foreign WebDataset tars
    with compound extensions now split per the published convention.
    Members with no dot at all keep the whole name as ``key`` with an
    empty ``ext``.

    MEMORY BOUND (enforced): binaryFile reads each tar WHOLE into one
    row, so a shard must fit in executor memory — shard size
    (pack_shards' ``shard_bytes``) is both the read-parallelism and the
    peak-memory knob. A tar larger than ``max_shard_bytes`` (default
    4 GiB) fails loud with the re-pack instruction instead of OOMing an
    executor mid-job; pass ``None`` to disable when executors are
    provisioned for known-larger shards."""
    import pandas as pd

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select("path", "content")
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for tar_path, blob in zip(pdf["path"], pdf["content"]):
                if max_shard_bytes is not None and len(blob) > max_shard_bytes:
                    raise ValueError(
                        f"read_webdataset: {tar_path} is {len(blob)} bytes, "
                        f"over max_shard_bytes={max_shard_bytes}. Tars are "
                        "read whole into executor memory — re-pack with a "
                        "smaller shard_bytes target or raise the bound if "
                        "executor memory allows."
                    )
                with tarfile.open(fileobj=io.BytesIO(blob)) as t:
                    for m in t.getmembers():
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.partition(".")
                        rows.append(
                            (
                                os.path.basename(tar_path),
                                key,
                                ext,
                                t.extractfile(m).read(),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "content"]
            )

    return src.mapInPandas(
        run, "shard string, key string, ext string, content binary"
    )


def webdataset_samples(
    members: DataFrame,
    exts: list[str] | None = None,
    text_exts: tuple[str, ...] = ("txt", "json", "jsonl", "csv"),
) -> DataFrame:
    """Regroup read_webdataset's long member rows into one WIDE row per
    sample: (shard, key, <ext> ...) — the pivot every consumer would
    otherwise hand-roll. One member column per extension; extensions in
    ``text_exts`` decode utf-8 to string, the rest stay binary; a
    sample missing a member gets NULL (WebDataset tolerates ragged
    samples).

    ``exts=None`` infers the extension set from the data with one tiny
    distinct-collect — bounded by MEMBER-TYPE cardinality (a handful:
    txt/json/jpg/...), never by rows; pass the list explicitly in
    pipelines to keep the plan collect-free.

    Shape: one groupBy on (shard, key) — map-side combined, keyed by
    the sample id so no skew (samples are unique) — building an
    ext->content map, then a codegen projection of element_at lookups.
    """
    from pyspark.sql import functions as F

    if exts is None:
        exts = sorted(
            r["ext"] for r in members.select("ext").distinct().collect()
        )
    grouped = members.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ext", "content")))
        ).alias("__m")
    )
    cols = []
    for ext in exts:
        c = F.element_at(F.col("__m"), F.lit(ext))
        if ext in text_exts:
            c = c.cast("string")
        # a dot would collide with DataFrame column-path syntax
        cols.append(c.alias(ext.replace(".", "_")))
    return grouped.select("shard", "key", *cols)
