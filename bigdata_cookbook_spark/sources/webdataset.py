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
    stay whole in ``ext``). The sink enforces dot-free keys (since
    round 7), so its own tars split identically under either rule;
    foreign WebDataset tars with compound extensions split per the
    published convention. Members with no dot at all keep the whole
    name as ``key`` with an empty ``ext``.

    COMPATIBILITY NOTE (round-7 rule change): tars written by the
    PRE-round-7 sink, which did not reject dotted keys, split
    differently under the first-dot rule — a legacy member
    ``a.b.txt`` that was written as key ``a.b`` + ext ``txt`` now
    reads as key ``a`` + ext ``b.txt``, silently. There is no general
    way to distinguish a dotted key from a compound extension, so no
    runtime guard is possible; if such legacy tars exist, re-pack them
    through the current sink (which fails loud on dotted keys) before
    reading.

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
    samples). A dot-free member (empty ``ext``) lands in column
    ``_noext``; two members with the SAME ext in one (shard, key)
    sample fail loud with a contract message (a wide pivot has nowhere
    to put the second copy) instead of map_from_entries' cryptic
    duplicate-key error.

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
        F.array_sort(F.collect_list(F.struct("ext", "content"))).alias("__e")
    )
    # contract guard BEFORE map construction: duplicate exts within one
    # sample would make map_from_entries throw a cryptic DUPLICATED_MAP_KEY
    # — fail with the actual (shard, key) and a re-pack instruction
    # instead. assert_true is NULL when the condition holds, so the
    # when() wrapper evaluates it on every row without changing the map.
    ext_arr = F.transform(F.col("__e"), lambda s: s["ext"])
    no_dup = F.size(F.array_distinct(ext_arr)) == F.size(ext_arr)
    guard = F.assert_true(
        no_dup,
        F.concat(
            F.lit("webdataset_samples: duplicate extension within sample ("),
            F.col("shard"),
            F.lit(", "),
            F.col("key"),
            F.lit(
                ") — a wide sample row carries at most one member per ext; "
                "re-pack the tar or consume the long member rows directly."
            ),
        ),
    )
    grouped = grouped.select(
        "shard",
        "key",
        F.when(guard.isNull(), F.map_from_entries(F.col("__e"))).alias("__m"),
    )
    cols = []
    for ext in exts:
        c = F.element_at(F.col("__m"), F.lit(ext))
        if ext in text_exts:
            c = c.cast("string")
        # a dot would collide with DataFrame column-path syntax; a
        # dot-free member has ext '' which is not a legal column name
        cols.append(c.alias(ext.replace(".", "_") or "_noext"))
    return grouped.select("shard", "key", *cols)
