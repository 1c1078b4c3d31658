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
) -> DataFrame:
    """One row per tar member: (shard_path, key, ext, content binary).

    ``key``/``ext`` split the member name at the LAST dot (WebDataset's
    convention: everything before the first dot is the sample key for
    multi-dot extensions — this reader keeps the simpler last-dot rule
    matching what write_webdataset_shards emits)."""
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
                with tarfile.open(fileobj=io.BytesIO(blob)) as t:
                    for m in t.getmembers():
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.rpartition(".")
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
