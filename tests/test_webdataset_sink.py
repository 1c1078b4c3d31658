"""WebDataset-style tar shard sink (sinks.write_webdataset_shards):
round-trip, shard ownership, byte-stable reruns, composition with
pack_shards."""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.sampling import pack_shards
from bigdata_cookbook_spark.sinks import write_webdataset_shards


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of doc "), F.col("id")).alias("text"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark).withColumn("shard_id", (F.col("doc_id") / 20).cast("long"))
    out = str(tmp_path / "wds")
    manifest = write_webdataset_shards(docs, out).collect()
    assert {r.shard_id for r in manifest} == {0, 1, 2}
    assert sum(r.n_samples for r in manifest) == 60
    got = {}
    for r in manifest:
        assert os.path.basename(r.path) == f"shard-{r.shard_id:06d}.tar"
        with tarfile.open(r.path) as t:
            for m in t.getmembers():
                got[m.name] = t.extractfile(m).read().decode()
                assert m.mtime == 0 and m.uid == 0
    assert got["7.txt"] == "text of doc 7"
    assert len(got) == 60


def test_byte_stable_rerun(spark, tmp_path):
    docs = _docs(spark, 30).withColumn(
        "shard_id", (F.col("doc_id") / 10).cast("long")
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(docs, a).count()
    write_webdataset_shards(docs, b).count()
    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as f1, open(
            os.path.join(b, name), "rb"
        ) as f2:
            assert f1.read() == f2.read(), name


def test_composes_with_pack_shards(spark, tmp_path):
    docs = _docs(spark, 100).withColumn("nb", F.octet_length("text"))
    packed = pack_shards(docs, ["doc_id"], "nb", shard_bytes=200)
    out = str(tmp_path / "packed")
    manifest = write_webdataset_shards(packed, out).collect()
    assert sum(r.n_samples for r in manifest) == 100
    # every tar except possibly the last lands near the byte target
    sizes = [r.n_bytes for r in sorted(manifest, key=lambda r: r.shard_id)]
    assert all(s > 0 for s in sizes)


def test_binary_column_and_nulls(spark, tmp_path):
    rows = [(1, bytearray(b"\x00\x01PAYLOAD"), "meta1"), (2, None, "meta2")]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, note string"
    ).withColumn("shard_id", F.lit(0))
    out = str(tmp_path / "bin")
    m = write_webdataset_shards(
        df, out, content_cols={"payload": "bin", "note": "txt"}
    ).collect()
    with tarfile.open(m[0].path) as t:
        names = {x.name for x in t.getmembers()}
        assert names == {"1.bin", "1.txt", "2.txt"}  # null payload skipped
        assert t.extractfile("1.bin").read() == b"\x00\x01PAYLOAD"


def test_read_webdataset_roundtrip(spark, tmp_path):
    """Shards written by the sink read back into exactly the rows that
    went in — the full round-trip through the engine."""
    from bigdata_cookbook_spark.sources.webdataset import read_webdataset

    docs = _docs(spark, 40).withColumn(
        "shard_id", (F.col("doc_id") / 16).cast("long")
    )
    out = str(tmp_path / "rt")
    write_webdataset_shards(docs, out).count()
    back = read_webdataset(spark, out)
    rows = back.collect()
    assert len(rows) == 40
    assert all(r.ext == "txt" for r in rows)
    got = {int(r.key): bytes(r.content).decode() for r in rows}
    assert got == {i: f"text of doc {i}" for i in range(40)}
    # parallelism unit = the tar file
    assert back.select("shard").distinct().count() == 3


def test_sink_rejects_dotted_keys_and_bad_types(spark, tmp_path):
    """Fail-loud contracts: dotted sample keys would split wrong on
    every WebDataset reader; non-string/binary content would fall
    through to bytes(v) and write zero-filled garbage."""
    import pytest
    from pyspark.errors import PythonException

    dotted = spark.createDataFrame(
        [("a.b", "t")], "doc_id string, text string"
    ).withColumn("shard_id", F.lit(0))
    with pytest.raises(PythonException, match="dot-free"):
        write_webdataset_shards(dotted, str(tmp_path / "d")).count()

    ints = spark.createDataFrame([(1, 5)], "doc_id long, n int").withColumn(
        "shard_id", F.lit(0)
    )
    with pytest.raises(PythonException, match="string or binary"):
        write_webdataset_shards(
            ints, str(tmp_path / "i"), content_cols={"n": "txt"}
        ).count()


def test_sink_max_shard_bytes_enforced(spark, tmp_path):
    import pytest
    from pyspark.errors import PythonException

    docs = _docs(spark, 50).withColumn("shard_id", F.lit(0))
    with pytest.raises(PythonException, match="max_shard_bytes"):
        write_webdataset_shards(
            docs, str(tmp_path / "cap"), max_shard_bytes=512
        ).count()
    # no finished shard was published; temps carry attempt-unique names
    leftover = os.listdir(tmp_path / "cap")
    assert all(".inprogress." in n for n in leftover)


def test_read_webdataset_first_dot_split_and_bound(spark, tmp_path):
    """Foreign tars with compound extensions split at the FIRST dot
    (WebDataset convention); the whole-tar memory bound fails loud."""
    import io
    import pytest
    from pyspark.errors import PythonException

    from bigdata_cookbook_spark.sources.webdataset import read_webdataset

    d = tmp_path / "foreign"
    d.mkdir()
    with tarfile.open(d / "shard-000000.tar", "w") as t:
        for name, payload in [
            ("k1.json.gz", b"gzbytes"),
            ("k1.txt", b"hello"),
            ("noext", b"raw"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            t.addfile(info, io.BytesIO(payload))
    rows = {
        (r.key, r.ext): bytes(r.content)
        for r in read_webdataset(spark, str(d)).collect()
    }
    assert rows == {
        ("k1", "json.gz"): b"gzbytes",
        ("k1", "txt"): b"hello",
        ("noext", ""): b"raw",
    }
    with pytest.raises(PythonException, match="max_shard_bytes"):
        read_webdataset(spark, str(d), max_shard_bytes=4).count()


def test_webdataset_samples_pivot(spark, tmp_path):
    """The (shard, key) -> wide-sample helper: one row per sample, one
    column per extension, text extensions decoded, missing members
    NULL, compound extensions aliased dot-free."""
    from bigdata_cookbook_spark.sources.webdataset import (
        read_webdataset,
        webdataset_samples,
    )

    rows = [
        (1, "text one", bytearray(b"\x01\x02"), 0),
        (2, "text two", None, 0),
        (3, "text three", bytearray(b"\x03"), 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, payload binary, shard_id long"
    )
    out = str(tmp_path / "wide")
    write_webdataset_shards(
        df, out, content_cols={"text": "txt", "payload": "bin"}
    ).count()
    wide = webdataset_samples(read_webdataset(spark, out))
    assert set(wide.columns) == {"shard", "key", "txt", "bin"}
    got = {int(r.key): (r.txt, bytes(r.bin) if r.bin is not None else None)
           for r in wide.collect()}
    assert got == {
        1: ("text one", b"\x01\x02"),
        2: ("text two", None),
        3: ("text three", b"\x03"),
    }
    # explicit exts keeps the plan collect-free and selects a subset
    only_txt = webdataset_samples(read_webdataset(spark, out), exts=["txt"])
    assert set(only_txt.columns) == {"shard", "key", "txt"}


def test_webdataset_samples_noext_and_duplicate_ext(spark, tmp_path):
    """Round-8 ADVICE hardening: a dot-free member pivots into the
    '_noext' column (an empty-string alias is not a legal column name),
    and two members sharing an ext within one (shard, key) fail loud
    with the contract message naming the sample, not map_from_entries'
    cryptic duplicate-key error."""
    import io

    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from bigdata_cookbook_spark.sources.webdataset import (
        read_webdataset,
        webdataset_samples,
    )

    d = tmp_path / "foreign2"
    d.mkdir()
    with tarfile.open(d / "shard-000000.tar", "w") as t:
        for name, payload in [
            ("k1.txt", b"hello"),
            ("k1", b"rawbytes"),  # no dot -> ext ''
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            t.addfile(info, io.BytesIO(payload))
    wide = webdataset_samples(read_webdataset(spark, str(d)))
    assert set(wide.columns) == {"shard", "key", "_noext", "txt"}
    row = wide.collect()[0]
    assert row.key == "k1" and row.txt == "hello"
    assert bytes(row._noext) == b"rawbytes"

    d2 = tmp_path / "dup"
    d2.mkdir()
    with tarfile.open(d2 / "shard-000000.tar", "w") as t:
        for name, payload in [("k1.txt", b"one"), ("k1.txt", b"two")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            t.addfile(info, io.BytesIO(payload))
    with pytest.raises(SparkRuntimeException, match="duplicate extension"):
        webdataset_samples(read_webdataset(spark, str(d2)), exts=["txt"]).collect()
