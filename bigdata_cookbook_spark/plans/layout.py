"""Physical table layout for the 100 TB tier.

Two layout levers the small-SF correctness tests can't show but a
1000-executor deployment lives or dies by:

- **Bucketing** — pre-shuffling a table into N hash buckets on its join /
  aggregation key at WRITE time. Every later equi-join or groupBy on that
  key reads co-located buckets and skips the exchange entirely; for the
  screening fact table (SURVEY §1.1-3, keyed by entity_id / document_id)
  this converts the per-query shuffle of the biggest relation into a
  one-time write cost. `write_bucketed` + `assert_no_exchange` (tests) pin
  the contract: a join of two tables bucketed on the same key with the
  same bucket count plans with zero Exchange nodes.

- **Date partitioning** — `write_date_partitioned` lays the corpus out as
  `.../date=YYYY-MM-DD/part-*.parquet`. The reference's hand-rolled
  date-range query slicing (query_builder.py:410-517, SURVEY §4 row 1)
  becomes partition pruning: a BETWEEN filter on the partition column
  touches only the matching directories, which `.explain` shows as
  PartitionFilters and tests assert via `scan_partition_count`.

Bucket-count sizing rule (documented, not enforced): target
``table_bytes / n_buckets ~ 128-512 MB`` so one bucket is one healthy
task; bucket counts should be equal (or integer multiples, with AQE)
across tables that join together.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a parquet table hash-bucketed on bucket_cols.

    sort_cols additionally sorts within each bucket file (sort-merge join
    then needs no sort either; also improves scan-side min/max skipping).
    Registered in the session catalog (saveAsTable — bucket metadata lives
    in the catalog, plain .parquet(path) writes cannot carry it).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "date",
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet layout (one dir per partition value)."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def scan_partition_count(df: DataFrame) -> int:
    """Number of partition-dirs the (pruned) scan of df will touch.

    Read from the FileSourceScan node's `numPartitions` metric in the
    executed plan (populated at planning time from the pruned file index);
    used by tests to prove a partition-column filter prunes the directory
    listing rather than filtering rows post-scan. Returns -1 if no file
    scan node is found.
    """
    plan = df._jdf.queryExecution().executedPlan()
    stack = [plan]
    while stack:
        node = stack.pop()
        if "Scan" in node.nodeName():
            try:
                # force the lazy file-index listing so the driver-side
                # numPartitions metric is populated without running a job
                node.selectedPartitions()
            except Exception:
                pass
            metrics = node.metrics().iterator()
            while metrics.hasNext():
                kv = metrics.next()
                if kv._1() == "numPartitions":
                    return int(kv._2().value())
            return -1
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
        try:  # WholeStageCodegen wraps its subtree via child()
            stack.append(node.child())
        except Exception:
            pass
    return -1


def has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange."""
    from bigdata_cookbook_spark.plans.explain import explain_str

    plan = explain_str(df, mode="formatted")
    return any(
        line.strip().split(" ", 2)[-1].startswith("Exchange")
        or "ShuffleExchange" in line
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def zorder_key(cols: list, bits: int = 16) -> "F.Column":  # noqa: F821
    """Morton (Z-order) interleaving key over 2+ numeric columns.

    Each column is rank-normalized by the CALLER to [0, 2^bits) (use
    ntile or min-max scaling first — interleaving raw values wastes bits
    on skewed domains); this helper interleaves the bit patterns so rows
    close in EVERY dimension get close keys. Sorting a table by the
    z-key before writing gives multi-column data-skipping: parquet
    row-group min/max stats become tight for all interleaved columns at
    once, where a plain ORDER BY col1 only helps col1.

    Pure integer expression (shift/or over longs) — codegen'd, no UDF.

    Constraint: ``bits * len(cols) <= 63`` (the interleaved key must fit
    a signed long; JVM shift amounts wrap mod 64, which would silently
    scramble the key and stop data-skipping). Violations raise.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits * n} exceeds 63 — the "
            f"interleaved key must fit a signed long (shiftleft wraps mod "
            f"64 on the JVM, silently scrambling the clustering); lower "
            f"bits to <= {63 // n} for {n} columns"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 10,
    files: int = 8,
) -> None:
    """Write parquet clustered by a Z-order key over ``zcols``.

    Columns are min-max scaled to [0, 2^bits) per the zorder_key
    contract (one tiny agg to fetch bounds — driver-side scalars only),
    then the frame is range-partitioned + sorted by the z-key so each
    output file covers a compact hyper-rectangle: selective filters on
    ANY zcol skip most row groups via parquet min/max stats.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in zcols],
        *[F.max(c).alias(f"mx_{c}") for c in zcols],
    ).first()
    scaled = df
    names = []
    top = (1 << bits) - 1
    for c in zcols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1
        name = f"__z_{c}"
        names.append(name)
        scaled = scaled.withColumn(
            name,
            F.least(
                F.lit(top),
                ((F.col(c) - F.lit(mn)) * F.lit(top) / F.lit(span)).cast("long"),
            ),
        )
    keyed = scaled.withColumn("__zkey", zorder_key(names, bits=bits))
    (
        keyed.repartitionByRange(files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *names)
        .write.mode("overwrite")
        .parquet(path)
    )


def _write_manifest(path: str, payload: dict) -> None:
    """Atomically publish a commit manifest: write to a temp name, fsync,
    rename into place. The rename is the commit point — a manifest either
    exists complete or not at all."""
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _promote(staged: str, dst: str, retired_root: str) -> None:
    """Swap one directory into place with recoverable renames: retire the
    current dst (atomic rename into the staging area's __retired__ pen),
    then promote the staged dir (atomic rename). A crash between the two
    leaves dst absent — but the manifest + staged dir make roll-forward
    (recover_pending) complete the promote; the OLD data is never deleted
    until the whole commit is done."""
    import shutil

    if os.path.isdir(dst):
        os.makedirs(retired_root, exist_ok=True)
        retired = os.path.join(retired_root, os.path.basename(dst.rstrip("/")))
        if os.path.isdir(retired):  # re-run after crash mid-promote
            shutil.rmtree(retired)
        os.rename(dst, retired)
    os.rename(staged, dst)


def recover_pending(base_path: str) -> dict[str, int]:
    """Roll FORWARD any interrupted compact_files/upsert_partitions commit
    on ``base_path``: manifests are written only after staging succeeded,
    so the staged data is complete by construction and finishing the
    renames is always safe. Idempotent — call it at open time or before
    re-running the operator. Returns {"recovered": n_manifests,
    "promoted": n_dirs}.

    Manifest/staging names are dot-prefixed, so Spark/Hadoop listings of
    ``base_path`` (or its parent) never see in-flight commit state; a
    reader during the crash window sees the OLD partition bytes, or
    briefly none for the one directory mid-promote — never a half-written
    mix."""
    import json
    import shutil

    recovered = promoted = 0
    parent = os.path.dirname(base_path.rstrip("/"))
    for where in {parent, base_path.rstrip("/")}:
        if not os.path.isdir(where):
            continue
        for fn in sorted(os.listdir(where)):
            if not (fn.startswith("._commit_manifest_") and fn.endswith(".json")):
                continue
            mpath = os.path.join(where, fn)
            with open(mpath) as f:
                m = json.load(f)
            if os.path.abspath(m["base"]) != os.path.abspath(base_path.rstrip("/")):
                continue
            tmp = m["tmp"]
            retired_root = os.path.join(tmp, "__retired__")
            for rel in m["promote"]:
                # rel == "" is the whole-dir swap (compact): staged
                # content lives at tmp/__data__ so the retired pen can
                # sit beside it inside tmp
                staged = os.path.join(tmp, rel or "__data__")
                dst = os.path.join(m["base"], rel) if rel else m["base"]
                if os.path.isdir(staged):
                    _promote(staged, dst, retired_root)
                    promoted += 1
            os.remove(mpath)
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
            recovered += 1
    return {"recovered": recovered, "promoted": promoted}


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    partition_col: str | None = None,
) -> dict[str, int]:
    """Small-files compaction — the operational fix for streaming /
    micro-batch ingestion leaving thousands of KB-scale parquet files
    per directory (each file costs a task + a footer read + NameNode/
    object-store metadata at 100 TB).

    Rewrites ``path`` into ceil(bytes/target_mb) files via coalesce — a
    narrow dependency, no shuffle; file count is decided from the ACTUAL
    on-disk byte size, not row counts. With ``partition_col`` each
    partition directory is compacted INDEPENDENTLY (its own byte-sized
    file count, its own swap), so sizing is truly per partition value
    and an interrupted run leaves at most one partition mid-rewrite.

    Commit protocol (write-audit-publish, round 4): stage the rewrite to
    a dot-prefixed temp dir, atomically publish a commit manifest
    (temp-write + fsync + rename), then promote via two renames (retire
    old -> promote staged). The OLD bytes are never deleted until the
    commit completes, and a crash at ANY point is recoverable: before
    the manifest, the base is untouched (stale temp dirs are inert);
    after it, ``recover_pending`` rolls the commit forward from the
    staged data — which the manifest's existence guarantees is complete.
    Readers on a plain filesystem see old bytes, or new bytes, or (for
    the one directory mid-promote) briefly none — never a half-written
    mix; table formats (Delta/Iceberg) close that last absence window
    with metadata commits, which plain parquet cannot express. Returns
    {"files_before": n, "files_after": m} (totals across partitions).
    """
    import math
    import shutil
    import uuid

    def dir_stats(p: str) -> tuple[int, int]:
        n = size = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    size += os.path.getsize(os.path.join(root, f))
        return n, size

    if partition_col is not None:
        # per-partition compaction: partition values live in the dir
        # names, so each dir is a self-contained parquet table
        before_total = after_total = 0
        for d in sorted(os.listdir(path)):
            sub = os.path.join(path, d)
            if not os.path.isdir(sub) or not d.startswith(f"{partition_col}="):
                continue
            r = compact_files(spark, sub, target_mb=target_mb)
            before_total += r["files_before"]
            after_total += r["files_after"]
        return {"files_before": before_total, "files_after": after_total}

    recover_pending(path)  # finish any interrupted prior commit first
    before, total_bytes = dir_stats(path)
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    # dot-prefixed temp dir: Spark/Hadoop file listing skips ._* names,
    # so a concurrent reader of an enclosing partitioned table never
    # sees the half-written rewrite (matters for the per-partition case,
    # where the temp dir is a sibling inside the table root)
    parent, base = os.path.split(path.rstrip("/"))
    cid = uuid.uuid4().hex[:8]
    tmp = os.path.join(parent, f"._compact_{base}_{cid}")
    staged = os.path.join(tmp, "__data__")
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(staged)
    manifest = os.path.join(parent, f"._commit_manifest_{cid}.json")
    _write_manifest(manifest, {"base": path.rstrip("/"), "tmp": tmp, "promote": [""]})
    _promote(staged, path.rstrip("/"), os.path.join(tmp, "__retired__"))
    os.remove(manifest)
    shutil.rmtree(tmp, ignore_errors=True)
    after, _ = dir_stats(path)
    return {"files_before": before, "files_after": after}


def upsert_partitions(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str,
) -> dict[str, int]:
    """MERGE (upsert) into a date/partition-laid-out parquet table
    without a table format: rows in ``updates`` replace base rows with
    the same key; new keys insert. Only partitions PRESENT IN THE
    UPDATES are rewritten (dynamic partition overwrite — the same
    idempotent mechanism plans/rollup.py uses); every other partition's
    files are untouched bytes.

    Plan: materialize ``updates`` once (it feeds the partition listing,
    the anti-join, and the row count — non-deterministic inputs would
    otherwise disagree between those evaluations), collect the affected
    partition values (bounded — an upsert batch touches few partitions
    by construction), scan ONLY those partitions of the base (partition
    pruning), anti-join out the updated keys, union the updates, stage
    the merged partitions to a dot-prefixed temp dir, then swap each
    partition directory into place. The shuffle is one anti-join keyed
    on ``keys`` over the affected slice, never the whole table.

    Staging + manifest commit (the compact_files protocol) rather than
    an in-place dynamic partition overwrite: the base is being READ by
    the same job that would overwrite it, and a mid-commit failure of an
    in-place write can leave touched partitions half-rewritten. Here a
    failure before the manifest leaves the base untouched (stale ._
    staging dirs are inert and invisible to Spark listings); after the
    manifest, the staged data is complete by construction and
    ``recover_pending`` — run automatically at the next call, or
    explicitly — rolls the commit forward. Old partition bytes are
    retired by rename (not deleted) until the commit finishes, so no
    crash point can strand a half-written or lost partition. No session
    conf is mutated. Untouched partitions stay byte-identical. Returns
    {"partitions_rewritten": n, "rows_upserted": m}.
    """
    import shutil
    import uuid

    from pyspark.sql import functions as F

    recover_pending(base_path)  # finish any interrupted prior commit
    updates = updates.persist()
    try:
        n_rows = updates.count()  # materializes the one evaluation
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        if not parts:
            return {"partitions_rewritten": 0, "rows_upserted": 0}
        base = spark.read.parquet(base_path).filter(
            F.col(partition_col).isin(parts)
        )
        survivors = base.join(updates.select(*keys), keys, "left_anti")
        merged = survivors.unionByName(updates.select(*survivors.columns))
        parent, name = os.path.split(base_path.rstrip("/"))
        cid = uuid.uuid4().hex[:8]
        tmp = os.path.join(parent, f"._upsert_{name}_{cid}")
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        staged_dirs = sorted(
            d for d in os.listdir(tmp) if d.startswith(f"{partition_col}=")
        )
        manifest = os.path.join(base_path, f"._commit_manifest_{cid}.json")
        _write_manifest(
            manifest,
            {"base": base_path.rstrip("/"), "tmp": tmp, "promote": staged_dirs},
        )
        retired_root = os.path.join(tmp, "__retired__")
        for d in staged_dirs:
            _promote(os.path.join(tmp, d), os.path.join(base_path, d), retired_root)
        os.remove(manifest)
        shutil.rmtree(tmp, ignore_errors=True)
        return {"partitions_rewritten": len(staged_dirs), "rows_upserted": n_rows}
    finally:
        updates.unpersist()
