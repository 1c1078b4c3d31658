"""State-table lifecycle for the streaming capstone (round-6 VERDICT
task 2).

streaming_corpus_clean's six state tables (seen_hashes, shingles,
buckets, paras, spans, embeddings) plus the drop log grow one
``ingest_batch=<id>`` parquet delta directory PER MICRO-BATCH, forever:
a nightly-ingest deployment accretes hundreds of directories of
KB-scale files within weeks, and every subsequent batch pays a task +
footer read per file to load its state. This module is the maintenance
path:

- ``maintain_state``      the nightly entry point: consolidates every
                          state table's old deltas into one directory
                          (bounded file count) and fail-louds when the
                          pinned SRP plane count has gone stale,
- ``consolidate_deltas``  the per-table compactor (crash-safe via the
                          same write-audit-publish manifest protocol as
                          plans/layout.compact_files),
- ``srp_planes_recommended`` / ``rebucket_srp_state``
                          staleness probe + the one-off migration that
                          recomputes SRP buckets at a new plane count.

Operational contract (README "Streaming state maintenance"):

- Run ONLY while the ingest stream is STOPPED. The commit protocol
  keeps the state recoverable through a crash at any point, but a
  CONCURRENT reader could observe a merged-away delta twice (its rows
  already in the consolidated directory, its original directory not
  yet retired) — duplicate shingle rows corrupt Jaccard counts.
  Single-maintainer, stream-quiesced is the honest contract for plain
  parquet; a table format (Delta/Iceberg) would close this window with
  metadata commits.
- ``keep_last >= 1`` always (the default): the NEWEST delta is never
  merged, because after a crash Spark replays the last uncommitted
  micro-batch and _read_state's exclude-current-batch replay guard
  needs that batch's own delta directories intact. Older batches are
  checkpoint-committed and can never replay, so merging them is safe.
- Consolidation preserves CONTENT exactly (same rows, same columns):
  the merged rows land under the OLDEST merged ``ingest_batch`` id, a
  value always smaller than any live batch id, so the exclude-current
  filter can never exclude consolidated history.

Reference scope note: the reference cookbooks have no continuous-ingest
tier at all (pandas + asyncio, re-run per notebook); this module is
part of the beyond-parity 100-TB deployment surface, same as
plans/layout.py.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_cookbook_spark.plans.layout import (
    _promote,
    _write_manifest,
    recover_pending,
)

#: state tables streaming_corpus_clean maintains under its state_dir
#: (drops is the audit log — same append-only delta layout)
STATE_TABLES = (
    "seen_hashes",
    "shingles",
    "buckets",
    "paras",
    "spans",
    "embeddings",
    "drops",
)


def _delta_ids(path: str) -> list[int]:
    ids = []
    for d in os.listdir(path):
        if not d.startswith("ingest_batch="):
            continue
        if not os.path.isdir(os.path.join(path, d)):
            continue
        try:
            ids.append(int(d.split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(ids)


def _tree_stats(paths: list[str]) -> tuple[int, int]:
    n = size = 0
    for p in paths:
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    size += os.path.getsize(os.path.join(root, f))
    return n, size


def consolidate_deltas(
    spark: SparkSession,
    path: str,
    keep_last: int = 1,
    target_mb: int = 256,
    transform=None,
) -> dict[str, int]:
    """Merge all but the newest ``keep_last`` ``ingest_batch=<id>``
    delta directories under ``path`` into ONE consolidated delta that
    takes the OLDEST merged id, with a byte-sized output file count
    (ceil(bytes / target_mb), coalesce — narrow, no shuffle).

    Crash-safe by the layout.py commit protocol: the consolidated data
    and empty tombstones for the merged-away directories are staged
    under a dot-prefixed temp dir (invisible to Spark/Hadoop listings),
    a commit manifest is atomically published (temp + fsync + rename),
    then each directory is swapped by rename. Old bytes are retired
    into the temp dir and deleted only after the whole commit; a crash
    before the manifest leaves the state untouched, after it
    recover_pending (called on entry here, and by layout's writers)
    rolls the commit forward from the staged data. Idempotent.

    ``transform`` (DataFrame -> DataFrame) rewrites the merged rows
    before staging — the hook rebucket_srp_state uses to recompute
    bucket ids in the same single commit (a half-migrated state is
    never observable). With a transform the merge proceeds even when
    only one delta exists; without one, nothing to merge is a no-op.

    Returns {"merged": n_dirs_merged, "files_before": ..,
    "files_after": ..} (file counts over the merged set only).
    """
    if not os.path.isdir(path):
        return {"merged": 0, "files_before": 0, "files_after": 0}
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    recover_pending(path)
    # sweep tombstones a crashed run's roll-forward left behind: a real
    # delta always holds at least a parquet footer file (Spark writes
    # one even for zero rows), so a ZERO-file delta dir can only be a
    # promoted empty tombstone — removing it is the deferred cleanup
    for i in _delta_ids(path):
        p = os.path.join(path, f"ingest_batch={i}")
        if _tree_stats([p])[0] == 0:
            shutil.rmtree(p, ignore_errors=True)
    # sweep staging dirs orphaned by a crash BEFORE their manifest was
    # published (recover_pending only knows manifest-referenced tmps):
    # without a manifest the staged copy was never part of any commit,
    # so removing it is safe — and not removing it leaks a full-size
    # consolidated copy of the state per failed run
    for entry in os.listdir(path):
        if entry.startswith("._state_compact_"):
            cid = entry[len("._state_compact_"):]
            manifest = os.path.join(path, f"._commit_manifest_{cid}.json")
            if not os.path.exists(manifest):
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
    ids = _delta_ids(path)
    # max(0, ...): keep_last above the delta count must keep EVERYTHING
    # (a negative python slice bound would wrap and merge all but one)
    merge = ids[: max(0, len(ids) - keep_last)] if keep_last else ids
    if len(merge) < (1 if transform is not None else 2):
        n, _ = _tree_stats([path])
        return {"merged": 0, "files_before": n, "files_after": n}

    target = merge[0]
    dirs = [os.path.join(path, f"ingest_batch={i}") for i in merge]
    files_before, total_bytes = _tree_stats(dirs)
    # all-empty merge set (tombstones from an earlier interrupted run):
    # nothing to read, nothing to do
    if files_before == 0:
        return {"merged": 0, "files_before": 0, "files_after": 0}
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    df: DataFrame = spark.read.parquet(*[d for d in dirs if _tree_stats([d])[0]])
    if transform is not None:
        df = transform(df)

    cid = uuid.uuid4().hex[:8]
    tmp = os.path.join(path, f"._state_compact_{cid}")
    rels = [f"ingest_batch={i}" for i in merge]
    df.coalesce(n_out).write.mode("overwrite").parquet(
        os.path.join(tmp, rels[0])
    )
    # tombstones: empty staged dirs promoted over the merged-away
    # deltas — their data is retired in the same commit that publishes
    # the consolidated copy, so no reader sequence sees rows twice
    # after the commit completes
    for rel in rels[1:]:
        os.makedirs(os.path.join(tmp, rel), exist_ok=True)
    manifest = os.path.join(path, f"._commit_manifest_{cid}.json")
    _write_manifest(
        manifest, {"base": path.rstrip("/"), "tmp": tmp, "promote": rels}
    )
    retired_root = os.path.join(tmp, "__retired__")
    for rel in rels:
        _promote(os.path.join(tmp, rel), os.path.join(path, rel), retired_root)
    os.remove(manifest)
    shutil.rmtree(tmp, ignore_errors=True)
    # cosmetic: drop the now-empty tombstone dirs (no files -> no rows;
    # safe to skip or crash out of — empty dirs are invisible to the
    # parquet reader and get re-merged by the next run)
    for rel in rels[1:]:
        p = os.path.join(path, rel)
        if os.path.isdir(p) and _tree_stats([p])[0] == 0:
            shutil.rmtree(p, ignore_errors=True)
    files_after, _ = _tree_stats([os.path.join(path, rels[0])])
    return {
        "merged": len(merge),
        "files_before": files_before,
        "files_after": files_after,
    }


def srp_planes_recommended(
    spark: SparkSession,
    state_dir: str,
    target_bucket_rows: int = 64,
    floor: int = 4,
) -> int | None:
    """Plane count default_srp_planes_for would pick for the CURRENT
    embeddings state cardinality (parquet metadata count — no data
    scan), or None when no semantic state exists."""
    from bigdata_cookbook_spark.operators.dedup import default_srp_planes_for

    emb_root = os.path.join(state_dir, "embeddings")
    if not os.path.isdir(emb_root):
        return None
    n = spark.read.parquet(emb_root).count()
    return default_srp_planes_for(n, target_bucket_rows, floor)


def rebucket_srp_state(
    spark: SparkSession,
    state_dir: str,
    n_planes: int | None = None,
    seed: int = 0x5EED,
    target_mb: int = 256,
) -> int:
    """One-off migration for a stale pinned ``semantic_n_planes``:
    recompute every state vector's SRP bucket at ``n_planes`` (default:
    derived from the state's own cardinality via
    default_srp_planes_for) and consolidate the whole embeddings state
    into one delta in the SAME commit — bucket ids are all-old or
    all-new, never mixed (a half-migrated state would split true
    near-dup pairs across grids).

    Stream must be STOPPED (keep_last=0: every delta is rewritten,
    including the newest — run after a clean drain, when no replay is
    pending). Restart the pipeline passing the RETURNED plane count as
    ``semantic_n_planes``. The plane matrix is the same deterministic
    LCG prefix stream the batch operator uses, so post-migration
    behavior equals a fresh pipeline pinned at the new count (tested).
    """
    from bigdata_cookbook_spark.operators.dedup import (
        default_srp_planes_for,
        srp_bucket_expr,
        srp_planes,
    )

    emb_root = os.path.join(state_dir, "embeddings")
    if not os.path.isdir(emb_root):
        raise ValueError(f"no embeddings state under {state_dir}")
    state = spark.read.parquet(emb_root)
    if n_planes is None:
        n_planes = default_srp_planes_for(state.count())
    # bounded collect: one row to bind the plane width (same contract
    # class as semantic_dedup's dim probe). A schema-only state (every
    # batch so far had zero embedding-covered docs) has nothing to
    # re-bucket — return the chosen count for pinning, touch nothing.
    probe = state.select(F.size("vec")).first()
    if probe is None:
        return int(n_planes)
    dim = probe[0]
    planes = srp_planes(dim, n_planes, seed)

    def _transform(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            srp_bucket_expr(F.col("vec"), planes).alias("bucket"),
            "vec",
            "norm",
        )

    consolidate_deltas(
        spark, emb_root, keep_last=0, target_mb=target_mb, transform=_transform
    )
    return n_planes


def maintain_state(
    spark: SparkSession,
    state_dir: str,
    keep_last: int = 1,
    target_mb: int = 256,
    semantic_n_planes: int | None = None,
    target_bucket_rows: int = 64,
) -> dict[str, dict[str, int]]:
    """The nightly maintenance entry point for a streaming_corpus_clean
    deployment (stream STOPPED — see module contract):

    1. plane-staleness guard (FIRST, fail-loud before any work): when
       ``semantic_n_planes`` (the pipeline's pinned value) is given and
       the embeddings state has grown past its bucket-size target —
       srp_planes_recommended > pinned — raise with the migration
       instructions instead of silently compacting a state whose
       buckets have outgrown the linear-work contract;
    2. consolidate every present state table's deltas older than the
       newest ``keep_last`` into one directory (consolidate_deltas),
       bounding the per-table file AND directory count regardless of
       how many batches have ever run.

    Returns per-table consolidation stats. Safe to re-run; interrupted
    runs roll forward on the next call (or on any layout.py writer
    touching the same directories).
    """
    if semantic_n_planes is not None:
        rec = srp_planes_recommended(
            spark, state_dir, target_bucket_rows=target_bucket_rows
        )
        if rec is not None and rec > semantic_n_planes:
            raise RuntimeError(
                f"semantic SRP plane count is stale: pipeline pins "
                f"{semantic_n_planes} planes but the embeddings state "
                f"cardinality now calls for {rec} "
                f"(target {target_bucket_rows} rows/bucket) — expected "
                f"bucket occupancy has outgrown the linear-work "
                f"contract. Stop the stream and run "
                f"rebucket_srp_state(spark, {state_dir!r}), then "
                f"restart the pipeline with semantic_n_planes set to "
                f"its return value."
            )
    stats: dict[str, dict[str, int]] = {}
    for table in STATE_TABLES:
        stats[table] = consolidate_deltas(
            spark,
            os.path.join(state_dir, table),
            keep_last=keep_last,
            target_mb=target_mb,
        )
    return stats


def refresh_prune_thresholds(
    spark: SparkSession,
    output_dir: str,
    thresholds_path: str,
    score_col: str = "n_tokens",
    group_col: str = "source",
    keep_frac: float = 0.5,
) -> str:
    """Nightly half of the streaming quality prune: recompute the
    per-domain cut (operators/corpus.quality_prune_thresholds) over the
    ENTIRE kept corpus written so far (``output_dir``'s accumulated
    ingest_batch deltas) and persist it where the restarted stream picks
    it up via ``prune_thresholds=spark.read.parquet(path)``.

    Runs under the same stream-STOPPED contract as maintain_state (the
    overwrite is not atomic for a concurrent reader; the quiesced
    single-maintainer contract makes that moot). The snapshot-pinned cut
    is the declared semantics: batches ingested between refreshes are
    pruned against the previous snapshot — thresholds move only when
    maintenance runs, so batch composition never skews the cut.
    """
    from bigdata_cookbook_spark.operators.corpus import (
        quality_prune_thresholds,
    )

    kept = spark.read.parquet(output_dir)
    thr = quality_prune_thresholds(kept, score_col, group_col, keep_frac)
    thr.write.mode("overwrite").parquet(thresholds_path)
    return thresholds_path
