"""Skew mitigation combinators for the 100 TB tier.

Skewed keys are the canonical large-cluster failure mode the reference
never hits (single-node pandas has no partitions to skew): one hot
entity_id — a mega-cap company mentioned in 5% of all chunks — lands an
entire join or aggregation key's rows on one task, and the stage runs at
the speed of that straggler.

Three standing mitigations. No rand() anywhere: join salts derive from
hash() of stable columns so results are reproducible; the agg scatter
salt is arbitrary by design (any scatter is correct for merge-associative
partials, including under task retry):

- `salted_join(facts, dim, key, n_salts)` — replicate the (small) build
  side n_salts times, scatter the (large) probe side by a derived salt, so
  a hot key spreads over n_salts tasks. Output is row-identical to the
  plain equi-join. Use when the build side is too big to broadcast but
  the probe side is skewed; when the build side fits in memory, plain
  broadcast() already sidesteps skew and is cheaper than salting.

- `salted_agg(df, keys, aggs, n_salts)` — two-phase aggregation through a
  salt column: partial aggregate on (keys + salt), final merge on keys.
  Spark's hash aggregate already does map-side partial aggregation for
  algebraic functions, which handles most count/sum skew; salting is for
  the holdouts where the REDUCE side itself explodes — collect_list /
  collect_set / countDistinct over a hot key.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in the default session
profile, session.py) splits skewed SORT-MERGE join partitions at runtime
and is the first line of defense; these combinators cover what AQE can't:
aggregation skew, and plans where a shuffle-hash join or pre-AQE stage
boundary hides the skew from the runtime re-planner.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _probe_salt(n_salts: int, seed_cols: Sequence[str | Column]) -> Column:
    """Deterministic salt in [0, n_salts) from stable row columns."""
    return F.pmod(F.hash(*[F.col(c) if isinstance(c, str) else c for c in seed_cols]), F.lit(n_salts)).cast("int")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_seed_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the probe side scattered across n_salts sub-keys.

    The build side is exploded n_salts times (cost: n_salts x |build|
    shuffle rows — acceptable when |build| << |probe|, the regime where
    salting applies at all); the probe side derives a salt from
    salt_seed_cols (default: all non-key columns, falling back to the key
    itself if there are none). Join keys become (key..., salt), then the
    salt is dropped. Row multiset equals the unsalted join for how in
    {inner, left}.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    seed = list(salt_seed_cols) if salt_seed_cols else [c for c in probe.columns if c not in keys] or keys
    salted_probe = probe.withColumn(SALT_COL, _probe_salt(n_salts, seed))
    salted_build = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = salted_probe.join(salted_build, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs maps output column -> (input_col, partial_fn, merge_fn), e.g.
      {"n": (None, "count", "sum"),
       "vals": ("v", "collect_list", "flatten_collect")}
    Supported fn pairs: count/sum, sum/sum, min/min, max/max,
    collect_list/flatten_collect, collect_set/flatten_set.
    The hot key's rows partial-aggregate in n_salts parallel tasks; only
    n_salts pre-aggregated rows per key reach the final merge.
    """
    partial_exprs = []
    merge_exprs = []
    for out_col, (in_col, partial_fn, merge_fn) in aggs.items():
        pcol = f"__p_{out_col}"
        if partial_fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(pcol))
        else:
            partial_exprs.append(getattr(F, partial_fn)(in_col).alias(pcol))
        if merge_fn == "sum":
            merge_exprs.append(F.sum(pcol).alias(out_col))
        elif merge_fn in ("min", "max"):
            merge_exprs.append(getattr(F, merge_fn)(pcol).alias(out_col))
        elif merge_fn == "flatten_collect":
            merge_exprs.append(F.flatten(F.collect_list(pcol)).alias(out_col))
        elif merge_fn == "flatten_set":
            merge_exprs.append(
                F.array_distinct(F.flatten(F.collect_list(pcol))).alias(out_col)
            )
        else:
            raise ValueError(f"unsupported merge fn {merge_fn!r}")
    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts))
    salted = df.withColumn(SALT_COL, salt.cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Skew-safe COUNT(DISTINCT col) per keys.

    countDistinct is NOT scatter-mergeable (the same value on two salts
    would double-count), so the salt must be value-aligned: salt =
    hash(col) % n_salts puts every copy of a value in exactly one salt
    group. Per-salt exact distinct counts then SUM to the global distinct
    count. This is the exact-tier answer; at the 100 TB tier
    approx_count_distinct (HyperLogLog++, natively mergeable, no salting
    needed) is the declared alternative.
    """
    salted = df.withColumn(SALT_COL, F.pmod(F.hash(col), F.lit(n_salts)).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.countDistinct(col).alias("__p_nd")
    )
    return partial.groupBy(*keys).agg(F.sum("__p_nd").cast("long").alias(out_col))
