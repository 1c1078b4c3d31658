"""Relational analytics combinators (SURVEY.md §2.5-2.7).

Every combinator is a pure DataFrame -> DataFrame function built from
Catalyst-plannable primitives (window functions, groupBy/pivot, sequence/
explode). No collects, no Python row loops — all of these scale by
partitioning on their grouping keys; the only shuffles are the ones the
semantics require (one per groupBy/window key set, shared when key sets
align).

Reference parity notes cite /root/reference file:line in each docstring;
implementations are Spark-native, not ports.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per partition (W1: reference tool.py:121-128,1259-1263).

    Uses row_number (deterministic given a total order in ``order_by`` —
    callers must include a tiebreak column). Single shuffle on
    ``partition_by``; at scale this is the standard rank-pushdown pattern
    and AQE handles skewed partitions.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def argmax_row_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Single best row per group (W2: reference tool.py:49-91, Election
    visualization_tools.py:94-110 "day with max count, then last row").

    Equivalent to topk_per_group(k=1); kept as a named operator because the
    reference uses the argmax-then-join-back idiom pervasively (J7).
    """
    return topk_per_group(df, partition_by, order_by, k=1)


def keep_first_dedup(
    df: DataFrame,
    dup_keys: Sequence[str],
    order_by: Sequence[Column],
) -> tuple[DataFrame, DataFrame]:
    """Split into (first-row-per-dup-group, remainder) (O3: reference
    Tracking_Inflation_Drivers/src/tools.py:69-79).

    Returns both halves so W4 group_ffill can reinstate the remainder later.
    One shuffle on dup_keys, reused by both outputs.
    """
    w = Window.partitionBy(*dup_keys).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") == 1).drop("__rn")
    rest = ranked.filter(F.col("__rn") > 1).drop("__rn")
    return kept, rest


def group_ffill(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    cols: Sequence[str],
) -> DataFrame:
    """Forward-fill ``cols`` within each group ordered by ``order_by``
    (W4: reference tools.py:81-90 re-instates dup rows then ffills
    label/motivation).

    last(ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT — exactly
    pandas ffill semantics but with an explicit ordering (the reference
    relies on frame order; we pin it).
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def mode_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Most frequent value per group, ties broken by value ascending
    (A6: reference Election visualization_tools.py:608-612 value_counts().
    idxmax(); pandas idxmax takes first of the sort, we declare the
    deterministic tiebreak explicitly).

    count + row_number instead of mode() so the tiebreak is total.
    """
    out_col = out_col or value_col
    counts = df.groupBy(*group_by, value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*group_by).orderBy(F.col("__cnt").desc(), F.col(value_col).asc())
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*group_by, F.col(value_col).alias(out_col))
    )


def calendar_densify(
    df: DataFrame,
    date_col: str,
    entity_cols: Sequence[str],
    value_cols: dict[str, Column],
    start: Column | None = None,
    end: Column | None = None,
    step: str = "interval 1 day",
) -> DataFrame:
    """Zero-filled (period × entity) grid (J9: reference tool.py:708-753,
    Election visualization_tools.py:272-284 reindex against full calendar).

    sequence()+explode generates the calendar (distributed, no driver loop),
    crossJoin with the distinct entity set (both sides tiny relative to the
    fact table — broadcast), then left join facts and coalesce to 0.

    ``df`` must already be aggregated to one row per (date, entities).
    ``value_cols`` maps output name -> fill expression given the joined
    column may be null, e.g. {"cnt": F.coalesce(F.col("cnt"), F.lit(0))}.
    """
    start = start if start is not None else F.min(date_col)
    end = end if end is not None else F.max(date_col)
    bounds = df.select(start.alias("__lo"), end.alias("__hi"))
    calendar = bounds.select(
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(date_col)
    )
    entities = df.select(*entity_cols).distinct()
    grid = calendar.crossJoin(entities)
    joined = grid.join(df, on=[date_col, *entity_cols], how="left")
    return joined.select(
        date_col,
        *entity_cols,
        *[expr.alias(name) for name, expr in value_cols.items()],
    )


def zscore_per_series(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-series z-score with std=0 -> 0 (W6: reference
    Narrative_Miners/src/tool.py:37-45).

    Sample stddev (pandas default ddof=1) over an unbounded partition
    window; single shuffle on the series key.
    """
    w = Window.partitionBy(*partition_by)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when((std.isNull()) | (std == 0), F.lit(0.0)).otherwise((F.col(value_col) - mean) / std)
    return df.withColumn(out_col, z)


def gaussian_kernel(sigma: float, radius: int) -> list[float]:
    """Normalized 1-D Gaussian kernel, matching scipy.ndimage
    gaussian_filter1d's truncated+renormalized kernel."""
    raw = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-radius, radius + 1)]
    s = sum(raw)
    return [v / s for v in raw]


def gaussian_smooth(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    sigma: float = 2.0,
    radius: int | None = None,
    out_col: str = "smoothed",
) -> DataFrame:
    """Fixed-kernel Gaussian smoothing over an ordered series (W7:
    reference Narrative_Miners/src/tool.py:50,67 gaussian_filter1d(sigma=2)).

    Expressed as sum(w_i * nth-neighbor) via lag/lead inside one window —
    stays in whole-stage codegen, no UDF. Edge handling: kernel weights for
    out-of-range neighbors are dropped and the kernel renormalized over the
    in-range weights ("reflect"-free truncation — declared engine semantics;
    scipy's default 'reflect' mode differs at the 2 edge points, documented
    deviation for SQL-oracle parity).
    """
    if radius is None:
        radius = int(4.0 * sigma + 0.5)  # scipy default truncate=4.0
    kernel = gaussian_kernel(sigma, radius)
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    num = None
    den = None
    for i, wt in zip(range(-radius, radius + 1), kernel):
        neighbor = F.lag(value_col, -i).over(w)  # lag(-i) == lead(i)
        term = F.when(neighbor.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        contrib = F.when(neighbor.isNotNull(), neighbor * F.lit(wt)).otherwise(F.lit(0.0))
        num = contrib if num is None else num + contrib
        den = term if den is None else den + term
    return df.withColumn(out_col, num / den)


def pivot_composite(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
    composite_col: str = "composite_score",
) -> DataFrame:
    """groupBy().pivot() with explicit value list + row-sum composite score
    (A9/A14: reference mind_map_tools.py:559-578 generate_pivot_table,
    Election visualization_tools.py:238 unstack(fill_value=0)).

    Explicit ``pivot_values`` keeps the plan single-pass (no extra distinct
    scan to discover columns) — at 100 TB that scan matters.
    """
    out = df.groupBy(*group_by).pivot(pivot_col, list(pivot_values)).agg(agg).na.fill(0)
    composite = None
    for v in pivot_values:
        c = F.col(f"`{v}`")
        composite = c if composite is None else composite + c
    return out.withColumn(composite_col, composite)


def net_exposure(
    pos: DataFrame,
    neg: DataFrame,
    keys: Sequence[str],
    pos_col: str = "pos_cnt",
    neg_col: str = "neg_cnt",
) -> DataFrame:
    """Full-outer merge of positive/negative count frames with zero fill,
    percentage shares and net score (J1+A11+A12: reference tool.py:298-319,
    1073).

    Both inputs are aggregates (small); a full-outer sort-merge join on the
    keys — Catalyst broadcasts if one side fits.
    """
    p = pos.withColumnRenamed(pos.columns[-1], pos_col) if pos_col not in pos.columns else pos
    n = neg.withColumnRenamed(neg.columns[-1], neg_col) if neg_col not in neg.columns else neg
    joined = p.join(n, on=list(keys), how="full_outer")
    pc = F.coalesce(F.col(pos_col), F.lit(0))
    nc = F.coalesce(F.col(neg_col), F.lit(0))
    total = pc + nc
    return joined.select(
        *keys,
        pc.alias(pos_col),
        nc.alias(neg_col),
        (pc + nc).alias("total_cnt"),
        F.round(pc * 100.0 / F.when(total == 0, F.lit(None)).otherwise(total), 2).alias("pos_pct"),
        F.round(nc * 100.0 / F.when(total == 0, F.lit(None)).otherwise(total), 2).alias("neg_pct"),
        (F.abs(pc) - F.abs(nc)).alias("net_exposure"),
    )


def to_display_schema(
    df: DataFrame,
    rename: dict[str, str],
    ts_col: str | None = None,
    period_col: str = "Time Period",
) -> DataFrame:
    """P1 — engine snake_case -> display Title Case projection, plus the
    derived '%b %Y' period column and date-only cast (reference
    transform_to_reference_format, tool.py:1096-1135). Display renaming is
    a FINAL projection by design (SURVEY §1.3) — internals never see
    display names."""
    out = df
    if ts_col is not None:
        out = out.withColumn(period_col, F.date_format(F.col(ts_col), "MMM yyyy"))
        out = out.withColumn(ts_col, F.to_date(ts_col))
    return out.withColumnsRenamed(rename)


def topic_blacklist_filter(
    df: DataFrame,
    blacklist: list[str],
    topics_col: str = "topics",
    types_col: str = "topics_type",
    drop_type: str = "COMP",
) -> DataFrame:
    """P6 — per-row topic cleanup (reference
    visualization_tools.py:582-606): drop topics of ``drop_type`` (company
    names repeat the entity column) and any blacklisted topic, keeping the
    two parallel arrays aligned. Pure zip/filter expressions — no explode,
    no shuffle."""
    zipped = F.arrays_zip(F.col(topics_col), F.col(types_col))
    if blacklist:
        pred = lambda x: (x[types_col] != drop_type) & ~x[topics_col].isin(*blacklist)  # noqa: E731
    else:
        pred = lambda x: x[types_col] != drop_type  # noqa: E731
    kept = F.filter(zipped, pred)
    # both outputs projected in ONE select: sequential withColumn would
    # re-evaluate `kept` against the already-replaced topics column
    others = [c for c in df.columns if c not in (topics_col, types_col)]
    return df.select(
        *others,
        F.transform(kept, lambda x: x[topics_col]).alias(topics_col),
        F.transform(kept, lambda x: x[types_col]).alias(types_col),
    )
