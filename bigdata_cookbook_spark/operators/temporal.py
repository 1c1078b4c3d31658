"""Temporal joins: as-of and binned range join (scale-tier custom operators).

The reference has no as-of or range joins (SURVEY.md §2.4 — all joins are
equi-joins), but a production deployment of its time-series analytics
immediately wants both: "latest filing score as of each news event",
"every event within N hours of a screening hit". Spark has no native
ASOF/RANGE join operator, and the naive formulation — a theta join
`l.ts >= r.ts` — explodes to |L|x|R| rows per key before filtering, which
is exactly what must never happen at 100 TB. Both operators here are
compositions of shuffle-friendly primitives:

- **asof_join** — union both sides tagged, one window pass per key
  ordered by (ts, side): `last(right_col, ignorenulls)` over the
  unbounded-preceding frame gives every left row the most recent right
  row with right.ts <= left.ts. ONE shuffle on the key (same cost as a
  plain equi-join), no pair explosion, no per-key driver loop. This is
  the merge-join formulation databases use for ASOF, expressed
  relationally.

- **range_join_binned** — equi-join the interval side exploded to
  fixed-width time bins against the point side's single bin, then apply
  the exact range predicate. Join fan-out is bounded by
  interval_length/bin_width per interval instead of |points|x|intervals|;
  each (point, interval) pair meets exactly once (a point lives in one
  bin), so no post-join dedup is needed. Bin width is the knob: set it
  near the typical interval length so most intervals explode to 1-2 bins.

DuckDB oracles: native `ASOF JOIN` and a plain range-predicate join —
the binning must be invisible in results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join: each left row picks the nearest right row at or
    before it (direction="backward", the default: greatest right.ts <=
    left.ts) or at or after it (direction="forward": smallest right.ts >=
    left.ts) within the same `by` key.

    right_cols: right-side payload columns to carry (default: everything
    except the key/time columns). Names must not collide with left's —
    rename on the right DataFrame first. tolerance: SQL interval string
    (e.g. "2 hours"); matches farther than tolerance from left.ts null
    out. Both knobs match pandas.merge_asof semantics
    (allow_exact_matches=True).

    Scale: one shuffle on `by` + a per-key sort — the window never sees
    more than one key per frame. Keys are assumed numerous (entity/user
    grain); a single global as-of (by=[]) degenerates to one partition
    and should use a range-partitioned sort instead.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance is not None:
        # tolerance arithmetic is INTERVAL-based; it needs a temporal
        # `on` column (timestamp/date), not an epoch-number ordering key
        from pyspark.sql.types import DateType, TimestampType

        if not isinstance(right.schema[on].dataType, (TimestampType, DateType)):
            raise ValueError(
                f"tolerance requires a timestamp/date `on` column; "
                f"{on!r} is {right.schema[on].dataType.simpleString()}"
            )
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c not in by + [on]]
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right_cols collide with left columns: {sorted(collisions)}")
    left_payload = [c for c in left.columns if c not in by + [on]]

    def rtype(c: str):
        return right.schema[c].dataType

    # unified relation: right rows sort before left rows at equal ts
    # (__seq 0 < 1) so ties are inclusive, matching ASOF's ts >= semantics
    l_side = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__seq"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rtype(on)).alias("__r_ts"),  # match `on`'s real type
        *[F.lit(None).cast(rtype(c)).alias(c) for c in right_cols],
    )
    r_side = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__seq"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.col(on).alias("__r_ts"),
        *[F.col(c) for c in right_cols],
    )
    # scan order: backward walks time ascending (nearest preceding right
    # row is the last seen); forward walks descending (nearest following
    # right row is the last seen). Either way right sorts before left at
    # equal ts (__seq 0 < 1), keeping exact matches visible.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        *by,
        "__ts",
        "__seq",
        *left_payload,
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    out = filled.filter(F.col("__seq") == 1)
    if tolerance is not None:
        if direction == "backward":
            in_tol = F.col("__m_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            in_tol = F.col("__m_ts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *by,
            "__ts",
            *left_payload,
            F.when(in_tol, F.col("__m_ts")).alias("__m_ts"),
            *[F.when(in_tol, F.col(c)).alias(c) for c in right_cols],
        )
    return out.select(
        *by,
        F.col("__ts").alias(on),
        *left_payload,
        F.col("__m_ts").alias(f"__asof_{on}"),
        *right_cols,
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    equi_keys: list[str] | None = None,
    bin_seconds: int = 3600,
    inclusive: tuple[bool, bool] = (False, True),
) -> DataFrame:
    """Join each point to every interval (same equi_keys) containing it.

    Containment bounds follow `inclusive` = (start-inclusive,
    end-inclusive); the default (False, True) matches the
    "events strictly after the trigger, up to and including the horizon"
    shape. Output: all interval columns + all point columns.

    Bin math is integer epoch-microseconds — no float rounding at bin
    edges. The interval side explodes to ceil(len/bin)+1 bins; keep
    bin_seconds near the typical interval length.
    """
    equi_keys = equi_keys or []
    width_us = F.lit(int(bin_seconds) * 1_000_000)
    p_bin = F.floor(F.unix_micros(F.col(point_ts)) / width_us)
    i_bins = F.sequence(
        F.floor(F.unix_micros(F.col(start_col)) / width_us),
        F.floor(F.unix_micros(F.col(end_col)) / width_us),
    )
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(i_bins))
    lo = F.col(start_col)
    hi = F.col(end_col)
    ts = F.col(point_ts)
    cond = (ts >= lo) if inclusive[0] else (ts > lo)
    cond = cond & ((ts <= hi) if inclusive[1] else (ts < hi))
    return (
        i.join(p, on=equi_keys + ["__bin"], how="inner")
        .filter(cond)
        .drop("__bin")
    )
