"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's monitor keeps a mutable per-task state dict across rounds
(ref pbc_monitor.py:1137-1207 + state.py). The streaming-native equivalent
is arbitrary stateful processing: per-key GroupState that survives across
micro-batches and checkpoints/restores with the query.

``user_activity_tracker`` maintains, per user_id: cumulative event count,
cumulative value cents (exact), and last-seen timestamp — the streaming twin
of the per-task TaskStats accumulation. Emits one updated row per user per
micro-batch in which the user appeared.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_cents", LongType()),
    StructField("last_ts", TimestampType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_cents", LongType()),
    StructField("last_ts_iso", StringType()),
])


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
    n, cents, last_iso = state.get if state.exists else (0, 0, None)
    last = pd.Timestamp(last_iso) if last_iso else None
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        mx = pdf["ts"].max()
        last = mx if last is None or mx > last else last
    state.update((int(n), int(cents), last.isoformat() if last is not None else None))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [int(n)],
            "total_cents": [int(cents)],
            "last_ts": [last],
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """events(ts, user_id, value) stream → per-user cumulative stats with
    explicit GroupState (no timeout: the seen-set analog never expires)."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
