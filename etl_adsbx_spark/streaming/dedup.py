"""Cross-batch stateful dedup — R21 generalized across micro-batches
(SURVEY.md §7 hard-point 5).

Two scale-appropriate strategies:

- ``streaming_dropdup``: built-in ``dropDuplicatesWithinWatermark`` —
  first-occurrence dedup with state bounded by the watermark. Zero custom
  state code; this is the default.
- ``stateful_last_position``: ``applyInPandasWithState`` keeping the
  *latest* observation per key across batches (Map-upsert semantics across
  ticks) with a state TTL — the genuinely custom stateful piece.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_dropdup(df: DataFrame, keys: list[str], ts_col: str, watermark: str) -> DataFrame:
    """First-occurrence dedup across batches with watermark-bounded state."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


TRACK_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", TimestampType(), False),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("n_seen", LongType(), False),
    ]
)

TRACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("last_ts", TimestampType(), False),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("n_seen", LongType(), False),
    ]
)


def _track_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keep the most recent observation + count per aircraft id."""
    if state.hasTimedOut:
        state.remove()
        return
    last_ts, lat, lon, n = (
        state.get if state.exists else (dt.datetime.min, None, None, 0)
    )
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        n += len(pdf)
        row = pdf.iloc[-1]
        if state.exists is False or row["ts"] >= last_ts:
            last_ts, lat, lon = row["ts"], row["lat"], row["lon"]
    state.update((last_ts, lat, lon, n))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict ids silent for 1h
    yield pd.DataFrame(
        {"id": [key[0]], "last_ts": [last_ts], "lat": [lat], "lon": [lon], "n_seen": [n]}
    )


def stateful_last_position(df: DataFrame) -> DataFrame:
    """Latest position per id across micro-batches (columns: id, ts, lat,
    lon). Output mode must be 'update'."""
    return df.groupBy("id").applyInPandasWithState(
        _track_fn,
        outputStructType=TRACK_OUTPUT_SCHEMA,
        stateStructType=TRACK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
