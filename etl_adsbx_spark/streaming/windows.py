"""Event-time windowing over streams (SURVEY.md §2B streaming).

The reference IS a scheduled micro-batch stream (task.ts:97-98); these
helpers generalize it: tumbling/sliding/session windows with watermarks for
late data (`seen`/staleness generalized, task.ts:90-91). All helpers work
on both batch and streaming DataFrames — same expressions, which is the
point of Structured Streaming's unified model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    group_cols: list[str],
    aggs: list,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation. On a stream, pass
    ``watermark`` (e.g. '10 minutes') to bound state and drop late rows."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def sliding_agg(
    df: DataFrame, ts_col: str, width: str, slide: str, group_cols: list[str], aggs: list,
    watermark: str | None = None,
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def session_agg(
    df: DataFrame, ts_col: str, gap: str, group_cols: list[str], aggs: list,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    session per group."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("win.start"))
        .withColumn("session_end", F.col("win.end"))
        .drop("win")
    )


def run_micro_batches(
    source: DataFrame, batch_fn, checkpoint: str, trigger_once: bool = True
):
    """foreachBatch pipeline runner — the `control()`-per-tick shape (R29).
    ``batch_fn(df, batch_id)`` receives each micro-batch."""
    writer = source.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
