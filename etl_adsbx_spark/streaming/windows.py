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


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair rows sharing ``key`` where
    ``right_ts ∈ [left_ts − lower, left_ts + upper]`` (the canonical
    impressions⋈clicks attribution shape; the streaming counterpart of
    ``operators.joins.bucketed_range_join``).

    Both sides carry the SAME watermark delay, and the join condition's
    explicit time bounds are what let Structured Streaming evict state:
    each side buffers only rows inside watermark + interval, so state is
    bounded regardless of stream length. Execution shuffles both sides on
    ``key`` (co-partitioned stateful join) — at scale this is one
    hash-partition exchange per side, and the per-key time-range probe is
    local to the state store. Outer variants (``how='leftOuter'`` etc.)
    emit unmatched rows once the watermark passes their join horizon.

    The right side's key and timestamp are prefixed ``r_`` in the output
    (self-join-safe, and the caller can see both event times).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    for c in (key, right_ts):
        rw = rw.withColumnRenamed(c, f"r_{c}")
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (rw[f"r_{right_ts}"] >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (rw[f"r_{right_ts}"] <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


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
