"""Aggregation helpers beyond plain ``groupBy().agg()`` (SURVEY.md §2B)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_col: Column, k: int, desc: bool = True
) -> DataFrame:
    """Top-k rows per group via window rank + filter.

    At scale the window sorts within each group's partition only (hash
    partition on group keys, in-partition sort) — no global sort. For very
    hot groups AQE skew handling applies; for tiny k an alternative is
    ``max_by`` over collect_list, but rank+filter keeps whole-stage codegen.
    """
    order = order_col.desc() if desc else order_col.asc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def count_per_batch(df: DataFrame) -> int:
    """Observability count per batch — reference `ids.size` log
    (task.ts:251, R27)."""
    return df.count()


def observed_count(df: DataFrame):
    """R27 in its zero-cost form: attach an ``observe`` metric instead of
    running a separate count job. The count accumulates on the rows the
    query already processes — no extra scan, and the same mechanism works
    on streams (metrics surface in StreamingQueryProgress, where a second
    `df.count()` job is impossible). Returns (df, observation); read
    ``observation.get`` after an action on ``df``."""
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
