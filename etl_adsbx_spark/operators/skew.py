"""Skew mitigation — salting patterns for hot keys (SURVEY.md §2B,
100-TB design point).

A handful of hot keys (here: 5 event types over the whole events stream)
turns a shuffle into a few giant reducer partitions. Two standard cures,
both *exact* (results are invariant to the salt, so they oracle-check
against the unsalted SQL):

- **Salted two-phase aggregation**: groupBy(key, salt) partial-aggregates
  each hot key into ``buckets`` cells spread across reducers, then a
  second tiny groupBy(key) merges the partials. Works for any algebraic
  aggregate (sum/count/min/max — anything with a merge function).
- **Salted replicated join**: the large side gets a salt column, the small
  side is replicated ``buckets``× (one copy per salt value) so the join
  key becomes (key, salt) — each hot key's rows land on ``buckets``
  different reducers. Spark's AQE skew-join splitting does this
  adaptively for sort-merge joins; the explicit form is for when the
  optimizer can't see the skew (e.g. a key that is hot only after a
  filter) or for engines/stages where AQE doesn't apply.

The salt must vary *within* a key but be stable for a row: a hash of a
unique row id. It must NOT be `rand()` (breaks retry determinism — a
recomputed task would re-salt differently mid-shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, buckets: int = 16) -> DataFrame:
    """Attach a deterministic salt in [0, buckets) from a unique column."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: name → (partial_agg_expr, merge_agg_expr_over(name)). E.g.
    ``{"n": (F.count("*"), F.sum("n")), "s": (F.sum(c), F.sum("s"))}``.
    Phase 1 shuffles on (keys, salt) — ``buckets``× more reducers share a
    hot key; phase 2 shuffles only ``|keys| × buckets`` partial rows.
    """
    salted = with_salt(df, unique_col, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    unique_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicated-salt equi-join: ``large ⋈ small`` on ``on`` rewritten to
    join on (on, salt) with ``small`` replicated buckets×. Exact same
    result as the plain join; the hot key's probe rows are spread over
    ``buckets`` reducers. Small side grows buckets× — only use when it is
    genuinely small (it usually is; that's why its keys are hot)."""
    l = with_salt(large, unique_col, buckets)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l.join(s, [on, "_salt"], how).drop("_salt")
