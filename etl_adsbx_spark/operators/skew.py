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


def skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 20
) -> DataFrame:
    """Join/agg-planning diagnostic: the ``top_n`` heaviest key groups
    with their row counts and share of the table, plus distribution
    columns every row carries (total rows, distinct keys, mean rows/key,
    p50/p99/p999/max of the per-key count). Read it before keying a
    shuffle: ``max_frac`` ≫ 1/parallelism means the hot keys need
    ``salted_agg``/``salted_join`` (or AQE skew-join, if the stage
    qualifies).

    Shape: one hash-agg to per-key counts (map-side partials), then the
    quantiles/top-n run over the COUNTS table (distinct-key-sized, not
    corpus-sized): a percentile sketch agg to one row, a rank+filter
    top-n, and a 1-row broadcast crossJoin to attach the distribution —
    no global sort, nothing driver-side."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    dist = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count("*").alias("n_keys"),
        (F.sum("n_rows") / F.count("*")).alias("mean_rows_per_key"),
        F.percentile_approx("n_rows", F.array(F.lit(0.5), F.lit(0.99), F.lit(0.999)), 10000).alias("_q"),
        F.max("n_rows").alias("max_rows_per_key"),
    ).select(
        "total_rows",
        "n_keys",
        "mean_rows_per_key",
        F.col("_q")[0].alias("p50_rows_per_key"),
        F.col("_q")[1].alias("p99_rows_per_key"),
        F.col("_q")[2].alias("p999_rows_per_key"),
        "max_rows_per_key",
    )
    from .agg import topk_per_group

    order = F.struct(F.col("n_rows"), *[F.col(c).cast("string") for c in key_cols])
    top = topk_per_group(counts, [], order, top_n, desc=True)
    return (
        top.crossJoin(F.broadcast(dist))
        .withColumn("frac", F.col("n_rows") / F.col("total_rows"))
        .withColumn("max_frac", F.col("max_rows_per_key") / F.col("total_rows"))
        .orderBy(F.col("n_rows").desc(), *key_cols)
    )
