"""Event-stream analytics operators: batch sessionization, funnel
analysis, cohort retention, and SCD2 (type-2 slowly-changing-dimension)
history building.

These generalize the reference's event treatment — its pipeline stamps
each aircraft observation with a batch timestamp and keeps the
last-write-wins record per key (task.ts:176-189) — to the standard
event-analytics surface a telemetry warehouse needs: grouping the raw
observation stream into activity sessions, measuring ordered-step
conversion, cohorting entities by first appearance, and turning a
change log into a queryable validity-interval history.

Scale design (100 TB): every operator here is expressible as
user/entity-partitioned windows plus hash aggregations — the partition
key is always the entity id, so parallelism is the number of entities
and no window is global. There are no self-joins over the raw event
table; funnel/retention join *per-entity aggregates* (one row per
entity) back to events, which AQE broadcasts when the entity dimension
is small and shuffle-joins on the entity key otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_ns",
    gap: int = 30 * 60 * 10**9,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Assign inactivity-gap session indexes: a new session starts when
    the entity's previous event is more than ``gap`` (same unit as
    ``ts_col`` — nanoseconds for the driver tables' exact ``ts_ns``)
    in the past, or when there is no previous event.

    Plan: ONE entity-partitioned window computes the lag and the running
    sum of session-start flags in the same partition pass — `session_idx`
    is the per-entity 1-based session ordinal, deterministic because the
    ordering (`ts_col`, ``tiebreak``) is total. No shuffle beyond the
    single window exchange; at 100 TB this is the batch twin of the
    streaming session windows (streaming/windows.py:52), which share the
    same gap semantics.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    prev = F.lag(ts_col).over(w)
    is_start = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(key).orderBy(ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_idx", F.sum(is_start).over(cum).cast("bigint")
    )


def session_stats(
    sessions: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_ns",
    value_col: Column | None = None,
) -> DataFrame:
    """Per-session aggregate over a ``sessionize`` output: event count,
    first/last event time, and exact duration (same unit as ``ts_col``).
    One hash aggregation keyed by (entity, session_idx) — partial
    aggregation applies, so the shuffle carries one row per session."""
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("started_at"),
        F.max(ts_col).alias("ended_at"),
        (F.max(ts_col) - F.min(ts_col)).cast("bigint").alias("duration"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("session_value"))
    return sessions.groupBy(key, "session_idx").agg(*aggs)


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Ordered-step funnel: how many entities reached step i having
    performed every earlier step in order (step i's event at-or-after the
    entity's earliest valid step-(i-1) completion; re-orderings don't
    count). Returns one row per step: (step_idx, step, n_entities).

    Plan: a chain of per-entity MIN aggregations — stage i filters events
    to step i at-or-after the stage-(i-1) timestamp and takes the per-
    entity minimum. Each stage is ONE events-table pass joined to the
    previous stage's one-row-per-entity frame (entity-keyed; AQE
    broadcasts it when small). The events scan is reused len(steps)
    times, but each pass carries a pushed-down `type = step` filter, so
    at 100 TB each stage reads one event-type partition, not the corpus.
    Earliest-valid-completion (rather than any-completion) is the greedy
    choice that maximizes downstream matches, the standard funnel
    semantics."""
    reached = None
    out = []
    for i, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step)
        if reached is not None:
            stage = stage.join(
                reached.select(F.col(key).alias("_k"), "_t"),
                (F.col(key) == F.col("_k")) & (F.col(ts_col) >= F.col("_t")),
            )
        reached = stage.groupBy(key).agg(F.min(ts_col).alias("_t"))
        out.append(
            reached.agg(F.count("*").alias("n_entities")).select(
                F.lit(i + 1).cast("bigint").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col("n_entities").cast("bigint"),
            )
        )
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res


def retention_cohorts(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: entities are cohorted by the period of
    their first event; a cohort row (cohort, period_offset, n_active)
    counts the cohort's distinct entities active in the cohort period +
    offset. Output offsets are dense per observed activity (no zero-fill
    — compose with a grid join if a dense matrix is needed).

    Plan: one per-entity MIN aggregation (the cohort assignment, one row
    per entity), an entity-keyed join back to the per-(entity, period)
    distinct activity frame, then one hash agg. The activity frame is
    pre-shrunk to one row per (entity, period) BEFORE the join, so the
    join input is bounded by entities × active-periods, never raw
    events.

    Offsets are computed with ``datediff``/``months_between`` on the
    truncated timestamps — calendar-exact in any session timezone. A
    fixed-microseconds divisor is NOT: across a DST shift the delta
    between two ``date_trunc('week')`` boundaries is not an exact
    multiple of 7 days and the bigint cast truncates to the wrong
    offset."""
    divisors = {"day": 1, "week": 7}
    if period not in divisors and period != "month":
        raise ValueError(
            f"retention period must be day/week/month, got {period!r}"
        )
    per = F.date_trunc(period, F.col(ts_col))
    first = events.groupBy(key).agg(F.min(per).alias("cohort"))
    active = events.select(key, per.alias("_p")).distinct()
    joined = active.join(first, on=key)
    if period == "month":
        offset = F.months_between(F.col("_p"), F.col("cohort"))
    else:
        offset = F.datediff(F.col("_p"), F.col("cohort")) / F.lit(
            divisors[period]
        )
    return (
        joined.groupBy("cohort", offset.cast("bigint").alias("period_offset"))
        .agg(F.count_distinct(F.col(key)).alias("n_active"))
    )


def build_scd2(
    changes: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts_ns",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log:
    consecutive duplicate attribute values are compressed (a row is a
    change only if its value differs from the entity's previous value),
    and each surviving change carries its validity interval
    [valid_from, valid_to) plus an `is_current` flag (open interval =
    current). The standard warehouse dimension-history build.

    Plan: two entity-partitioned windows over the same partition keys —
    lag() for change compression, then lead() on the compressed frame
    for interval close. The second window's input is already hash-
    partitioned by the entity key from the first, so no second exchange
    is planned. No joins, no global ordering; scales with entities."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    compressed = (
        changes.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr) != F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return compressed.select(
        key,
        F.col(attr).alias("attr_value"),
        F.col(ts_col).cast("bigint").alias("valid_from"),
        F.lead(ts_col).over(w2).cast("bigint").alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts_ns",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Incrementally merge a new change-log batch into an existing SCD2
    dimension (the per-tick twin of ``build_scd2``, same contract as the
    other incremental admissions: dedup.py's exact/minhash admission,
    similarity.py's IVF append). Every batch timestamp must be at or
    after the dimension's max valid_from (append-only history — the
    standard warehouse constraint); out-of-order batches belong in a
    rebuild, not a merge.

    Plan: the batch is change-compressed against itself AND against each
    entity's single current dimension row (an entity-keyed join against
    the `is_current` slice — one row per entity, broadcastable), then
    current rows whose entity changed are closed (valid_to = first new
    valid_from) and the new rows appended. Cost scales with the batch +
    the current slice, never the full history."""
    current = dim.filter(F.col("is_current")).select(
        F.col(key).alias("_k"),
        # the dimension's schema names the attribute `attr_value`
        # (build_scd2's output), NOT the change-log's `attr` column
        F.col("attr_value").alias("_cur_attr"),
        F.col("valid_from").alias("_cur_from"),
    )
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    batch_scd = (
        batch.withColumn("_prev", F.lag(attr).over(w))
        .join(current, F.col(key) == F.col("_k"), "left_outer")
        .filter(
            (
                F.col("_prev").isNull()
                & (F.col("_cur_attr").isNull() | (F.col(attr) != F.col("_cur_attr")))
            )
            | (F.col("_prev").isNotNull() & (F.col(attr) != F.col("_prev")))
        )
        .select(
            key,
            F.col(attr).alias("attr_value"),
            F.col(ts_col).cast("bigint").alias("valid_from"),
            F.col(tiebreak).alias("_tb"),
        )
    )
    # interval-close window carries the same tiebreak as the compression
    # window: two surviving changes with equal timestamps for one entity
    # must close deterministically (ordering by valid_from alone leaves
    # valid_to/is_current to shuffle order)
    w2 = Window.partitionBy(key).orderBy("valid_from", "_tb")
    new_rows = (
        batch_scd.withColumn(
            "valid_to", F.lead("valid_from").over(w2).cast("bigint")
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_tb")
    )
    first_new = batch_scd.groupBy(key).agg(F.min("valid_from").alias("_close_at"))
    closed = (
        dim.join(first_new, on=key, how="left_outer")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("_close_at").isNotNull(),
                F.col("_close_at"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current", F.col("is_current") & F.col("_close_at").isNull()
        )
        .drop("_close_at")
    )
    cols = [key, "attr_value", "valid_from", "valid_to", "is_current"]
    return closed.select(*cols).unionByName(new_rows.select(*cols))


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Enrich each fact row with the SCD2 attribute valid AT the fact's
    timestamp: join ``dim`` (a ``build_scd2``/``scd2_merge`` output with
    [valid_from, valid_to) intervals) on the entity key plus interval
    containment ``valid_from <= ts < coalesce(valid_to, +inf)``. Facts
    before the entity's first change (or for unknown entities) keep a
    NULL attribute — the standard point-in-time dimension lookup every
    SCD2 consumer runs.

    Plan: ONE entity-keyed equi-join carrying the interval predicate as
    a residual filter — the hash key does all the data movement, and an
    entity's dimension slice (its few change rows) meets each of its
    facts exactly once post-filter. Validity intervals per entity are
    disjoint by construction (build_scd2 compresses consecutive
    duplicates), so the join is 1:≤1 — no fact duplication. At 100 TB
    the dim side is entities × changes ≪ facts and AQE broadcasts it;
    otherwise both sides shuffle once on the entity key."""
    d = dim.select(
        F.col(key).alias("_dk"),
        F.col("attr_value"),
        F.col("valid_from"),
        F.col("valid_to"),
    )
    out = facts.join(
        d,
        (F.col(key) == F.col("_dk"))
        & (F.col("valid_from") <= F.col(ts_col))
        & (F.col("valid_to").isNull() | (F.col(ts_col) < F.col("valid_to"))),
        "left_outer",
    )
    return out.drop("_dk", "valid_from", "valid_to")


def session_paths_topk(
    events: DataFrame,
    k: int = 10,
    max_steps: int = 5,
    key: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    gap: int = 30 * 60 * 10**9,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Top-k most common session journey prefixes: sessionize, take each
    session's first ``max_steps`` event types in time order, count
    identical paths, return the ``k`` most frequent (ties broken by path
    string so the top-k is total-ordered). The classic product-analytics
    "what do users do" query.

    Plan: the sessionize window pass, then ONE hash-agg per (entity,
    session) building the ordered path with ``array_sort`` over
    (ts, tiebreak, type) structs — the sort is per-session-sized, inside
    the aggregation buffer, never a corpus sort — then a path-keyed
    count and a TakeOrderedAndProject top-k. No stage is keyed on
    anything wider than the session or path."""
    sess = sessionize(events, key=key, ts_col=ts_col, gap=gap, tiebreak=tiebreak)
    paths = (
        sess.groupBy(key, "session_idx")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(tiebreak).alias("tb"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("_evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.slice(F.transform(F.col("_evs"), lambda s: s["e"]), 1, max_steps),
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    return counted.orderBy(F.desc("n_sessions"), "path").limit(k)
