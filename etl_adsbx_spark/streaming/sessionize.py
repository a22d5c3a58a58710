"""Cross-tick incremental sessionization (streaming twin of
``operators.events.sessionize``).

The reference is a scheduled micro-batch stream (task.ts:97-98, R29) whose
only cross-batch state is keyed recency (`seen`, task.ts:136-190). This
module generalizes that keyed-state-per-tick shape to the session surface:
an inactivity-gap session that SPANS two micro-batches must keep ONE
``session_idx``, and a gap that elapses between ticks must open a new one —
semantics identical to the batch operator, so a 3-tick replay of the same
events equals one batch pass (pinned by tests/test_streaming.py).

Design: ``foreachBatch`` + an explicit per-entity state frame rather than
``applyInPandasWithState`` — the state is relational (one row per entity:
last event time, sessions so far), every per-tick step is a keyed
join/window (no Python in the loop), and the state frame is inspectable /
persistable as a plain table, which is what a warehouse wants from an
incremental pipeline. At 100 TB the state is entity-dimension-sized
(≪ events); the tick cost is one entity-keyed window over the TICK's
events plus one entity-keyed join against state — never a rescan of
history. On a real cluster persist the state to a table (or checkpointed
storage) per tick instead of ``localCheckpoint``.

CONTRACT (the R29 micro-batch model): ticks arrive in event-time order —
every event in tick N is at-or-after the entity's events in ticks < N.
Late arrivals that violate this would be sessionized against the wrong
predecessor; use the watermarking session window (streaming/windows.py:52)
when late data must be handled instead of forbidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_tick(
    events: DataFrame,
    state: DataFrame | None,
    key: str = "user_id",
    ts_col: str = "ts_ns",
    gap: int = 30 * 60 * 10**9,
    tiebreak: str = "event_id",
) -> tuple[DataFrame, DataFrame]:
    """Sessionize ONE micro-batch seeded by cross-tick state.

    ``state`` is the previous tick's state frame (``key``/``last_ts``/
    ``n_sessions``; None or empty for the first tick). Returns
    ``(sessionized, new_state)`` where ``sessionized`` is the tick's
    events + ``session_idx`` (the per-entity 1-based ordinal, CONTINUING
    the entity's numbering across ticks) and ``new_state`` covers every
    entity seen so far.

    Same session test as the batch operator: an event starts a new
    session when its predecessor — the previous event in this tick, or
    the entity's ``last_ts`` from state for the tick's first event — is
    more than ``gap`` in the past or absent. ``session_idx`` is then
    ``n_sessions`` carried in plus the running count of starts, which for
    a continuing session (first tick event within ``gap``) re-yields the
    open session's ordinal.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    if state is not None:
        st = state.select(
            F.col("key").alias(key),
            F.col("last_ts").alias("_st_last_ts"),
            F.col("n_sessions").alias("_st_n"),
        )
        # no broadcast hint: state is entity-dimension-sized and AQE
        # broadcasts it when it is actually small
        ev = events.join(st, key, "left")
    else:
        ev = events.withColumn("_st_last_ts", F.lit(None).cast("long")).withColumn(
            "_st_n", F.lit(None).cast("long")
        )

    prev = F.coalesce(F.lag(ts_col).over(w), F.col("_st_last_ts"))
    is_start = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    out = ev.withColumn(
        "session_idx",
        (F.coalesce(F.col("_st_n"), F.lit(0)) + F.sum(is_start).over(cum)).cast(
            "bigint"
        ),
    ).drop("_st_last_ts", "_st_n")

    upd = out.groupBy(key).agg(
        F.max(ts_col).cast("long").alias("last_ts"),
        F.max("session_idx").cast("long").alias("n_sessions"),
    )
    if state is not None:
        # entities silent this tick keep their state; updated ones win
        u = upd.withColumnRenamed(key, "key")
        new_state = (
            state.alias("s")
            .join(u.alias("u"), "key", "full_outer")
            .select(
                "key",
                F.coalesce(F.col("u.last_ts"), F.col("s.last_ts")).alias("last_ts"),
                F.coalesce(F.col("u.n_sessions"), F.col("s.n_sessions")).alias(
                    "n_sessions"
                ),
            )
        )
    else:
        new_state = upd.withColumnRenamed(key, "key")
    return out, new_state


SESSION_STATE_SCHEMA = "session_start long, last_ts long, n_events long, ordinal long"


def stateful_sessionize(
    df: DataFrame,
    gap_seconds: int,
    watermark: str = "10 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """TRUE-streaming sessionization via ``applyInPandasWithState`` with
    event-time timeouts — emits each CLOSED session exactly once:
    (key, session_idx, session_start, session_end, n_events).

    A session closes when (a) a later event of the same entity arrives
    more than ``gap_seconds`` after its last event, or (b) the watermark
    passes last_event + gap (the event-time TIMER — this is what
    ``foreachBatch``-style incremental state cannot express and the
    built-in ``F.session_window`` aggregate hides: an open session with
    no successor still closes, exactly once, when enough event time has
    provably passed). State per entity is one 4-field row; memory is
    bounded by the live-entity count, evicted on close.

    Unlike the seeded-window ``sessionize_tick`` (which trusts tick
    ordering), this handles late data up to the watermark delay: rows
    are buffered nowhere — each batch's events fold into the open
    session in event-time order (extending session_start backwards when
    a late event precedes it), and rows older than the watermark are
    dropped by the engine before reaching the state function. One
    documented approximation: a late event more than ``gap`` older than
    the open session's start is MERGED into it rather than retro-split
    into its own session — an already-emitted predecessor session is
    never re-opened (append-mode emissions are immutable).

    ``df`` must be a STREAMING frame with an event-time ``ts_col``
    (TimestampType). Output mode must be 'append'.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = int(gap_seconds) * 1000
    key_type = dict(df.dtypes)[key]
    out_schema = (
        f"{key} {key_type}, session_idx long, session_start timestamp, "
        "session_end timestamp, n_events long"
    )

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        def closed_row(ordinal, start_ms, end_ms, n):
            return pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "session_idx": [ordinal],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_ms, last_ms, n, ordinal = state.get
            state.remove()
            yield closed_row(ordinal, start_ms, last_ms, n)
            return

        if state.exists:
            start_ms, last_ms, n, ordinal = state.get
        else:
            start_ms = last_ms = None
            n, ordinal = 0, 0

        events = []
        for pdf in pdfs:
            events.extend(int(t.value // 10**6) for t in pdf[ts_col])
        events.sort()
        for t in events:
            if last_ms is None:
                ordinal += 1
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > gap_ms:
                yield closed_row(ordinal, start_ms, last_ms, n)
                ordinal += 1
                start_ms, last_ms, n = t, t, 1
            else:
                # late cross-batch event may precede the open session's
                # start — extend the session backwards so session_start /
                # n_events stay correct for late-but-within-watermark data.
                # An event more than `gap` older than start_ms is MERGED
                # rather than retro-split (a closed predecessor session is
                # never re-opened; documented contract).
                start_ms = min(start_ms, t)
                last_ms = max(last_ms, t)
                n += 1

        deadline = last_ms + gap_ms
        wm = state.getCurrentWatermarkMs()
        if deadline <= wm:
            # already provably over — close now; a timer in the past is
            # rejected by the engine
            state.remove()
            yield closed_row(ordinal, start_ms, last_ms, n)
        else:
            state.update((start_ms, last_ms, n, ordinal))
            state.setTimeoutTimestamp(deadline)

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


class IncrementalSessionizer:
    """Stateful wrapper for ``foreachBatch``: call ``process(df)`` per
    tick; sessionized output accumulates via the supplied ``sink_fn`` (or
    collect it from the return value). State is ``localCheckpoint``-ed per
    tick so each tick's plan does not grow the lineage chain — swap for a
    durable table write on a real cluster (same frame, same schema)."""

    def __init__(
        self,
        key: str = "user_id",
        ts_col: str = "ts_ns",
        gap: int = 30 * 60 * 10**9,
        tiebreak: str = "event_id",
    ):
        self.key, self.ts_col, self.gap, self.tiebreak = key, ts_col, gap, tiebreak
        self.state: DataFrame | None = None

    def process(self, events: DataFrame) -> DataFrame:
        out, new_state = sessionize_tick(
            events, self.state, self.key, self.ts_col, self.gap, self.tiebreak
        )
        out = out.localCheckpoint(eager=True)  # pin BEFORE state advances
        prev, self.state = self.state, new_state.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        return out

    def foreach_batch_fn(self, sink_fn):
        """``batch_fn(df, batch_id)`` adapter for ``run_micro_batches``."""

        def fn(df: DataFrame, batch_id: int) -> None:
            sink_fn(self.process(df), batch_id)

        return fn
