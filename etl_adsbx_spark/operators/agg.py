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


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_parts: int | None = None,
) -> DataFrame:
    """Distributed global prefix sum: ``out_col`` = sum of ``value_col``
    over all rows up to and including this one in ``order_cols`` order.

    The naive form — ``Window.orderBy(...)`` with no partition keys —
    collapses the whole dataset into ONE task (Spark must see every row to
    order it), which is the single worst scale trap in window functions.
    This is the textbook two-level rewrite that stays parallel:

    1. ``repartitionByRange(order_cols)`` — range shuffle, partitions are
       contiguous key ranges (any boundary placement is correct; sampled
       boundaries only affect balance);
    2. per-partition running sum: ``Window.partitionBy(partition_id)
       .orderBy(order_cols)`` — each partition sorts locally in parallel;
    3. per-partition totals (one tiny row per partition) get their own
       running sum — at most a few thousand rows, broadcast back as base
       offsets and added to the local sums.

    Wall-clock at 100 TB: one range shuffle + one local sort, same cost
    class as a global orderBy; the prefix-sum itself adds a broadcast of
    #partitions rows. Exactly reproducible for any partition count.
    """
    num_parts = num_parts or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(num_parts, *[F.col(c) for c in order_cols])
    # Materialize ONE physical partitioning that both consumers below (the
    # row side and the per-partition `bases` aggregate) read: `_pid` comes
    # from spark_partition_id() over a *sampled* range shuffle, so if the
    # two subtrees executed independently (exchange reuse defeated by conf
    # or plan divergence) the sampler could re-draw boundaries and the two
    # sides would disagree on partition assignment — wrong base offsets.
    # A lazy localCheckpoint pins the assignment instead of relying on
    # ReuseExchange.
    local = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local.withColumn("_local_cum", F.sum(value_col).over(w_local))
    # tiny frame: one row per partition — a driver-size window is fine here
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_pt"))
        .withColumn("_base", F.coalesce(F.sum("_pt").over(w_pid), F.lit(0)))
        .select("_pid", "_base")
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn(out_col, (F.col("_base") + F.col("_local_cum")).cast("bigint"))
        .drop("_pid", "_local_cum", "_base")
    )


def distinct_sketch(
    df: DataFrame, keys: list[str] | None, value_col: str, lgk: int = 12,
    out_col: str = "sketch",
) -> DataFrame:
    """Per-stratum HLL distinct-count sketch — the persistable,
    UNION-MERGEABLE form of ``approx_count_distinct``. One row per key
    group with a Datasketches HLL binary (``hll_sketch_agg``); estimate
    with ``sketch_estimate``; merge ticks/partitions with
    ``merge_distinct_sketches``. This is what makes "distinct users per
    source, all time" maintainable at 100 TB: each ingest tick sketches
    only its batch (map-side partial agg, ~KB per group), the merge is a
    tiny groupBy over sketch rows, and NOTHING ever recounts history —
    the exact-distinct alternative is an ever-growing shuffle of every
    key ever seen. Standard error ~1.04/√2^lgk (~1.6% at the lgk=12
    default)."""
    keys = keys or []
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(out_col)
    )


def merge_distinct_sketches(
    *sketch_frames: DataFrame, keys: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union HLL sketch frames (same lgk) into one row per key group —
    the cross-tick maintenance op (cf. ``dedup.bloom_merge``): union the
    persisted sketch table with the new tick's and re-aggregate with
    ``hll_union_agg``. Commutative/associative/idempotent-under-reinsert,
    so retries and replays cannot drift the estimate."""
    import functools

    keys = keys or []
    unioned = functools.reduce(
        lambda a, b: a.unionByName(b),
        [s.select(*keys, sketch_col) for s in sketch_frames],
    )
    return unioned.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def sketch_estimate(
    sketch_frame: DataFrame, keys: list[str] | None = None,
    sketch_col: str = "sketch", out_col: str = "n_distinct",
) -> DataFrame:
    """Distinct-count estimates from a sketch frame: (keys…, n_distinct)."""
    keys = keys or []
    return sketch_frame.select(
        *keys, F.hll_sketch_estimate(sketch_col).alias(out_col)
    )


def pack_bins(
    df: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_groups: int = 64,
) -> DataFrame:
    """Bin packing WITHOUT splitting documents — the complement of the
    concat-and-chunk packing (`global_running_sum` offsets): each output
    bin holds whole documents totaling ≤ ``budget`` tokens, for training
    setups that refuse cross-document attention / truncation. Returns the
    input columns + (bin_id: bigint, bin_fill: bigint, oversize: bool);
    oversize docs (> budget alone) get a dedicated bin, flagged.

    Global first-fit-decreasing is inherently sequential, so the
    distributed form shards docs into ``n_groups`` deterministic hash
    groups and runs exact FFD per group in an Arrow ``applyInPandas``
    stage — one shuffle on the group key, Python touching only (id, size)
    pairs, never text. Packing quality: FFD's 11/9·OPT+1 bound applies
    PER GROUP; with hundreds of docs per group the partition-induced loss
    is a fraction of a bin per group (the tests measure fill ≥ 0.7 on
    driver data). Size ``n_groups`` so a group's (id, size) rows fit one
    task comfortably — 10^6 docs/group is a few tens of MB. bin_id =
    group·2^32 + local bin index: globally unique, deterministic under
    retries/repartitioning (content-derived group, sorted FFD order)."""
    import pandas as pd

    meta = df.select(
        F.col(id_col).alias("_pid"),
        F.col(size_col).cast("bigint").alias("_sz"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).alias("_grp"),
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["_grp"].iloc[0]) << 32
        pdf = pdf.sort_values(["_sz", "_pid"], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per local bin
        out_bin, out_fill = [], []
        for sz in pdf["_sz"]:
            if sz > budget:
                bins.append(0)  # dedicated, already full
                out_bin.append(g + len(bins) - 1)
                continue
            for bi in range(len(bins)):
                if bins[bi] >= sz:
                    bins[bi] -= sz
                    out_bin.append(g + bi)
                    break
            else:
                bins.append(budget - sz)
                out_bin.append(g + len(bins) - 1)
        fill = {}
        for b, sz in zip(out_bin, pdf["_sz"]):
            fill[b] = fill.get(b, 0) + int(sz)
        out_fill = [fill[b] for b in out_bin]
        return pd.DataFrame(
            {
                "_pid": pdf["_pid"].values,
                "bin_id": out_bin,
                "bin_fill": out_fill,
                "oversize": (pdf["_sz"] > budget).values,
            }
        )

    packed = meta.groupBy("_grp").applyInPandas(
        ffd, f"_pid {dict(meta.dtypes)['_pid']}, bin_id long, bin_fill long, oversize boolean"
    )
    return df.join(packed.withColumnRenamed("_pid", id_col), id_col)
