"""[EXT] End-to-end training-data preparation — the full composition a
pretraining pipeline runs between "raw deduplicated crawl" and "tokens on
disk", built from operators this engine verifies individually:

    corpus cleaning      (plans.corpus: quality/language gates → exact
                          dedup → near-dup CC clustering → canonical keep)
      → decontamination  (word-5-gram overlap vs a broadcast eval set)
      → dataset mixing   (operators.sampling: per-source stratified rates)
      → sequence packing (operators.agg.global_running_sum token offsets)
      → corpus writer    (sinks.write_corpus: hive layout by split,
                          file-count budget, doc_id-clustered files)

100-TB shape, stage by stage: the cleaning gates are per-row expressions
that prune before any shuffle; dedup is one hash-agg plus one band
equi-join + O(|E|)-round CC; decontamination broadcasts the eval shingle
set so the train side never shuffles; mixing is a per-row salted-hash
filter; packing is the two-level distributed prefix sum (never a global
window); the writer shuffles once on (split, file slot). Across the whole
plan the corpus body is shuffled exactly twice (dedup band join, writer) —
everything else rides scans and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg import global_running_sum
from ..operators.dedup import word_shingles
from ..operators.sampling import stratified_sample
from ..sinks import write_corpus
from ..tables import load_table
from .corpus import corpus_audit


def decontaminate_against(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_hits: int = 0,
) -> DataFrame:
    """Drop training docs sharing more than ``max_hits`` distinct word
    ``n``-grams with the eval corpus. The eval side collapses to its
    distinct shingle set and broadcasts; the train side explodes shingles
    into the broadcast hash join and partial-aggregates hit counts
    map-side — the train corpus itself never shuffles."""
    ev = (
        eval_docs.select(F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g"))
        .distinct()
    )
    hits = (
        train.select(
            F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g")
        )
        .join(F.broadcast(ev), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("_n_hits"))
        .filter(F.col("_n_hits") > max_hits)
    )
    return train.join(hits.select(id_col), id_col, "left_anti")


def prepare_training_data(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    quality_min: float = 0.5,
    lang: str = "en",
    eval_docs: DataFrame | None = None,
    mix_rates: dict[str, float] | None = None,
    mix_default: float = 1.0,
    token_budget: int = 512,
    files_per_partition: int = 1,
    stage_counts: bool = True,
    shuffle_seed: int | None = None,
    classifier_weights: list[float] | None = None,
    classifier_min: float = 0.5,
    select_budget: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full chain over the ``documents`` table; returns
    ``(final_frame, stage_counts)`` and (if ``out_dir``) writes the hive
    split-partitioned corpus.

    The final frame carries one row per surviving document with its token
    count, global token offset, and the ``token_budget``-sized chunk range
    it spans — i.e. everything a tokenizing loader needs to slice training
    sequences without another full-corpus pass. (Up-sampling mixes with
    weights > 1 are built with ``operators.sampling.weighted_mix`` before
    packing; the stratified rates here down-sample only.)

    Stage-count cost: the audit frame is built ONCE and persisted — input
    and cleaned counts are cheap aggregates over it; the decontaminated and
    mixed counts each re-run their chain prefix, so 100-TB callers that
    don't need them should pass ``stage_counts=False`` (the written count
    comes from parquet footers either way). Observe-metric counts riding
    the final job were tried and REJECTED: the packing stage's prefix sum
    references its lazily-checkpointed input twice (rows + partition
    bases, operators/agg.py), so upstream CollectMetrics nodes execute
    twice per action and double-count.
    """
    audit = corpus_audit(spark, sf_dir, quality_min, lang).persist()
    d = load_table(spark, sf_dir, "documents")
    kept_ids = audit.filter(F.col("drop_reason").isNull()).select(
        "doc_id", "split", "quality"
    )
    kept = d.join(kept_ids, "doc_id")

    counts: dict[str, int] = {}
    if stage_counts:
        counts["input"] = audit.count()  # audit carries one row per input doc
        counts["cleaned"] = kept_ids.count()  # cheap: persisted-audit aggregate

    if eval_docs is not None:
        kept = decontaminate_against(kept, eval_docs)
        if stage_counts:
            counts["decontaminated"] = kept.count()

    if classifier_weights is not None:
        # learned quality gate (functions.classify): per-row
        # literal-weight sigmoid — costs one expression, prunes before
        # the sampling/packing shuffles like the heuristic gates
        from ..functions.classify import score_quality

        kept = score_quality(kept, classifier_weights, "text", "_q").where(
            F.col("_q") >= classifier_min
        ).drop("_q")
        if stage_counts:
            counts["classifier_gated"] = kept.count()

    if mix_rates is not None:
        kept = stratified_sample(
            kept, mix_rates, "source", "doc_id", default=mix_default
        )
        if stage_counts:
            counts["mixed"] = kept.count()

    from ..functions import text as T

    sized = kept.select(
        "doc_id",
        "lang",
        "source",
        "split",
        "quality",
        "text",
        T.token_count("text").cast("bigint").alias("n_tokens"),
    )
    if select_budget is not None:
        # token-budget selection (operators.sampling.select_to_budget):
        # best docs by the audit quality score until the global token
        # budget is spent — distributed prefix sum, whole docs only
        from ..operators.sampling import select_to_budget

        sized = select_to_budget(sized, "quality", "n_tokens", select_budget)
        if stage_counts:
            counts["budget_selected"] = sized.count()
    packed = global_running_sum(sized, ["doc_id"], "n_tokens", out_col="_cum")
    start = F.col("_cum") - F.col("n_tokens")
    final = packed.select(
        "doc_id",
        "lang",
        "source",
        "split",
        "text",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / token_budget).cast("bigint").alias("first_chunk"),
        F.floor((F.col("_cum") - 1) / token_budget).cast("bigint").alias("last_chunk"),
    )
    if shuffle_seed is not None:
        # training-order randomization: a deterministic hash order column
        # the writer clusters by. Files become unbiased random shards
        # (slot = hash of the order key) with rows hash-ordered inside, so
        # a loader reading shards in name order and rows in `_order` gets
        # a reproducible pseudorandom document order with NO global sort
        # in the write path — epoch reshuffles are just a new seed. For a
        # literal single global permutation use
        # operators.layout.deterministic_shuffle before a coalesced write.
        from ..operators.layout import shuffle_key

        final = final.withColumn("_order", shuffle_key(shuffle_seed, "doc_id"))
    if out_dir is not None:
        write_corpus(
            final,
            out_dir,
            partition_by=["split"],
            sort_by=["_order"] if shuffle_seed is not None else ["doc_id"],
            files_per_partition=files_per_partition,
            salt_col="_order" if shuffle_seed is not None else "doc_id",
        )
        # parquet footers only — not a recompute
        counts["written"] = spark.read.parquet(out_dir).count()
    audit.unpersist()
    return final, counts
