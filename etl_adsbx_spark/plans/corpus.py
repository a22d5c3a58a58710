"""[EXT] End-to-end corpus-cleaning plan — the composition a training-data
pipeline actually runs over a raw document crawl, built entirely from the
operators this engine already verifies individually:

    quality/language gate  (functions.text — per-row, codegen)
      → exact dedup        (sha256 hash-agg, min doc_id per normalized text)
      → near-dup clustering (MinHash-LSH pairs → connected components)
      → canonical keep     (drop non-canonical cluster members)
      → deterministic split (md5-bucket train/val/test)

100-TB shape: one hash-agg shuffle (exact dedup), one band equi-join +
CC rounds (near-dup), everything else per-row expressions. No all-pairs
stage, no window over the full corpus, no driver-side collection. Each
stage's keep/drop decision is carried as a column, so ``corpus_audit``
(why was each document dropped) and ``clean_corpus`` (the kept rows) are
two views of ONE plan. Callers that want both should pay for it once:
persist/cache the ``corpus_audit`` frame and pass it to ``clean_corpus``
via ``audit_df`` (or filter it themselves) — two independent calls each
build and execute the full LSH + connected-components pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    normalized_text,
)
from ..tables import load_table


def clean_corpus(
    spark: SparkSession,
    sf_dir: str,
    quality_min: float = 0.5,
    lang: str = "en",
    shingle_n: int = 3,
    audit_df: DataFrame | None = None,
) -> DataFrame:
    """Returns the cleaned corpus: one row per KEPT document with
    (doc_id, quality, lang_pred, split) plus the audit columns
    (drop_reason is NULL for kept rows). Filter `drop_reason IS NULL`
    is already applied; the audit variant is `corpus_audit`.

    Callers that also consume the audit should build it once —
    ``audit = corpus_audit(...).persist()`` — and pass it as ``audit_df``
    so the expensive dedup stages (LSH join + CC rounds) execute a single
    time instead of once per consumer.
    """
    audit = (
        audit_df
        if audit_df is not None
        else corpus_audit(spark, sf_dir, quality_min, lang, shingle_n)
    )
    return audit.filter(F.col("drop_reason").isNull())


def corpus_audit(
    spark: SparkSession,
    sf_dir: str,
    quality_min: float = 0.5,
    lang: str = "en",
    shingle_n: int = 3,
) -> DataFrame:
    """Every input document with its keep/drop decision:

    drop_reason ∈ (NULL=kept, 'quality', 'language', 'exact_dup',
    'near_dup'). Decisions cascade in that order — a low-quality doc is
    dropped as 'quality' even if it is also a duplicate, mirroring the
    cheapest-gate-first order the stages execute in (per-row gates prune
    before any shuffle happens).
    """
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "text",
        T.quality_score("text").alias("quality"),
        T.lang_id("text").alias("lang_pred"),
        T.split_assign("doc_id").alias("split"),
        F.sha2(normalized_text("text"), 256).alias("_sha"),
    )

    # Per-row gates first: only gate-surviving docs pay for the dedup
    # shuffles (predicate pushes into both dedup subplans below).
    gated = feats.filter(
        (F.col("quality") >= quality_min) & (F.col("lang_pred") == lang)
    )

    # Exact dedup: canonical = min doc_id per normalized-text hash.
    exact_keep = gated.groupBy("_sha").agg(F.min("doc_id").alias("_exact_keep"))
    after_exact = gated.join(exact_keep, "_sha").withColumn(
        "_is_exact_dup", F.col("doc_id") != F.col("_exact_keep")
    )
    exact_survivors = after_exact.filter(~F.col("_is_exact_dup"))

    # Near-dup clustering over the exact-survivors only.
    pairs = minhash_lsh_pairs(
        exact_survivors.select("doc_id", "text"), "doc_id", "text", shingle_n
    )
    cc = connected_components(pairs, exact_survivors.select("doc_id"), "doc_id")
    survivors = exact_survivors.join(cc, "doc_id").withColumn(
        "_is_near_dup", F.col("doc_id") != F.col("cluster_id")
    )

    audit = (
        feats.join(
            survivors.select("doc_id", "cluster_id", "_is_near_dup"), "doc_id", "left"
        )
        .join(after_exact.select("doc_id", "_is_exact_dup"), "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            "lang_pred",
            "split",
            "cluster_id",
            F.when(F.col("quality") < quality_min, F.lit("quality"))
            .when(F.col("lang_pred") != lang, F.lit("language"))
            .when(F.col("_is_exact_dup"), F.lit("exact_dup"))
            .when(F.col("_is_near_dup"), F.lit("near_dup"))
            .alias("drop_reason"),
        )
    )
    return audit


def corpus_report(
    docs: DataFrame,
    by: tuple[str, ...] = ("split",),
    text_col: str = "text",
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99),
) -> DataFrame:
    """The dataset-card frame: one row per ``by`` stratum with the
    numbers every corpus release publishes — document and token counts,
    token-length quantiles, mean quality, language/PII/repetition rates.
    Input is any frame carrying ``text_col`` plus the ``by`` columns
    (typically ``clean_corpus`` joined back to the raw text, or the raw
    documents table grouped by source).

    100-TB shape: ONE pass — every signal is a per-row codegen expression
    (functions.text) feeding a single hash-agg on the stratum key;
    quantiles use ``approx_percentile`` (t-digest-style mergeable sketch,
    map-side partials) rather than ``percentile`` (which collects per-key
    value arrays). No window, no second scan, no driver loop.
    """
    qcol = F.array(*[F.lit(q) for q in quantiles])
    # pii struct materialized once per row, then field-referenced — three
    # pii_counts() calls would re-run all three regex scans each
    per_row = docs.select(
        *by,
        T.token_count(text_col).alias("_tok"),
        T.quality_score(text_col).alias("_q"),
        (T.lang_id(text_col) == F.lit("en")).cast("int").alias("_en"),
        T.pii_counts(text_col).alias("_piic"),
        (T.dup_line_frac(text_col) > 0.3).cast("int").alias("_repet"),
    ).withColumn(
        "_pii",
        (F.col("_piic.n_email") + F.col("_piic.n_ip") + F.col("_piic.n_phone") > 0).cast(
            "int"
        ),
    )
    return (
        per_row.groupBy(*by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.round(F.avg("_tok"), 2).alias("mean_tokens"),
            F.expr("approx_percentile(_tok, array(" + ",".join(map(str, quantiles)) + "))").alias(
                "token_quantiles"
            ),
            F.round(F.avg("_q"), 4).alias("mean_quality"),
            F.round(F.avg("_en"), 4).alias("frac_en"),
            F.round(F.avg("_pii"), 4).alias("frac_pii"),
            F.round(F.avg("_repet"), 4).alias("frac_repetitive"),
        )
        .withColumn("quantile_probs", qcol)
        .orderBy(*by)
    )
