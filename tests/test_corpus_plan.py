"""End-to-end corpus-cleaning plan (plans/corpus.py): invariant tests.

The stages composing the plan are each oracle-verified individually
(text_stats, exact_dedup_docs, minhash_pairs, dedup_clusters); these tests
pin the COMPOSITION: cascade order of drop reasons, canonical-keep
consistency, and exact partitioning of the corpus into kept + dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.operators.dedup import normalized_text
from etl_adsbx_spark.plans.corpus import clean_corpus, corpus_audit
from etl_adsbx_spark.tables import load_table

SF = "/root/testdata/sf0.001"
QMIN = 0.5


def test_audit_partitions_the_corpus(spark):
    d = load_table(spark, SF, "documents")
    audit = corpus_audit(spark, SF, quality_min=QMIN).collect()
    assert len(audit) == d.count()
    reasons = {r["drop_reason"] for r in audit}
    assert reasons <= {None, "quality", "language", "exact_dup", "near_dup"}
    kept = [r for r in audit if r["drop_reason"] is None]
    assert 0 < len(kept) < len(audit)
    assert len(kept) == clean_corpus(spark, SF, quality_min=QMIN).count()


def test_gates_and_canonicals(spark):
    rows = corpus_audit(spark, SF, quality_min=QMIN).collect()
    by_id = {r["doc_id"]: r for r in rows}
    shas = {
        r["doc_id"]: r["sha"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.sha2(normalized_text("text"), 256).alias("sha"))
        .collect()
    }
    gated = {
        i
        for i, r in by_id.items()
        if r["quality"] >= QMIN and r["lang_pred"] == "en"
    }
    for r in rows:
        if r["drop_reason"] is None:
            # kept docs pass both gates and are their own cluster canonical
            assert r["doc_id"] in gated
            assert r["cluster_id"] == r["doc_id"]
        elif r["drop_reason"] == "quality":
            assert r["quality"] < QMIN
        elif r["drop_reason"] == "language":
            assert r["lang_pred"] != "en"
        elif r["drop_reason"] == "exact_dup":
            # a smaller gated doc with identical normalized text exists
            canon = min(i for i in gated if shas[i] == shas[r["doc_id"]])
            assert canon < r["doc_id"]
        elif r["drop_reason"] == "near_dup":
            # the cluster canonical is kept
            assert by_id[r["cluster_id"]]["drop_reason"] is None


def test_no_duplicate_texts_among_kept(spark):
    kept = clean_corpus(spark, SF, quality_min=QMIN).select("doc_id")
    d = load_table(spark, SF, "documents").select(
        "doc_id", F.sha2(normalized_text("text"), 256).alias("sha")
    )
    n_kept = kept.count()
    n_distinct = kept.join(d, "doc_id").select("sha").distinct().count()
    assert n_kept == n_distinct


def test_corpus_report_dataset_card(spark):
    """One row per stratum; counts reconcile with direct aggregation;
    crafted PII/repetition docs move the rate columns; single-pass plan
    (no window, one aggregate over one scan)."""
    from etl_adsbx_spark.plans.corpus import corpus_report

    d = load_table(spark, SF, "documents")
    rep = corpus_report(d, by=("lang",))
    rows = {r.lang: r for r in rep.collect()}
    langs = {r.lang for r in d.select("lang").distinct().collect()}
    assert set(rows) == langs
    assert sum(r.n_docs for r in rows.values()) == d.count()
    for r in rows.values():
        assert r.n_tokens > 0 and 0.0 <= r.frac_pii <= 1.0
        assert len(r.token_quantiles) == 4
        qs = list(r.token_quantiles)
        assert qs == sorted(qs), "quantiles must be monotone"
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "CartesianProduct" not in plan

    crafted = spark.createDataFrame(
        [
            (1, "a", "contact me at joe@example.com for the files"),
            (2, "a", "same line\nsame line\nsame line\nsame line"),
            (3, "a", "perfectly ordinary clean text with no issues at all"),
        ],
        ["doc_id", "split", "text"],
    )
    r = corpus_report(crafted, by=("split",)).collect()[0]
    assert r.n_docs == 3
    assert abs(r.frac_pii - 1 / 3) < 1e-4  # column rounds to 4 dp
    assert r.frac_repetitive >= 0.333  # doc 2 is all-duplicate lines; 4-dp rounding
