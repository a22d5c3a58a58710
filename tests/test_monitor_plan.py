"""Corpus generation monitoring plan: sketch-pass artifacts + the
cross-generation report on crafted generations with known changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.plans.monitor import generation_report, generation_sketches


def _gen(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_generation_report_detects_known_changes(spark):
    stable_en = [
        (i, "en", f"the quick brown fox number {i} jumps over the lazy dog")
        for i in range(200)
    ]
    old_de = [
        (1000 + i, "de", f"der schnelle braune fuchs nummer {i} springt heute")
        for i in range(100)
    ]
    # new generation: en unchanged; de gains 50 docs of much longer,
    # different-vocabulary text and drops 10 old ones
    new_de = (
        old_de[10:]
        + [
            (
                2000 + i,
                "de",
                " ".join(f"neuwort{i}x{j}" for j in range(80)),
            )
            for i in range(50)
        ]
    )
    old = _gen(spark, stable_en + old_de)
    new = _gen(spark, stable_en + new_de)
    so = generation_sketches(old)
    sn = generation_sketches(new)
    rep = {r["lang"]: r for r in generation_report(so, sn).collect()}

    en = rep["en"]
    assert en["n_docs_delta"] == 0 and en["n_tokens_delta"] == 0
    assert en["quality_drift"] < 0.05 and en["len_drift"] < 0.05
    assert en["docs_added"] == 0 and en["docs_removed"] == 0
    assert en["vocab_jaccard"] > 0.98

    de = rep["de"]
    assert de["n_docs_old"] == 100 and de["n_docs_new"] == 140
    assert de["n_docs_delta"] == 40
    assert de["len_drift"] > 0.2  # a third of docs are ~8x longer
    assert 45 <= de["docs_added"] <= 55
    assert 8 <= de["docs_removed"] <= 12
    assert de["vocab_jaccard"] < 0.8  # new vocabulary arrived
    assert de["n_tokens_delta"] > 0


def test_generation_sketches_shape_and_stratum_isolation(spark):
    docs = _gen(
        spark,
        [(1, "en", "hello world"), (2, "de", "hallo welt"), (3, "en", "more words here")],
    )
    sk = generation_sketches(docs)
    rows = {r["lang"]: r for r in sk.collect()}
    assert set(rows) == {"en", "de"}
    assert rows["en"]["n_docs"] == 2 and rows["de"]["n_docs"] == 1
    assert rows["en"]["n_tokens"] == 5 and rows["de"]["n_tokens"] == 2
    assert set(sk.columns) == {
        "lang", "n_docs", "n_tokens", "q_quality", "q_len", "t_docs", "t_vocab",
    }
    # strata only in one generation are omitted from the report
    only_en = generation_sketches(docs.where(F.col("lang") == "en"))
    rep = generation_report(sk, only_en).collect()
    assert [r["lang"] for r in rep] == ["en"]
