"""Token-budget corpus selection, compression-ratio signal, within-doc
paragraph dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.functions.signals import with_compression_ratio
from etl_adsbx_spark.functions.text import dedup_paragraphs, n_paragraphs_removed
from etl_adsbx_spark.operators.sampling import select_to_budget


def _scored(spark, rows=None):
    rows = rows or [
        # (doc_id, quality, n_tokens)
        (1, 0.9, 100),
        (2, 0.8, 200),
        (3, 0.7, 150),
        (4, 0.7, 50),  # ties with 3 on score -> doc_id order decides
        (5, 0.2, 400),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, quality double, n_tokens bigint")


def test_select_to_budget_greedy_whole_docs(spark):
    d = _scored(spark)
    # greedy order: 1(100), 2(300), 3(450), 4(500), 5(900)
    kept = {r["doc_id"] for r in select_to_budget(d, "quality", "n_tokens", 500).collect()}
    assert kept == {1, 2, 3, 4}
    # 449: doc 3 crosses the budget -> dropped, and so is everything below
    # it (no partial docs, no skip-ahead to the smaller doc 4)
    kept = {r["doc_id"] for r in select_to_budget(d, "quality", "n_tokens", 449).collect()}
    assert kept == {1, 2}
    # tie on score: doc 3 precedes doc 4 by the doc_id tiebreak
    kept = {r["doc_id"] for r in select_to_budget(d, "quality", "n_tokens", 450).collect()}
    assert kept == {1, 2, 3}


def test_select_to_budget_monotone_and_partition_invariant(spark):
    d = _scored(spark)
    prev: set = set()
    for budget in (0, 100, 300, 450, 500, 900, 10_000):
        kept = {
            r["doc_id"] for r in select_to_budget(d, "quality", "n_tokens", budget).collect()
        }
        assert prev <= kept, (budget, prev, kept)
        prev = kept
    assert prev == {1, 2, 3, 4, 5}  # large budget keeps everything
    a = {r["doc_id"] for r in select_to_budget(d, "quality", "n_tokens", 500).collect()}
    b = {
        r["doc_id"]
        for r in select_to_budget(d.repartition(7), "quality", "n_tokens", 500).collect()
    }
    assert a == b


def test_select_to_budget_keeps_schema(spark):
    d = _scored(spark)
    out = select_to_budget(d, "quality", "n_tokens", 500)
    assert out.columns == d.columns


def test_compression_ratio_bands(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 20),  # prose
            (2, "spam " * 400),  # heavy repetition
            (3, "k9#xQ!m2@Zr8$wL5^vB3&nT7*pD1(jF4)hG6-sA0_eC"),  # char soup
            (4, ""),
            (5, None),
        ],
        "doc_id bigint, text string",
    )
    r = {
        row["doc_id"]: row["compression_ratio"]
        for row in with_compression_ratio(docs).collect()
    }
    assert r[2] < r[1] < r[3], r  # repetition < prose < incompressible
    assert r[2] < 0.1
    assert r[3] > 0.8
    assert r[4] == 1.0 and r[5] == 1.0


def test_compression_ratio_passthrough_and_plan(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en")], "doc_id bigint, text string, lang string"
    )
    out = with_compression_ratio(docs)
    assert out.columns == ["doc_id", "text", "lang", "compression_ratio"]
    row = out.first()
    assert (row["doc_id"], row["text"], row["lang"]) == (1, "hello world", "en")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side kernel, no shuffle


def test_dedup_paragraphs_first_occurrence_order(spark):
    text = "intro\n\nbody one\n\nnav menu\n\nbody two\n\nnav menu\n\nintro"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = df.select(
        dedup_paragraphs("text").alias("t"),
        n_paragraphs_removed("text").alias("n"),
    ).first()
    assert row["t"] == "intro\n\nbody one\n\nnav menu\n\nbody two"
    assert row["n"] == 2
    # idempotent; clean docs untouched
    clean = spark.createDataFrame([(1, "a\n\nb")], "doc_id bigint, text string")
    r2 = clean.select(
        dedup_paragraphs("text").alias("t"), n_paragraphs_removed("text").alias("n")
    ).first()
    assert r2["t"] == "a\n\nb" and r2["n"] == 0


def test_canonicalize_text_expression(spark):
    from etl_adsbx_spark.functions.text import canonicalize_text

    raw = "“Hello” — it’s a test…\x00\x07 zero​width\n  next\t line  "
    df = spark.createDataFrame([(1, raw)], "doc_id bigint, text string")
    out = df.select(canonicalize_text("text").alias("t")).first()["t"]
    assert out == "\"Hello\" - it's a test... zerowidth\n next line"
    # idempotent; newlines preserved
    again = (
        spark.createDataFrame([(1, out)], "doc_id bigint, text string")
        .select(canonicalize_text("text").alias("t"))
        .first()["t"]
    )
    assert again == out
    plan = df.select(canonicalize_text("text"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_nfc_kernel_composes_and_fixes_dedup_misses(spark):
    from etl_adsbx_spark.functions.signals import with_nfc_text
    from etl_adsbx_spark.operators.dedup import exact_dedup

    composed = "café menu"          # é as one code point
    decomposed = "café menu"       # e + combining acute
    docs = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None)], "doc_id bigint, text string"
    )
    # without NFC the two spellings hash apart...
    assert exact_dedup(docs.where(F.col("text").isNotNull())).count() == 2
    # ...after NFC they are exact duplicates
    nfc = with_nfc_text(docs)
    texts = {r["doc_id"]: r["text"] for r in nfc.collect()}
    assert texts[1] == texts[2] == composed
    assert texts[3] is None
    assert nfc.columns == docs.columns
    assert exact_dedup(nfc.where(F.col("text").isNotNull())).count() == 1
    # out_col variant appends instead of overwriting
    appended = with_nfc_text(docs, out_col="text_nfc")
    assert appended.columns == ["doc_id", "text", "text_nfc"]


def test_script_ratios(spark):
    from etl_adsbx_spark.functions.text import script_ratios

    docs = spark.createDataFrame(
        [
            (1, "hello world entirely latin text"),
            (2, "日本語のテキストです"),
            (3, "русский текст здесь"),
            (4, "نص عربي هنا"),
            (5, "mixed 日本語 and latin"),
            (6, "   "),
            (7, "12345 !!!"),
        ],
        "doc_id bigint, text string",
    )
    r = {row["doc_id"]: row["s"] for row in docs.select("doc_id", script_ratios("text").alias("s")).collect()}
    assert r[1]["latin"] == 1.0 and r[1]["cjk"] == 0.0
    assert r[2]["cjk"] == 1.0
    assert r[3]["cyrillic"] == 1.0
    assert r[4]["arabic"] == 1.0
    assert r[5]["latin"] == 13 / 16 and r[5]["cjk"] == 3 / 16
    assert abs(r[5]["latin"] + r[5]["cjk"] + r[5]["other"] - 1.0) < 1e-9
    assert all(v == 0.0 for v in [r[6][k] for k in ("latin", "cjk", "cyrillic", "arabic", "other")])
    assert r[7]["other"] == 1.0
    plan = docs.select(script_ratios("text"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_select_to_budget_matches_python_greedy_property(spark):
    """Hypothesis: the distributed selection equals the sequential greedy
    reference (sort by (-score, id), take while cumulative cost fits,
    stop at the first overflow) on random instances."""
    from hypothesis import given, settings, strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32),
            st.integers(min_value=1, max_value=300),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=12, deadline=None)
    @given(rows_strategy, st.integers(min_value=0, max_value=1500))
    def check(pairs, budget):
        rows = [(i, float(s), int(c)) for i, (s, c) in enumerate(pairs)]
        d = spark.createDataFrame(rows, "doc_id bigint, quality double, n_tokens bigint")
        got = {r["doc_id"] for r in select_to_budget(d, "quality", "n_tokens", budget).collect()}
        expect, cum = set(), 0
        for i, s, c in sorted(rows, key=lambda r: (-r[1], str(r[0]))):
            cum += c
            if cum > budget:
                break
            expect.add(i)
        assert got == expect, (rows, budget, got, expect)

    check()


def test_blocklist_and_url_domain_filters(spark):
    from etl_adsbx_spark.functions.text import (
        blocklist_hits,
        domain_blocked,
        extract_urls,
        url_domains,
    )

    docs = spark.createDataFrame(
        [
            (1, "a clean document about cooking pasta"),
            (2, "BadWord appears here and badword again plus okay text"),
            (3, "see https://ads.example.com/x?q=1 and http://Example.COM/page"),
            (4, "link to https://notexample.com/a and https://good.org/b"),
            (5, "subclass of a class"),  # 'class' must not hit 'ass'
            (6, ""),
        ],
        "doc_id bigint, text string",
    )
    hits = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", blocklist_hits("text", ["badword", "ass"]).alias("h")
        ).collect()
    }
    # distinct-token semantics: 'badword' counts once despite 2 mentions
    assert hits == {1: 0, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0}

    urls = docs.where(F.col("doc_id") == 3).select(extract_urls("text").alias("u")).first()["u"]
    assert list(urls) == ["https://ads.example.com/x?q=1", "http://Example.COM/page"]
    doms = docs.where(F.col("doc_id") == 3).select(url_domains("text").alias("d")).first()["d"]
    assert sorted(doms) == ["ads.example.com", "example.com"]

    blocked = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", domain_blocked("text", ["example.com"]).alias("b")
        ).collect()
    }
    # doc 3: exact domain + subdomain hit; doc 4: notexample.com must NOT hit
    assert blocked == {1: False, 2: False, 3: True, 4: False, 5: False, 6: False}
    plan = docs.select(domain_blocked("text", ["example.com"]))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
