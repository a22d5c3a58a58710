"""URL canonicalization kernel (functions/url.py): exact-output cases for
every contract clause, via one small Spark projection (the expression is
pure codegen — there is no Python reference; DuckDB replay happens in the
url_canonicalize oracle row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.functions.url import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url", canonicalize_url("url").alias("c")
    ).collect()
    return {r["url"]: r["c"] for r in rows}


def test_contract_clauses(spark):
    cases = {
        # lowercase scheme + host
        "HTTPS://WWW.Example.COM/Path": "https://www.example.com/Path",
        # default ports drop; scheme-mismatched and non-default ports stay
        "https://h.com:443/a": "https://h.com/a",
        "http://h.com:80/a": "http://h.com/a",
        "http://h.com:443/a": "http://h.com:443/a",
        "https://h.com:8443/a": "https://h.com:8443/a",
        # trailing slash strip (root included); internal slashes untouched
        "https://h.com/a/b/": "https://h.com/a/b",
        "https://h.com/a//": "https://h.com/a",
        "https://h.com/": "https://h.com",
        "https://h.com": "https://h.com",
        # tracking strip (utm_ prefix + exact names), empties dropped,
        # remaining params sorted as k=v strings
        "https://h.com/p?utm_source=x&b=2&a=1": "https://h.com/p?a=1&b=2",
        "https://h.com/p?fbclid=z&gclid=y&ref=r&igshid=i&msclkid=m":
            "https://h.com/p",
        "https://h.com/p?z=1&&a=2": "https://h.com/p?a=2&z=1",
        # fragment dropped
        "https://h.com/p#frag": "https://h.com/p",
        "https://h.com/p?a=1#frag": "https://h.com/p?a=1",
        # everything at once
        "HTTP://H.COM:80/x/?utm_campaign=c&b=2&a=1#s": "http://h.com/x?a=1&b=2",
    }
    got = _canon(spark, list(cases))
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonicalize_url("url").alias("c")).first()["c"] is None


def test_idempotent_on_canonical_forms(spark):
    urls = [
        "https://h.com/a?b=2&id=3",
        "https://h.com:8443/a",
        "http://h.com",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, list(once.values()))
    for u in urls:
        assert twice[once[u]] == once[u]


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("https://h.com/a",)], "url string")
    plan = df.select(canonicalize_url("url")).queryExecution if False else None
    # no Python evaluation node: the expression compiles to JVM codegen
    explained = df.select(canonicalize_url("url"))._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in explained and "BatchEvalPython" not in explained
