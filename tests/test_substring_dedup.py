"""exact_substring_dedup (ExactSubstr, Lee et al. 2022): Spark pipeline vs
a transparent pure-Python reference, plus the edge cases the declarative
plan has to get right (short docs, intra-doc repeats, overlapping spans,
whole-doc erasure)."""

from __future__ import annotations

import hashlib

from etl_adsbx_spark.operators.dedup import exact_substring_dedup


def _reference(docs: dict[int, str], k: int) -> dict[int, tuple[int, int, str]]:
    """Sequential re-implementation: duplicated k-word shingles, first
    occurrence in (doc_id, pos) order canonical, non-canonical windows
    erased, survivors rejoined. Returns {doc: (n_words, n_removed, md5)}."""
    words = {d: t.split(" ") for d, t in docs.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(words):
        ws = words[d]
        for i in range(len(ws) - k + 1):
            occ.setdefault(" ".join(ws[i : i + k]), []).append((d, i + 1))
    removed: dict[int, set[int]] = {d: set() for d in words}
    for positions in occ.values():
        if len(positions) < 2:
            continue
        for d, pos in sorted(positions)[1:]:
            removed[d].update(range(pos, pos + k))
    out = {}
    for d, ws in words.items():
        kept = [w for i, w in enumerate(ws, start=1) if i not in removed[d]]
        n_removed = sum(1 for i in range(1, len(ws) + 1) if i in removed[d])
        out[d] = (
            len(ws),
            n_removed,
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def _run(spark, docs: dict[int, str], k: int) -> dict[int, tuple[int, int, str]]:
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = exact_substring_dedup(df, k=k).collect()
    assert len(rows) == len(docs), "every input doc must yield exactly one row"
    return {r["doc_id"]: (r["n_words"], r["n_removed"], r["cleaned_md5"]) for r in rows}


def test_matches_reference_on_constructed_corpus(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        1: f"one two three {shared} four five six",
        2: f"seven eight {shared} nine ten eleven twelve",  # non-canonical copy
        3: "too short",  # < k words: untouched
        4: "x1 x2 x3 x4 x5 a b c d e f g h a b c d e f g h tail",  # intra-doc repeat
        5: "unique words only here nothing repeats at all anywhere today",
    }
    assert _run(spark, docs, k=5) == _reference(docs, k=5)


def test_canonical_copy_survives_duplicate_removed(spark):
    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = {1: f"lead {span} tail", 2: f"pre {span} post"}
    got = _run(spark, docs, k=8)
    # doc 1 holds the canonical (first) occurrence: nothing removed
    assert got[1] == (10, 0, _md5(f"lead {span} tail"))
    # doc 2 loses exactly the 8 span words
    assert got[2] == (10, 8, _md5("pre post"))


def test_whole_doc_erasure_yields_empty_stable_hash(spark):
    span = "s1 s2 s3 s4 s5"
    docs = {1: span, 2: span}
    got = _run(spark, docs, k=5)
    assert got[1] == (5, 0, _md5(span))
    assert got[2] == (5, 5, _md5(""))


def test_overlapping_spans_merge(spark):
    # doc 2 repeats two OVERLAPPING shingles of doc 1; covered words are
    # counted once (gaps-and-islands cummax, not per-shingle sum)
    docs = {
        1: "a b c d e f g h i j",
        2: "z1 a b c d e f g h i j z2",
    }
    got = _run(spark, docs, k=5)
    assert got == _reference(docs, k=5)
    assert got[2] == (12, 10, _md5("z1 z2"))


def test_fixture_corpus_matches_reference(spark):
    from .conftest import SF_ORACLE

    docs_df = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    docs = {r["doc_id"]: r["text"] for r in docs_df.select("doc_id", "text").collect()}
    assert _run(spark, docs, k=8) == _reference(docs, k=8)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_bpe_token_granularity(spark):
    """The operator docstring's claim that token-granularity dedup 'drops
    in by swapping the tokenizer column': fit BPE on the corpus, join the
    token stream back to a space-separated string, and run the same
    operator at k tokens — duplicated TOKEN spans dedup exactly like word
    spans (Lee et al. run at 50 BPE tokens; k is scaled to the fixture)."""
    from etl_adsbx_spark.functions.bpe import bpe_encode, fit_bpe
    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three"),
            (2, f"four five {shared} six seven"),
            (3, "completely unrelated text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    merges = fit_bpe(docs, num_merges=30, min_freq=1)
    tokens = bpe_encode(docs, merges).select(
        "doc_id", F.concat_ws(" ", "bpe_tokens").alias("text")
    )
    k = 6
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"])
        for r in exact_substring_dedup(tokens, k=k).collect()
    }
    tok_rows = {r["doc_id"]: r["text"].split(" ") for r in tokens.collect()}
    ref = _reference({d: " ".join(t) for d, t in tok_rows.items()}, k=k)
    assert got == {d: (v[0], v[1]) for d, v in ref.items()}
    # the shared token span is longer than k, so doc 2 must lose tokens
    assert got[2][1] >= k
    assert got[1][1] == 0 and got[3][1] == 0
