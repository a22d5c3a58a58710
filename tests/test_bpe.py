"""BPE tokenizer fitting + encoding vs an independent pure-Python
reference; driver-fit vs distributed-fit equality; roundtrip and
compression properties."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_adsbx_spark.functions.bpe import (
    EOW,
    bpe_decode_tokens,
    bpe_encode,
    fit_bpe,
    word_freq,
)

CORPUS = [
    "the lower the tower the slower the mower",
    "low lower lowest slow slower slowest",
    "new newer newest few fewer fewest",
    "the newer tower is lower than the older tower",
    "widest wildest mildest",
    "a",
    "",
    "low low low lower lower lowest",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


# --- independent reference implementation (naive, recount-per-round) ---

def ref_word_freq(texts):
    c = Counter()
    for t in texts:
        c.update(t.lower().split())
    return dict(c)


def ref_fit(texts, num_merges, min_freq=2):
    wf = {w: n for w, n in ref_word_freq(texts).items()}
    vocab = {w: tuple(list(w) + [EOW]) for w in wf}
    merges = []
    for rank in range(num_merges):
        counts = Counter()
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] += wf[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_freq:
            break
        merges.append((rank, a, b, n))
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges


def ref_encode(word, merges):
    ranks = {(a, b): r for r, a, b, _ in merges}
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        ranked = [
            (ranks[p], i)
            for i, p in enumerate(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        a, b = syms[i], syms[i + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_word_freq_matches_reference(spark):
    got = {
        r["word"]: r["freq"] for r in word_freq(_docs(spark)).collect()
    }
    assert got == ref_word_freq(CORPUS)


def test_driver_fit_matches_reference(spark):
    got = [
        (r["rank"], r["a"], r["b"], r["freq"])
        for r in fit_bpe(_docs(spark), num_merges=30).orderBy("rank").collect()
    ]
    assert got == ref_fit(CORPUS, 30)
    assert len(got) > 5  # the corpus supports a nontrivial merge list


def test_distributed_fit_identical_to_driver_fit(spark):
    d = _docs(spark)
    driver = fit_bpe(d, num_merges=12, driver_fit=True).orderBy("rank").collect()
    dist = fit_bpe(d, num_merges=12, driver_fit=False).orderBy("rank").collect()
    assert [tuple(r) for r in driver] == [tuple(r) for r in dist]


def test_distributed_fit_invariant_under_repartition(spark):
    d = _docs(spark)
    a = fit_bpe(d, num_merges=10, driver_fit=False).orderBy("rank").collect()
    b = (
        fit_bpe(d.repartition(7), num_merges=10, driver_fit=False)
        .orderBy("rank")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_encode_matches_reference_and_roundtrips(spark):
    d = _docs(spark)
    merges_df = fit_bpe(d, num_merges=20)
    merges = [
        (r["rank"], r["a"], r["b"], r["freq"])
        for r in merges_df.orderBy("rank").collect()
    ]
    enc = bpe_encode(d, merges_df).withColumn(
        "decoded", bpe_decode_tokens("bpe_tokens")
    )
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert set(rows) == set(range(len(CORPUS)))
    for i, text in enumerate(CORPUS):
        expect = []
        for w in text.lower().split():
            expect.extend(ref_encode(w, merges))
        assert list(rows[i]["bpe_tokens"]) == expect, f"doc {i}"
        assert rows[i]["n_bpe_tokens"] == len(expect)
        # roundtrip: decode reconstructs the normalized text
        assert rows[i]["decoded"] == " ".join(text.lower().split())


def test_more_merges_compress_more(spark):
    d = _docs(spark)
    n_by_merges = {}
    for m in (0, 5, 25):
        enc = bpe_encode(d, fit_bpe(d, num_merges=m))
        n_by_merges[m] = enc.agg(F.sum("n_bpe_tokens")).first()[0]
    # 0 merges = chars + one EOW per word
    n_chars = sum(len(w) + 1 for t in CORPUS for w in t.lower().split())
    assert n_by_merges[0] == n_chars
    assert n_by_merges[5] < n_by_merges[0]
    assert n_by_merges[25] < n_by_merges[5]


def test_unseen_words_fall_back_to_learned_subwords(spark):
    train = _docs(spark)
    merges = fit_bpe(train, num_merges=25)
    novel = _docs(spark, ["lowish slowness zzz"])
    row = bpe_encode(novel, merges).first()
    toks = list(row["bpe_tokens"])
    # every token is a learned symbol or a raw char/EOW; decode restores text
    assert "".join(toks).replace(EOW, " ").strip() == "lowish slowness zzz"
    # "zzz" has no trained merges -> encodes as chars + EOW
    assert toks[-4:] == ["z", "z", "z", EOW]


def test_incremental_fit_loop_matches_naive_reference_property():
    """_fit_merges_local maintains pair counts incrementally (only
    rewritten words update the counter); the test reference recounts from
    scratch each round. Hypothesis drives random corpora at the two
    implementations — no Spark in the loop, so examples are cheap."""
    from hypothesis import given, settings, strategies as st

    from etl_adsbx_spark.functions.bpe import _fit_merges_local

    word = st.text(alphabet="abcz", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=10,
    )

    @settings(max_examples=150, deadline=None)
    @given(corpus, st.integers(min_value=1, max_value=12))
    def check(texts, n_merges):
        wf = sorted(ref_word_freq(texts).items())
        got = _fit_merges_local(wf, n_merges, min_freq=2)
        assert got == ref_fit(texts, n_merges)

    check()


def test_unicode_corpus_fit_and_roundtrip(spark):
    """Non-ASCII chars (accents, CJK, an astral-plane emoji) survive the
    char split (Spark's empty-pattern split keeps surrogate pairs whole,
    matching Python's list(word)), the fit tie-break (UTF-8 binary order
    == code-point order == Python str order), and decode."""
    texts = [
        "café café naïve",
        "日本語 の 文書 日本語",
        "a😀b a😀b c😀",
        "café 日本語",
    ]
    d = _docs(spark, texts)
    assert [
        (r["rank"], r["a"], r["b"], r["freq"])
        for r in fit_bpe(d, num_merges=15).orderBy("rank").collect()
    ] == ref_fit(texts, 15)
    dist = fit_bpe(d, num_merges=8, driver_fit=False).orderBy("rank").collect()
    drv = fit_bpe(d, num_merges=8, driver_fit=True).orderBy("rank").collect()
    assert [tuple(r) for r in dist] == [tuple(r) for r in drv]
    enc = bpe_encode(d, fit_bpe(d, num_merges=15)).withColumn(
        "decoded", bpe_decode_tokens("bpe_tokens")
    )
    for r in enc.collect():
        assert r["decoded"] == " ".join(texts[r["doc_id"]].lower().split())


# --- pretrained GPT-2-format artifact path (round-7) ---


def _ref_openai_bpe(token, ranks, byte_enc):
    """Independent reference: the classic published encoder loop —
    get_pairs + min-rank bigram + occurrence merge, structured differently
    from the implementation under test (tuple word, pair-set recompute)."""
    word = tuple(byte_enc[b] for b in token.encode("utf-8"))
    if len(word) < 2:
        return list(word)
    while True:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        bigram = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if bigram not in ranks:
            break
        a, b = bigram
        new = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(word[i])
                i += 1
        word = tuple(new)
        if len(word) == 1:
            break
    return list(word)


def test_gpt2_pretokenizer_cases_and_losslessness():
    from etl_adsbx_spark.functions.bpe import gpt2_pretokenize

    cases = {
        "Hello world": ["Hello", " world"],
        "it's fine": ["it", "'s", " fine"],
        "don't": ["don", "'t"],
        "a  b": ["a", " ", " b"],
        "tab\tx": ["tab", "\t", "x"],
        "123abc": ["123", "abc"],
        "x!!!": ["x", "!!!"],
        "café costs €5": ["café", " costs", " €", "5"],
        "x  ": ["x", "  "],
        "we'll we've I'm you're": ["we", "'ll", " we", "'ve", " I", "'m", " you", "'re"],
        "!!!'s": ["!!!'", "s"],
        "line\nnext": ["line", "\n", "next"],
    }
    for text, want in cases.items():
        got = gpt2_pretokenize(text)
        assert got == want, (text, got, want)
        assert "".join(got) == text
    # losslessness on a messy mixed string
    messy = "  Ab3!?\t\t xßé中  9a'  's\n\n end  "
    assert "".join(gpt2_pretokenize(messy)) == messy


def _fixture_artifacts(tmpdir):
    """Write a small public-format merges.txt + vocab.json covering the
    space-prefix (Ġ-style), mid-word, and unicode merge shapes."""
    import json
    import os

    from etl_adsbx_spark.functions.bpe import gpt2_bytes_to_unicode

    be = gpt2_bytes_to_unicode()
    sp = be[0x20]  # the mapped space char
    merges = [
        ("t", "h"), ("th", "e"), (sp, "the"), ("l", "l"), ("e", "ll"),
        ("h", "ell"), ("hell", "o"), (sp, "hello"), ("1", "2"), ("12", "3"),
        ("'", "s"), (sp, "w"), ("o", "r"), ("or", "l"), ("orl", "d"),
        (sp + "w", "orld"),
    ]
    mp = os.path.join(tmpdir, "merges.txt")
    with open(mp, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    # vocab: every single mapped byte char + every merged token
    toks = set(be.values())
    for a, b in merges:
        toks.add(a + b)
    vocab = {t: i for i, t in enumerate(sorted(toks))}
    vp = os.path.join(tmpdir, "vocab.json")
    with open(vp, "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    return mp, vp, vocab


def test_pretrained_encode_matches_reference_and_feeds_packing(spark, tmp_path):
    from etl_adsbx_spark.functions.bpe import (
        bpe_encode_pretrained,
        gpt2_bytes_to_unicode,
        gpt2_pretokenize,
        load_gpt2_merges,
    )
    from etl_adsbx_spark.operators.agg import global_running_sum

    mp, vp, vocab = _fixture_artifacts(str(tmp_path))
    ranks = load_gpt2_merges(mp)
    be = gpt2_bytes_to_unicode()
    texts = [
        "the hello world",
        "The theory of hello's world",
        "123 hello the中the",
        "",
        "  spaces   and\ttabs ",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"], r["token_ids"])
        for r in bpe_encode_pretrained(docs, mp, vp).collect()
    }
    for i, text in enumerate(texts):
        want = []
        for pt in gpt2_pretokenize(text):
            want.extend(_ref_openai_bpe(pt, ranks, be))
        toks, n, ids = out[i]
        assert toks == want, (text, toks, want)
        assert n == len(want)
        assert ids == [vocab[t] for t in want]  # fixture vocab is total
    # unknown tokens surface as -1, not silently dropped
    import json
    import os

    small_vp = os.path.join(str(tmp_path), "small_vocab.json")
    with open(small_vp, "w") as f:
        json.dump({"the": 7}, f)
    ids0 = (
        bpe_encode_pretrained(docs, mp, small_vp)
        .where(F.col("doc_id") == 0)
        .first()["token_ids"]
    )
    assert -1 in ids0 and 7 in ids0
    # the real-token counts feed the packing prefix sum unchanged
    counts = bpe_encode_pretrained(docs, mp).select(
        "doc_id", F.col("n_bpe_tokens").cast("bigint").alias("n_tokens")
    )
    cum = global_running_sum(counts, ["doc_id"], "n_tokens", out_col="_cum")
    rows = {r["doc_id"]: r["_cum"] for r in cum.collect()}
    expect, acc = {}, 0
    for i in range(len(texts)):
        acc += out[i][1]
        expect[i] = acc  # inclusive running sum
    assert rows == expect


def test_gpt2_merges_keeps_hash_merge_lines(tmp_path):
    """The real GPT-2 merges.txt contains merge lines that START with '#'
    ("# #", "## #", ... build the '##'/'###' vocab tokens). Only a leading
    '#version' header may be skipped — dropping '#'-led merges silently
    mis-tokenizes markdown headings / hashtags / C-preprocessor text."""
    import os

    from etl_adsbx_spark.functions.bpe import (
        gpt2_bytes_to_unicode,
        load_gpt2_merges,
        _gpt2_encode_pretoken,
    )

    mp = os.path.join(str(tmp_path), "merges.txt")
    with open(mp, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("# #\n")        # -> '##'
        f.write("## #\n")       # -> '###'
        f.write("## ##\n")      # -> '####'
        f.write("t h\n")
    ranks = load_gpt2_merges(mp)
    assert ranks == {
        ("#", "#"): 0, ("##", "#"): 1, ("##", "##"): 2, ("t", "h"): 3,
    }
    be = gpt2_bytes_to_unicode()
    # '####' merges pairwise: (# #)(# #) -> (## ##) -> '####'
    assert _gpt2_encode_pretoken("####", ranks, be) == ["####"]
    assert _gpt2_encode_pretoken("###", ranks, be) == ["###"]
    # a '#version'-less file (some dumps omit the header) still loads: the
    # first line is only skipped when it IS a version header
    mp2 = os.path.join(str(tmp_path), "merges2.txt")
    with open(mp2, "w", encoding="utf-8") as f:
        f.write("# #\n")
        f.write("t h\n")
    assert load_gpt2_merges(mp2) == {("#", "#"): 0, ("t", "h"): 1}
