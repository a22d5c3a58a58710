"""Property-based tests (hypothesis) for the text/dedup operator kernels —
SURVEY.md §5 layer 3: invariants that hold for arbitrary inputs, checked
through the same Spark expressions the queries use.

One Spark job evaluates the whole hypothesis batch: examples are collected
into a single DataFrame per property (per-example Spark jobs would be
minutes-slow), keeping the property run inside the test-suite budget.
"""

from __future__ import annotations

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings
from pyspark.sql import functions as F

from etl_adsbx_spark.functions import text as T
from etl_adsbx_spark.operators.dedup import (
    minhash_signature,
    normalized_text,
    token_hash32,
    word_shingles,
)

words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=12
)


def _texts_df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")


@settings(max_examples=30, deadline=None)
@given(st.lists(words, min_size=1, max_size=8))
def test_shingle_count_and_token_count(spark, batches):
    texts = [" ".join(ws) for ws in batches]
    rows = (
        _texts_df(spark, texts)
        .select(
            "i",
            F.size(word_shingles("text", 3)).alias("n_sh"),
            T.token_count("text").alias("n_tok"),
        )
        .collect()
    )
    for r in rows:
        ws = batches[r["i"]]
        # split('\s+') on empty/whitespace strings yields one '' token
        n_tok_expected = max(len(ws), 1)
        assert r["n_tok"] == n_tok_expected
        assert r["n_sh"] == max(0, n_tok_expected - 2)


@settings(max_examples=20, deadline=None)
@given(st.lists(words, min_size=1, max_size=6))
def test_minhash_identical_texts_identical_sigs(spark, batches):
    # each text twice, whitespace-mangled the second time: normalization +
    # signature must agree pairwise
    texts = [" ".join(ws) for ws in batches]
    mangled = ["  " + t.replace(" ", "   ") + " " for t in texts]
    df = _texts_df(spark, texts + mangled)
    sig = df.select(
        "i",
        F.md5(normalized_text("text")).alias("norm_md5"),
        minhash_signature(
            F.transform(word_shingles(normalized_text("text"), 3), token_hash32), 8
        ).alias("sig"),
    ).collect()
    by_i = {r["i"]: r for r in sig}
    n = len(texts)
    for i in range(n):
        assert by_i[i]["norm_md5"] == by_i[n + i]["norm_md5"]
        assert by_i[i]["sig"] == by_i[n + i]["sig"]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abc XYZ.,!?09", min_size=0, max_size=40), min_size=1, max_size=10))
def test_quality_score_bounded(spark, texts):
    rows = (
        _texts_df(spark, texts)
        .select(T.quality_score("text").alias("q"), T.lang_id("text").alias("lang"))
        .collect()
    )
    for r in rows:
        assert r["q"] is None or 0.0 <= r["q"] <= 1.0
        assert r["lang"] in ("en", "unknown")


@pytest.mark.parametrize("algorithm", ["propagation", "star"])
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 15), st.integers(0, 15)),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_connected_components_matches_union_find(spark, algorithm, graphs):
    """Random multi-graphs (self-loops, duplicates, arbitrary direction)
    vs a pure-Python union-find: every node's cluster_id must equal the
    min node id of its component, for BOTH the propagation and the
    large-star/small-star variants. Graphs are namespaced into one Spark
    run (no cross-graph edges), so one iterative CC evaluates all of
    them."""
    from etl_adsbx_spark.operators.dedup import connected_components

    edges = [
        (g * 100 + a, g * 100 + b)
        for g, pairs in enumerate(graphs)
        for a, b in pairs
    ]
    node_ids = sorted({n for e in edges for n in e} | {g * 100 for g in range(len(graphs))})

    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    roots: dict[int, int] = {}
    for n in node_ids:
        r = find(n)
        roots.setdefault(r, n)  # node_ids sorted -> first seen is min
        expected[n] = roots[r]

    pairs_df = spark.createDataFrame(edges or [], "a_id long, b_id long")
    nodes_df = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, nodes_df, id_col="doc_id", algorithm=algorithm
        ).collect()
    }
    assert got == expected


def test_star_cc_long_chain_beats_diameter(spark):
    """The adversarial case the star algorithm exists for: a 200-node
    chain has diameter 199, so min-label propagation would need ~199
    rounds — large-star/small-star must collapse it within max_iter=20
    (O(log n) rounds). Mixed with a ring and singletons to keep the
    component bookkeeping honest."""
    from etl_adsbx_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(199)]  # nodes 0..199, min 0
    ring = [(1000 + i, 1000 + (i + 1) % 50) for i in range(50)]  # min 1000
    singletons = [5000, 5001]
    edges = chain + ring
    nodes = sorted({n for e in edges for n in e} | set(singletons))
    pairs_df = spark.createDataFrame(edges, "a_id long, b_id long")
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, nodes_df, id_col="doc_id", algorithm="star", max_iter=20
        ).collect()
    }
    expected = {n: 0 for n in range(200)}
    expected.update({1000 + i: 1000 for i in range(50)})
    expected.update({s: s for s in singletons})
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 7), st.integers(0, 7)), max_size=12),
    st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=12),
)
def test_cc_incremental_matches_full_recompute(spark, e1, e2):
    """Label maintenance across ticks: bootstrap CC over tick-1's graph
    (nodes 0-7), then fold tick-2's pairs (which may touch new nodes 8-15
    and bridge old components) via cc_incremental — the result must equal
    a from-scratch CC over the union graph, for every random topology."""
    from etl_adsbx_spark.operators.dedup import cc_incremental, connected_components

    nodes1 = list(range(8))
    nodes_all = list(range(16))
    pairs1 = spark.createDataFrame(e1 or [], "a_id long, b_id long")
    pairs2 = spark.createDataFrame(e2 or [], "a_id long, b_id long")
    labels1 = connected_components(
        pairs1, spark.createDataFrame([(n,) for n in nodes1], "doc_id long")
    )
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_incremental(
            labels1,
            pairs2,
            spark.createDataFrame([(n,) for n in range(8, 16)], "doc_id long"),
        ).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs1.unionByName(pairs2),
            spark.createDataFrame([(n,) for n in nodes_all], "doc_id long"),
        ).collect()
    }
    assert inc == full


def test_cc_nonconvergence_raises_instead_of_wrong_labels(spark):
    """The silent-wrong-labels mode is refused: a 200-node chain
    (diameter 199) cannot converge in 5 propagation rounds, and the engine
    must raise rather than return partial labels. The star variant with a
    1-round budget must also raise (its fixpoint check needs a confirming
    round). Empty graphs are trivially converged even at max_iter=1."""
    import pytest as _pytest

    from etl_adsbx_spark.operators.dedup import (
        CCNonConvergenceError,
        connected_components,
    )

    chain = [(i, i + 1) for i in range(199)]
    pairs_df = spark.createDataFrame(chain, "a_id long, b_id long")
    nodes_df = spark.createDataFrame([(n,) for n in range(200)], "doc_id long")
    with _pytest.raises(CCNonConvergenceError):
        connected_components(pairs_df, nodes_df, id_col="doc_id", max_iter=5)
    with _pytest.raises(CCNonConvergenceError):
        connected_components(
            pairs_df, nodes_df, id_col="doc_id", algorithm="star", max_iter=1
        )
    # a graph with no edges is converged by definition, even with no
    # confirming-round budget — every node comes back a singleton
    empty_pairs = spark.createDataFrame([], "a_id long, b_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            empty_pairs, nodes_df, id_col="doc_id", max_iter=1
        ).collect()
    }
    assert got == {n: n for n in range(200)}


incdoc = st.tuples(
    st.integers(min_value=0, max_value=30),
    st.lists(st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=4),
)


@settings(max_examples=15, deadline=None)
@given(st.lists(incdoc, min_size=0, max_size=6), st.lists(incdoc, min_size=0, max_size=6))
def test_incremental_exact_dedup_matches_reference(spark, raw_corpus, raw_batch):
    """Differential: incremental_exact_dedup vs a pure-Python model.
    Expected admissions = lowest batch id per normalized text not present
    (normalized) in the corpus. Ids are de-duplicated across/within sides
    so 'lowest id' is well-defined."""
    import hashlib
    import re

    from etl_adsbx_spark.operators.dedup import incremental_exact_dedup

    seen_ids = set()

    def dedup_ids(raw, offset):
        out = []
        for i, ws in raw:
            i = i + offset
            if i not in seen_ids:
                seen_ids.add(i)
                out.append((i, " ".join(ws)))
        return out

    corpus = dedup_ids(raw_corpus, 0)
    batch = dedup_ids(raw_batch, 100)

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    corpus_shas = {hashlib.sha256(norm(t).encode()).hexdigest() for _, t in corpus}
    expected = {}
    for i, t in sorted(batch):
        h = hashlib.sha256(norm(t).encode()).hexdigest()
        if h not in corpus_shas and h not in expected:
            expected[h] = i

    cdf = spark.createDataFrame(corpus or [(None, None)], "doc_id long, text string").filter(
        F.col("doc_id").isNotNull()
    )
    bdf = spark.createDataFrame(batch or [(None, None)], "doc_id long, text string").filter(
        F.col("doc_id").isNotNull()
    )
    got = {r.doc_id for r in incremental_exact_dedup(bdf, cdf).collect()}
    assert got == set(expected.values())


PII_FIXTURES = [
    # (text, n_email, n_ip, n_phone, dup_tok_frac, dup_line_frac)
    ("contact alice@example.com or bob.smith@corp.co.uk today", 2, 0, 0, 0.0, 0.0),
    ("server at 192.168.1.1 and 10.0.0.255 rebooted", 0, 2, 0, 0.0, 0.0),
    ("call +1 (555) 123-4567 now", 0, 0, 1, 0.0, 0.0),
    ("hello world\nhello world\nbye", 0, 0, 0, 2.0 / 5.0, 1.0 / 3.0),
    ("a a b", 0, 0, 0, 1.0 / 3.0, 0.0),
    ("plain text with no pii at all", 0, 0, 0, 0.0, 0.0),
    ("x@y.io on 8.8.8.8 dial 555-123-9876", 1, 1, 1, 0.0, 0.0),
]


def test_pii_and_repetition_semantics(spark):
    """Crafted fixtures pin the PII-count, redaction, and within-doc
    repetition semantics that the synthetic corpus (no digits, no
    newlines) cannot exercise through the driver oracle."""
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(PII_FIXTURES)], "i long, text string"
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            T.pii_counts("text").alias("pii"),
            T.dup_token_frac("text").alias("dtf"),
            T.dup_line_frac("text").alias("dlf"),
            T.redact_pii("text").alias("red"),
        ).collect()
    }
    for i, (text, n_email, n_ip, n_phone, dtf, dlf) in enumerate(PII_FIXTURES):
        r = rows[i]
        assert r["pii"]["n_email"] == n_email, text
        assert r["pii"]["n_ip"] == n_ip, text
        assert r["pii"]["n_phone"] == n_phone, text
        assert abs(r["dtf"] - round(dtf, 6)) < 1e-9, text
        assert abs(r["dlf"] - round(dlf, 6)) < 1e-9, text
        # redaction removes every matched span; placeholders contain no
        # digits or '@', so a redacted doc re-scans clean
        assert ("[EMAIL]" in r["red"]) == (n_email > 0), r["red"]
        assert ("[IP]" in r["red"]) == (n_ip > 0), r["red"]
        assert ("[PHONE]" in r["red"]) == (n_phone > 0), r["red"]
    rescan = (
        df.select(T.pii_counts(T.redact_pii("text")).alias("pii"))
        .selectExpr("sum(pii.n_email + pii.n_ip + pii.n_phone) s")
        .first()["s"]
    )
    assert rescan == 0


def test_pii_spark_duckdb_parity(spark):
    """The PII/repetition expressions are part of the text_stats oracle
    contract; the driver corpus contains no PII, so parity on PII-bearing
    text is pinned here: Spark (Java regex) and DuckDB (RE2) must produce
    byte-identical redactions and identical counts."""
    import duckdb

    texts = [t for t, *_ in PII_FIXTURES]
    got = (
        spark.createDataFrame([(t,) for t in texts], "text string")
        .select(
            "text",
            T.pii_counts("text").alias("pii"),
            T.redact_pii("text").alias("red"),
        )
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        ip_re = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
        phone_re = r"\+?[0-9][0-9() \-]{6,}[0-9]"
        dd = con.execute(
            """
            SELECT len(regexp_extract_all($t, $e)) n_email,
                   len(regexp_extract_all($t, $i)) n_ip,
                   len(regexp_extract_all($t, $p)) n_phone,
                   regexp_replace(regexp_replace(regexp_replace($t,
                     $e, '[EMAIL]', 'g'), $i, '[IP]', 'g'), $p, '[PHONE]', 'g') red
            """,
            {"t": r["text"], "e": email_re, "i": ip_re, "p": phone_re},
        ).fetchone()
        assert dd[0] == r["pii"]["n_email"], r["text"]
        assert dd[1] == r["pii"]["n_ip"], r["text"]
        assert dd[2] == r["pii"]["n_phone"], r["text"]
        assert dd[3] == r["red"], r["text"]


def test_unigram_lm_fit_and_score(spark):
    """Common-token documents outscore rare/gibberish ones; OOV floor is
    applied; empty text takes the OOV score; scoring is deterministic and
    its plan is join-free after the two 1-row broadcasts."""
    from etl_adsbx_spark.functions.text import fit_unigram_lm, score_unigram_lm
    from etl_adsbx_spark.tables import load_table

    corpus = load_table(spark, "/root/testdata/sf0.001", "documents")
    lm = fit_unigram_lm(corpus, vocab_size=2000).localCheckpoint()
    assert lm.where(F.col("token").isNull()).count() == 1
    # take the corpus's two most frequent tokens vs pure gibberish
    common = [
        r.token
        for r in lm.where(F.col("token").isNotNull())
        .orderBy(F.col("logprob").desc())
        .limit(2)
        .collect()
    ]
    docs = spark.createDataFrame(
        [
            (1, f"{common[0]} {common[1]} {common[0]}"),
            (2, "zqxjkv wmbfgh pltrnd qqqqq"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lm_score for r in score_unigram_lm(docs, lm).collect()}
    oov = lm.where(F.col("token").isNull()).collect()[0].logprob
    assert out[1] > out[2], out
    assert abs(out[2] - oov) < 1e-9  # all-OOV doc scores exactly the floor
    assert abs(out[3] - oov) < 1e-9  # empty doc takes the floor
    # determinism
    again = {r.doc_id: r.lm_score for r in score_unigram_lm(docs, lm).collect()}
    assert out == again


def test_bigram_kn_matches_python_reference(spark):
    """KN bigram scoring ≡ a pure-Python reference on a tiny corpus,
    including the backoff paths the registry row cannot exercise (fit
    corpus == score corpus there): a held-out doc with an unseen bigram
    over seen words, and one with an unseen CONTEXT word."""
    import math

    from etl_adsbx_spark.functions.text import fit_bigram_kn, score_bigram_kn

    fit_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog"),
    ]
    fit_df = spark.createDataFrame(fit_rows, "doc_id bigint, text string")
    score_rows = fit_rows + [
        (4, "the mat sat"),          # unseen bigrams over seen words
        (5, "zebra the cat"),        # unseen context word
        (6, "hello"),                # < 2 tokens -> NULL score
    ]
    score_df = spark.createDataFrame(score_rows, "doc_id bigint, text string")
    big, ctx, cont, tt = fit_bigram_kn(fit_df)
    got = {
        r["doc_id"]: (r["lm2_score"], r["n_bigrams"])
        for r in score_bigram_kn(score_df, big, ctx, cont, tt).collect()
    }

    # pure-Python reference
    d = 0.75
    bigs: dict[tuple[str, str], int] = {}
    for _, t in fit_rows:
        ws = t.lower().split()
        for a, b in zip(ws, ws[1:]):
            bigs[(a, b)] = bigs.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    nf: dict[str, int] = {}
    np_: dict[str, int] = {}
    for (a, b), c in bigs.items():
        c1[a] = c1.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        np_[b] = np_.get(b, 0) + 1
    T, vc = len(bigs), len(np_)

    def p(a: str, b: str) -> float:
        pc = (np_.get(b, 0) + 1) / (T + vc + 1.0)
        if a not in c1:
            return pc
        disc = (bigs[(a, b)] - d) / c1[a] if (a, b) in bigs else 0.0
        return disc + (d * nf[a] / c1[a]) * pc

    for did, t in score_rows:
        ws = t.lower().split()
        prs = [p(a, b) for a, b in zip(ws, ws[1:])]
        if not prs:
            assert got[did] == (None, 0), did
        else:
            want = round(sum(math.log(x) for x in prs) / len(prs), 6)
            assert got[did][1] == len(prs), did
            assert abs(got[did][0] - want) < 1e-9, (did, got[did][0], want)
    # all fit-corpus probability mass stays in (0, 1]
    for a, b in bigs:
        assert 0.0 < p(a, b) <= 1.0


def test_unigram_lm_join_method_matches_map(spark):
    """The large-V join path of score_unigram_lm ≡ the map-side default
    (to fp accumulation order), including OOV tokens and an empty doc."""
    from etl_adsbx_spark.functions.text import fit_unigram_lm, score_unigram_lm

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, ""),                       # tokenizes to [""] -> OOV
        (4, "zebra quagga okapi"),     # heavy OOV vs the fitted vocab
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    lm = fit_unigram_lm(df.where(F.col("doc_id") <= 2), vocab_size=100)
    a = {r["doc_id"]: r["lm_score"]
         for r in score_unigram_lm(df, lm, method="map").collect()}
    b = {r["doc_id"]: r["lm_score"]
         for r in score_unigram_lm(df, lm, method="join").collect()}
    assert set(a) == set(b) == {1, 2, 3, 4}
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])


def test_score_unigram_lm_validates_oov_row(spark):
    """Both scoring paths crossJoin the lm's single NULL-token OOV row; a
    missing row must raise (not silently return 0 rows) and a duplicated
    row must raise (not duplicate every doc) — round-6 advice on the join
    path's unvalidated assumption."""
    import pytest

    from etl_adsbx_spark.functions.text import fit_unigram_lm, score_unigram_lm

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spam ham")], ["doc_id", "text"]
    )
    lm = fit_unigram_lm(docs, vocab_size=10).localCheckpoint()
    no_oov = lm.where(F.col("token").isNotNull())
    dup_oov = lm.unionByName(lm.where(F.col("token").isNull()))
    for method in ("map", "join"):
        ok = score_unigram_lm(docs, lm, method=method).collect()
        assert len(ok) == 2
        for bad in (no_oov, dup_oov):
            with pytest.raises(Exception, match="exactly one"):
                score_unigram_lm(docs, bad, method=method).collect()


def test_cluster_keep_best_policy(spark):
    """Quality-aware canonical selection: per cluster the HIGHEST-score
    member is kept (ties → lowest id), independent of the min-id cluster
    label; singletons keep themselves."""
    from etl_adsbx_spark.operators.dedup import cluster_keep_best

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "doc_id bigint, cluster_id bigint",
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0), (9, 2.0), (10, 2.0)],
        "doc_id bigint, score double",
    )
    out = {
        r["doc_id"]: (r["kept_doc_id"], r["is_kept"])
        for r in cluster_keep_best(clusters, scores).collect()
    }
    assert out == {
        1: (2, 0), 2: (2, 1), 3: (2, 0),   # best score wins; tie -> lowest id
        7: (7, 1),                         # singleton keeps itself
        9: (9, 1), 10: (9, 0),             # tie at 2.0 -> lowest id
    }


def test_cluster_keep_best_members_missing_scores_survive(spark):
    """Cluster members with NO score row still appear in the output
    (left join, not inner), never win the argmax against a scored
    member, and an all-unscored cluster falls back to lowest-id keep —
    regression for the inner join that silently dropped them."""
    from etl_adsbx_spark.operators.dedup import cluster_keep_best

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)],
        "doc_id bigint, cluster_id bigint",
    )
    # doc 3 unscored (even though its cluster-mates score low);
    # cluster 8 entirely unscored
    scores = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "doc_id bigint, score double"
    )
    out = {
        r["doc_id"]: (r["kept_doc_id"], r["is_kept"])
        for r in cluster_keep_best(clusters, scores).collect()
    }
    assert out == {
        1: (2, 0), 2: (2, 1),
        3: (2, 0),            # unscored member present, loses to any scored
        8: (8, 1), 9: (8, 0),  # all-unscored cluster -> lowest id kept
    }


def test_dedup_lines_global_first_occurrence_semantics(spark):
    """Corpus-wide line dedup: a repeated line survives only at its first
    (doc_id, position); blank lines are structural and never deduped;
    within-doc repeats also collapse to the first; empty docs reassemble
    to ''. Contrast with strip_boilerplate_lines, which removes frequent
    lines from EVERY document including the first."""
    from etl_adsbx_spark.operators.dedup import dedup_lines_global

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared\n\nalpha"),      # within-doc repeat of alpha
            (2, "shared\nbeta"),                 # shared seen at doc1 pos2
            (3, "Shared  \ngamma"),              # normalized variant -> dup
            (4, "shared"),                       # reduced to nothing
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines_global(docs).collect()
    }
    assert out == {
        1: ("alpha\nshared\n", 1),   # 2nd alpha removed; blank kept
        2: ("beta", 1),
        3: ("gamma", 1),
        4: ("", 1),
    }
    # NULL text is treated as empty, not dropped from the output
    with_null = docs.unionByName(
        spark.createDataFrame([(5, None)], "doc_id bigint, text string")
    )
    out5 = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines_global(with_null).collect()
    }
    assert out5[5] == ("", 0)
    assert {k: out5[k] for k in out} == out


def test_tfidf_cosine_pairs_matches_numpy_brute_force(spark):
    """Sparse tf-idf cosine join ≡ dense numpy computation on a crafted
    corpus, including the df-cap rule (terms in > max_df_frac·N docs are
    excluded from the vector space on BOTH sides of the comparison)."""
    import math

    import numpy as np

    from etl_adsbx_spark.operators.dedup import tfidf_cosine_pairs

    texts = {
        1: "rare alpha beta common common",
        2: "rare alpha beta common",
        3: "alpha gamma delta common",
        4: "epsilon zeta eta common",
        5: "rare rare alpha common common common",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    max_df_frac, thr = 0.7, 0.1
    got = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            docs, threshold=thr, max_df_frac=max_df_frac
        ).collect()
    }
    # numpy reference
    n = len(texts)
    tf = {d: {} for d in texts}
    for d, t in texts.items():
        for w in t.lower().split():
            tf[d][w] = tf[d].get(w, 0) + 1
    df_count = {}
    for d in texts:
        for w in tf[d]:
            df_count[w] = df_count.get(w, 0) + 1
    vocab = sorted(w for w, c in df_count.items() if c <= max_df_frac * n)
    assert "common" not in vocab  # df 5/5 > 0.7 -> capped out
    vecs = {}
    for d in texts:
        v = np.array(
            [
                round((1 + math.log(tf[d][w])) * math.log(n / df_count[w]), 6)
                if w in tf[d]
                else 0.0
                for w in vocab
            ]
        )
        vecs[d] = v
    want = {}
    for a in texts:
        for b in texts:
            if a < b and np.linalg.norm(vecs[a]) > 0 and np.linalg.norm(vecs[b]) > 0:
                c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
                if round(c, 6) >= thr:
                    want[(a, b)] = round(c, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_tfidf_simhash_rep_pairs_complete_vs_exact(spark):
    """The graded composition (rep collapse → weighted-SimHash screen →
    verify) against the exact all-pairs form: identical-vector pairs
    (hamming 0 — completeness is a theorem) are recovered EXACTLY as one
    intra row, never expanded; every emitted rep pair matches the exact
    result; mid-similarity pairs (cosine ~0.7 → expected hamming ≈ 8 of
    32) are legitimately outside the hamming ≤ 3 screen — the documented
    simhash recall behavior, like every LSH graded row."""
    from etl_adsbx_spark.operators.dedup import (
        tfidf_cosine_pairs,
        tfidf_simhash_rep_pairs,
    )

    base = "quasar nebula pulsar quark meteor comet"
    docs = spark.createDataFrame(
        [
            (1, base + " the and of"),      # identical capped vectors (common
            (2, base + " a an is"),         # words differ but are df-capped out
            (3, base + " to in on"),
            (4, base + " blazar the and"),  # near: one extra rare term
            (5, "unrelated words entirely different content here"),
            (6, "the and of a an is to in on"),  # empty capped vector
            # filler: push the common words over the df cap while the base
            # terms (df=4 of 10) stay under it
            (7, "the and of a an is to in on filler seven text"),
            (8, "the and of a an is to in on filler eight text"),
            (9, "the and of a an is to in on filler nine text"),
            (10, "the a to and an in of is on"),
        ],
        "doc_id bigint, text string",
    )
    thr, frac = 0.5, 0.45
    exact = tfidf_cosine_pairs(docs, threshold=thr, max_df_frac=frac)
    want = {(r["a_id"], r["b_id"]): r["cosine"] for r in exact.collect()}
    rep_rows = tfidf_simhash_rep_pairs(
        docs, threshold=thr, max_df_frac=frac
    ).collect()
    # identical group {1,2,3} -> one intra row with 3 member pairs
    intra = [r for r in rep_rows if r["a_id"] == r["b_id"]]
    assert len(intra) == 1 and intra[0]["a_id"] == 1
    assert intra[0]["n_members"] == 3 and intra[0]["cosine"] == 1.0
    # subset-correctness: every emitted rep pair is a real exact pair
    for r in rep_rows:
        if r["a_id"] != r["b_id"]:
            assert (r["a_id"], r["b_id"]) in want
            assert abs(r["cosine"] - want[(r["a_id"], r["b_id"])]) < 1e-6
    # completeness for the identical-vector regime (cosine 1.0): the
    # intra row's member count equals the exact pair count at 1.0
    exact_ones = sum(1 for c in want.values() if c == 1.0)
    assert intra[0]["n_members"] == exact_ones == 3
    # the 0.698 pair exists in exact and is screened out here (expected
    # hamming ~8 > 3) — the fixture exercises both regimes
    assert any(c < 0.95 for c in want.values())


def test_char_ngrams_short_text_guard(spark):
    """Spark's sequence(1, 0) yields [1, 0] (auto-steps down) — the
    short-text branch must be guarded to return [], not garbage grams."""
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab"), (4, "AbC"), (5, None)],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", T.char_ngrams("text").alias("g")).collect()
    }
    # NULL text falls to the otherwise-branch: [] (NULL-as-empty, the
    # dedup_lines_global convention), not NULL
    assert out == {1: [], 2: [], 3: ["ab"], 4: ["ab", "bc"], 5: []}


_LANG_SENTS = {
    "en": ["the quick brown fox jumps over the lazy dog and runs away",
           "it is a truth universally acknowledged that things happen",
           "we hold these truths to be self evident in every way"],
    "fr": ["le renard brun saute par dessus le chien paresseux très vite",
           "c'est une vérité universellement reconnue que les choses arrivent",
           "nous tenons ces vérités pour évidentes à chaque façon"],
    "es": ["el zorro marrón salta sobre el perro perezoso y corre lejos",
           "es una verdad universalmente reconocida que las cosas pasan",
           "sostenemos que estas verdades son evidentes en cada manera"],
    "de": ["der schnelle braune fuchs springt über den faulen hund weg",
           "es ist eine allgemein anerkannte wahrheit dass dinge geschehen",
           "wir halten diese wahrheiten für selbstverständlich überall"],
    "zh": ["敏捷的棕色狐狸跳过了懒惰的狗然后跑开了去远方",
           "这是一个普遍公认的真理事情总是会发生的呀",
           "我们认为这些真理是不言而喻的在任何地方都是"],
}


def test_fit_lang_id_held_out_accuracy(spark):
    """Char-bigram Naive Bayes on real multilingual sentences: fit on
    two sentences per language, predict the HELD-OUT third — must get
    every language right (the floor is 5/5; bigram NB on clean
    single-language text is an easy problem, which is the point: the
    test guards the plumbing, priors, smoothing, and argmax, not model
    research). Also: zero-gram docs fall back to the max-prior language
    and still appear in the output."""
    from etl_adsbx_spark.functions.text import fit_lang_id, score_lang_id

    rows, held = [], []
    i = 0
    for lang, sents in _LANG_SENTS.items():
        for s in sents[:2]:
            rows.append((i, s, lang)); i += 1
        held.append((i, sents[2], lang)); i += 1
    train = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    test = spark.createDataFrame(
        held + [(99, "", "en")], "doc_id bigint, text string, lang string"
    )
    gram_lp, lang_stats = fit_lang_id(train, vocab_size=512)
    st = {r["lang"]: (float(r["prior"]), r["n_docs"]) for r in lang_stats.collect()}
    assert set(st) == set(_LANG_SENTS) and all(v[1] == 2 for v in st.values())
    # equal class sizes -> equal priors
    assert len({v[0] for v in st.values()}) == 1
    # model grid is COMPLETE: every (lang, vocab-gram) pair has a row
    n_vocab = gram_lp.select("gram").distinct().count()
    assert gram_lp.count() == n_vocab * 5
    out = {
        r["doc_id"]: (r["lang"], r["lang_pred"])
        for r in score_lang_id(test, gram_lp, lang_stats).collect()
    }
    for doc_id, _, lang in held:
        assert out[doc_id] == (lang, lang), (doc_id, out[doc_id])
    # empty doc: prior-only score; equal priors tie -> greatest lang wins
    assert out[99][1] == "zh"


def test_gopher_ngram_fractions_hand_computed(spark):
    """Gopher repetition battery vs hand-computed values. Note the
    published top-n-gram fraction is count × chars / total and CAN
    exceed 1 on degenerate overlap-heavy repetition (occurrences
    overlap; the filter thresholds at ~0.2 so implementations leave it
    uncapped) — row 'ab4' pins that. The dup-n-gram fraction is a char
    UNION (token counted once) and stays ≤ 1."""
    texts = {
        "ab": "a b a b a b",
        "xy": "x y z w v x y z w v u",
        "pq": "p q p q p q p q p q",
        "one": "hello",
        "empty": "",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "k string, text string"
    )
    staged = (
        df.select("k", T.tokens("text").alias("_t"))
        .select(
            "k", "_t",
            *[T.word_ngrams_joined(F.col("_t"), n).alias(f"_g{n}")
              for n in (2, 3, 4, 5, 6)],
        )
        .select(
            "k", "_t", "_g2", "_g3", "_g4", "_g5", "_g6",
            *[F.array_sort(F.col(f"_g{n}")).alias(f"_s{n}") for n in (5, 6)],
        )
        .select(
            "k", "_t", "_g2", "_g3", "_g4", "_g5", "_g6",
            *[T.dup_ngram_starts(F.col(f"_s{n}")).alias(f"_d{n}")
              for n in (5, 6)],
        )
    )
    out = {
        r["k"]: r
        for r in staged.select(
            "k",
            *[T.top_ngram_char_frac(F.col("_t"), F.col(f"_g{n}"), n)
               .alias(f"top{n}") for n in (2, 3, 4)],
            *[T.dup_ngram_char_frac(
                F.col("_t"), F.col(f"_g{n}"), F.col(f"_d{n}"), n
            ).alias(f"dup{n}") for n in (5, 6)],
        ).collect()
    }
    # "a b a b a b": top2 = 3·2/6, top3 = 2·3/6, top4 = 2·4/6 (>1); no 5-dup
    assert (out["ab"]["top2"], out["ab"]["top3"], out["ab"]["top4"]) == (
        1.0, 1.0, round(8 / 6, 6))
    assert out["ab"]["dup5"] == 0.0
    # "x y z w v x y z w v u": "x y z w v" dups at starts 1,6 -> tokens
    # 1-10 covered of 11 chars; no 6-gram dups
    assert out["xy"]["dup5"] == round(10 / 11, 6)
    assert out["xy"]["dup6"] == 0.0
    # fully periodic: every 5-gram duplicated -> full coverage
    assert out["pq"]["dup5"] == 1.0
    # single token / empty text -> all zero
    for k in ("one", "empty"):
        for c in ("top2", "top3", "top4", "dup5", "dup6"):
            assert out[k][c] == 0.0, (k, c, out[k][c])


def test_readability_scores_hand_computed(spark):
    """readability_scores (queries.py): replay the regex component counts
    and the published Flesch / FK formulas in pure Python over the sf0.001
    corpus — every doc, exact to the 4-dp rounding."""
    import re as _re

    from etl_adsbx_spark import queries as registry
    from etl_adsbx_spark.tables import load_table

    from .conftest import SF_SMALL

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    }
    got = {r["doc_id"]: r for r in registry.queries()["readability_scores"](spark, SF_SMALL).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        nw = max(len(_re.findall(r"\S+", text)), 1)
        ns = max(len(_re.findall(r"[.!?]+", text)), 1)
        nsyl = max(len(_re.findall(r"[aeiouy]+", text.lower())), 1)
        r = got[doc_id]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (nw, ns, nsyl)
        ws, sw = nw / ns, nsyl / nw

        def _r4(x: float) -> float:
            # both engines round doubles HALF_UP on the shortest decimal
            # repr (Python's round() is half-even - 12.74625 -> .7462)
            from decimal import ROUND_HALF_UP, Decimal

            return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

        assert r["flesch_ease"] == _r4(206.835 - 1.015 * ws - 84.6 * sw)
        assert r["fk_grade"] == _r4(0.39 * ws + 11.8 * sw - 15.59)
