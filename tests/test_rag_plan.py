"""Retrieval plan (plans.rag): embed-kernel determinism, index plumbing,
and end-to-end retrieval quality — a distinctive phrase must retrieve its
own document's chunk, and the LSH probe must agree with exact search."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_adsbx_spark.plans.rag import (
    chunk_embed_index,
    hashed_bow_embed,
    search_index,
)

DOCS = [
    (1, "the gross weight of the aurora spacecraft exceeds nine tonnes "
        "and its heat shield is made of woven carbon " * 3),
    (2, "a recipe for sourdough bread requires patient fermentation of "
        "wild yeast over several cold days " * 3),
    (3, "quarterly revenue in the retail segment grew while logistics "
        "margins compressed under fuel costs " * 3),
    (4, "migratory songbirds navigate using stellar cues and magnetic "
        "field inclination across continents " * 3),
]

QUERIES = [
    (101, "aurora spacecraft heat shield carbon"),
    (102, "sourdough bread wild yeast fermentation"),
    (103, "retail revenue logistics margins fuel"),
    (104, "songbirds stellar navigation magnetic field"),
]


def test_embed_kernel_deterministic_and_batch_invariant():
    s = pd.Series([t for _, t in DOCS])
    a = hashed_bow_embed(s)
    b = hashed_bow_embed(s)
    assert np.array_equal(a, b)
    # batch-size invariance: embedding a row alone == embedding it in a batch
    solo = hashed_bow_embed(pd.Series([DOCS[2][1]]))
    assert np.array_equal(a[2], solo[0])
    # unit norm for non-empty text; zero vector for empty
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
    assert np.array_equal(hashed_bow_embed(pd.Series([""])), np.zeros((1, 64)))


def test_index_plumbing(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = chunk_embed_index(docs, chunk_tokens=16, overlap=4).collect()
    # chunk ids are content-derived and globally unique
    ids = [r.chunk_id for r in idx]
    assert len(ids) == len(set(ids))
    for r in idx:
        assert len(r.embedding) == 64
        n = float(np.linalg.norm(r.embedding))
        assert abs(n - 1.0) < 1e-9
    # rebuilding yields identical ids + vectors (retry/restart safety)
    again = chunk_embed_index(docs, chunk_tokens=16, overlap=4).collect()
    assert sorted((r.chunk_id, tuple(r.embedding)) for r in idx) == sorted(
        (r.chunk_id, tuple(r.embedding)) for r in again
    )


def test_end_to_end_retrieval(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    idx = chunk_embed_index(docs, chunk_tokens=16, overlap=4)
    idx = idx.localCheckpoint()  # the persisted-index shape; also stabilizes plans

    exact = search_index(idx, queries, k=3, exact=True)
    prov = {r.chunk_id: r.doc_id for r in idx.collect()}
    top1 = {}
    for r in exact.collect():
        if r.query_id not in top1 or r.cosine_sim > top1[r.query_id][1]:
            top1[r.query_id] = (prov[r.neighbor_id], r.cosine_sim)
    # each query's best chunk comes from its own document
    assert {q: d for q, (d, _) in top1.items()} == {101: 1, 102: 2, 103: 3, 104: 4}

    # the LSH probe's top-1 must appear in the exact top-3 for every query
    lsh = search_index(idx, queries, k=3, nbits=4, n_tables=8)
    exact_top3 = {}
    for r in exact.collect():
        exact_top3.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh_best = {}
    for r in lsh.collect():
        if r.query_id not in lsh_best or r.cosine_sim > lsh_best[r.query_id][1]:
            lsh_best[r.query_id] = (r.neighbor_id, r.cosine_sim)
    for q, (nid, _) in lsh_best.items():
        assert nid in exact_top3[q], (q, nid, exact_top3[q])


def test_empty_query_dropped_not_nan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = chunk_embed_index(docs, chunk_tokens=16, overlap=4)
    queries = spark.createDataFrame(
        [(200, "   "), (201, "sourdough yeast")], "query_id long, query_text string"
    )
    out = search_index(idx, queries, k=2, exact=True).collect()
    qids = {r.query_id for r in out}
    assert 200 not in qids          # zero-vector query silently matches nothing
    assert 201 in qids
    assert all(r.cosine_sim == r.cosine_sim for r in out)  # no NaNs


def test_persisted_signature_search_matches_recompute(spark):
    """The maintained-index shape: searching with a persisted
    index_signatures frame returns exactly what the recompute path returns
    (same plane family), so production can append signatures per tick and
    never re-signature the corpus."""
    from etl_adsbx_spark.plans.rag import index_signatures

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    idx = chunk_embed_index(docs, chunk_tokens=16, overlap=4).localCheckpoint()
    sigs = index_signatures(idx, nbits=4, n_tables=8).localCheckpoint()
    recompute = sorted(
        map(tuple, search_index(idx, queries, k=3, nbits=4, n_tables=8).collect())
    )
    persisted = sorted(
        map(
            tuple,
            search_index(
                idx, queries, k=3, nbits=4, n_tables=8, corpus_sigs=sigs
            ).collect(),
        )
    )
    assert recompute == persisted and len(persisted) > 0


def test_incremental_index_append(spark):
    """The per-tick index maintenance shape: a new document's chunks are
    embedded and signatured ALONE, appended (union) to the existing
    signature table, and the very next search retrieves them — the old
    corpus is never re-embedded or re-signatured."""
    from etl_adsbx_spark.plans.rag import index_signatures

    old_docs = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    new_doc = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    old_idx = chunk_embed_index(old_docs, chunk_tokens=16, overlap=4).localCheckpoint()
    old_sigs = index_signatures(old_idx, nbits=4, n_tables=8).localCheckpoint()
    # tick: embed + signature ONLY the new doc, append both frames
    new_idx = chunk_embed_index(new_doc, chunk_tokens=16, overlap=4).localCheckpoint()
    idx = old_idx.unionByName(new_idx)
    sigs = old_sigs.unionByName(index_signatures(new_idx, nbits=4, n_tables=8))

    queries = spark.createDataFrame(
        [(104, "songbirds stellar navigation magnetic field")],
        "query_id long, query_text string",
    )
    hits = search_index(idx, queries, k=3, nbits=4, n_tables=8, corpus_sigs=sigs)
    prov = {r.chunk_id: r.doc_id for r in idx.collect()}
    best = max(hits.collect(), key=lambda r: r.cosine_sim)
    assert prov[best.neighbor_id] == 4


def test_ivf_route_retrieves_own_document(spark):
    """The inverted-list route: each query's IVF top-1 must come from its
    own document (the corpus is 4 well-separated topics, so the right
    chunk dominates its list), and the route must honor the persisted
    (centroids, assignments) pair without touching corpus embeddings
    beyond the re-rank."""
    from etl_adsbx_spark.plans.rag import index_ivf

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    idx = chunk_embed_index(docs, chunk_tokens=16, overlap=4).localCheckpoint()
    cents, assign = index_ivf(idx, n_centroids=4)
    ivf = (cents.localCheckpoint(), assign.localCheckpoint())
    out = search_index(idx, queries, k=3, ivf=ivf)
    prov = {r.chunk_id: r.doc_id for r in idx.collect()}
    best = {}
    for r in out.collect():
        if r.query_id not in best or r.cosine_sim > best[r.query_id][1]:
            best[r.query_id] = (prov[r.neighbor_id], r.cosine_sim)
    got = {q: d for q, (d, _) in best.items()}
    # every answered query answers from its own document; IVF recall may
    # drop a query whose nearest centroid list misses (not observed at
    # these sizes, but the contract is subset-correctness, not coverage)
    for q, d in got.items():
        assert d == q - 100, (q, d)
    assert len(got) >= 3


def test_hybrid_rrf_beats_either_single_retriever(spark):
    """Planted fixture (round-6 verdict #7): doc E is an exact-term match
    the embedder maps far away; doc S is a paraphrase sharing no terms.
    Lexical top-2 misses S, vector top-2 misses E, the RRF fusion's top-2
    is exactly {E, S} — recall 1.0 vs 0.5 for either single leg."""
    import pyspark.sql.functions as F

    from etl_adsbx_spark.plans.rag import chunk_embed_index, hybrid_search

    vecs = {
        # query: "quantum flux"
        "__query__": [1.0, 0.0, 0.0, 0.0],
        # E: exact terms, orthogonal embedding
        "quantum flux capacitor manual": [0.0, 1.0, 0.0, 0.0],
        # S: paraphrase, near-identical embedding
        "subatomic field surge handbook": [0.99, 0.1, 0.0, 0.0],
        # distractors: mid cosine, no query terms
        "kitchen recipes for pasta": [0.5, 0.5, 0.5, 0.0],
        "gardening in small spaces": [0.4, 0.6, 0.4, 0.0],
    }

    def embed_fn(texts: pd.Series) -> np.ndarray:
        return np.array(
            [vecs.get(t, [0.0, 0.0, 0.0, 1.0]) for t in texts], dtype=np.float64
        )

    doc_texts = [t for t in vecs if t != "__query__"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id bigint, text string"
    )
    index = chunk_embed_index(docs, chunk_tokens=64, overlap=0, dim=4, embed_fn=embed_fn)
    corpus_text = index.join(docs, "doc_id").select(
        "chunk_id", F.col("text").alias("chunk_text")
    )
    queries = spark.createDataFrame(
        [(0, "quantum flux")], "query_id bigint, query_text string"
    )
    # embed_fn must see the query literally — patch it in via the dict key
    vecs["quantum flux"] = vecs["__query__"]

    id_of = {t: r["chunk_id"] for t, r in zip(
        doc_texts,
        index.join(docs, "doc_id").orderBy("doc_id").select("chunk_id").collect(),
    )}
    e_id = id_of["quantum flux capacitor manual"]
    s_id = id_of["subatomic field surge handbook"]

    fused = hybrid_search(
        index, corpus_text, queries, k=2, depth=4, dim=4,
        embed_fn=embed_fn, exact=True,
    ).collect()
    top2 = {r["chunk_id"] for r in fused}
    assert top2 == {e_id, s_id}, (top2, e_id, s_id)
    by_id = {r["chunk_id"]: r for r in fused}
    # and the rank evidence: E from the lexical leg only, S led by vector
    assert by_id[e_id]["lex_rank"] == 1
    assert by_id[s_id]["vec_rank"] == 1
    # single-leg top-2 recall is 0.5 each
    from etl_adsbx_spark.plans.rag import bm25_rank, search_index

    lex2 = {
        r["chunk_id"]
        for r in bm25_rank(corpus_text, queries, k=2).collect()
    }
    assert e_id in lex2 and s_id not in lex2
    vec2 = {
        r["neighbor_id"]
        for r in search_index(
            index, queries, k=2, dim=4, embed_fn=embed_fn, exact=True
        ).collect()
    }
    assert s_id in vec2 and e_id not in vec2
