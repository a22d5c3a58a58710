"""[EXT] Retrieval plan: chunk → embed → LSH index → search.

The composition a retrieval/RAG pipeline runs over a cleaned corpus,
assembled entirely from operators this engine verifies individually:

    chunking   (operators.chunk: token windows with overlap)
      → embed  (Arrow ``mapInPandas`` kernel — pluggable, like the
                multimodal decode kernel; default is a deterministic
                hashed bag-of-words embedder, a real if crude model whose
                cosine similarity tracks token overlap)
      → index  (the chunk-embedding frame; persist/write_corpus it —
                at scale this is the table the LSH band signatures are
                maintained over, exactly like the dedup band index)
      → search (operators.similarity.lsh_ann_topk multi-table probe, or
                cosine_topk exact for small corpora)

Scale shape: chunking is a per-row generator (no shuffle); embedding is
one Arrow-batched pass over chunks (the only Python stage — a real model
swaps in via ``embed_fn`` without touching the plan); the search is the
verified bucketed equi-join, never all-pairs. The query side is
broadcast-size by construction.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.chunk import chunk_documents
from ..operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    ivf_index,
    lsh_ann_topk,
    lsh_signature_table,
)


def hashed_bow_embed(texts: pd.Series, dim: int = 64) -> np.ndarray:
    """Default embed kernel: deterministic hashed bag-of-words. Token t
    adds ±1 (sign from the hash's top bit) to slot crc32(t) % dim; vectors
    are L2-normalized. Pure content function — stable across runs,
    machines, partitionings, and batch sizes — so retrieval results are
    reproducible, and cosine similarity grows with token overlap (the
    signed-random-projection view of BoW). A real sentence-embedding model
    has the identical signature: ``Series[str] -> ndarray[n, dim]``.
    """
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in t.split():
            h = zlib.crc32(tok.encode())
            out[i, h % dim] += 1.0 if (h >> 31) & 1 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def embed_texts(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    embed_fn: Callable[[pd.Series], np.ndarray] | None = None,
    dim: int = 64,
) -> DataFrame:
    """Attach an ``embedding: array<double>`` column computed by
    ``embed_fn`` over Arrow batches. Output carries ``id_cols`` +
    embedding only (the text is dropped — re-join it by id when needed,
    keeping the shuffled/persisted index frame narrow)."""
    fn = embed_fn or (lambda s: hashed_bow_embed(s, dim))
    schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*id_cols).dtypes] + ["embedding array<double>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = fn(pdf[text_col])
            out = pdf[id_cols].copy()
            out["embedding"] = list(vecs)
            yield out

    return df.select(*id_cols, text_col).mapInPandas(run, schema)


def chunk_embed_index(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    dim: int = 64,
    embed_fn: Callable[[pd.Series], np.ndarray] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build the retrieval index frame: one row per chunk with a globally
    unique ``chunk_id`` (content-derived — xxhash64 of (doc, ordinal), the
    retry-safe key rule), its provenance (doc_id, chunk_idx), and its
    embedding. Persist or ``sinks.write_corpus`` this frame; incremental
    ticks append to it exactly like the dedup band index."""
    chunks = chunk_documents(docs, chunk_tokens, overlap, text_col, id_col)
    keyed = chunks.withColumn(
        "chunk_id", F.xxhash64(F.col(id_col).cast("string"), F.col("chunk_idx"))
    )
    emb = embed_texts(
        keyed, "chunk_text", ["chunk_id", id_col, "chunk_idx"], embed_fn, dim
    )
    return emb


def index_signatures(
    index: DataFrame, nbits: int = 4, n_tables: int = 8, dim: int = 64
) -> DataFrame:
    """The persistable LSH signature table of an index frame (one
    (chunk_id, table, sig) row per table per chunk). Build it ONCE when
    the index is built, persist/write it alongside, and pass it to
    ``search_index(..., corpus_sigs=...)``: at sf0.1 this turns a 4.1s
    probe into the bucket equi-join alone (the corpus signature pass was
    ~80% of the search — BASELINE.md)."""
    return lsh_signature_table(
        index, "neighbor_id", nbits, dim, n_tables, id_col="chunk_id"
    )


def index_ivf(
    index: DataFrame, n_centroids: int = 8, sample_mod: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """The persistable IVF pair (centroids, chunk assignments) of an index
    frame — the inverted-list alternative to ``index_signatures`` (same
    persist-once/append-per-tick contract via ``similarity.ivf_append``;
    measured ~3× probe speedup over refit-per-search, BASELINE.md)."""
    return ivf_index(
        index, n_centroids, id_col="chunk_id", vec_col="embedding",
        centroids="kmeans", sample_mod=sample_mod,
    )


def bm25_rank(
    corpus_text: DataFrame,
    queries: DataFrame,
    k: int = 20,
    text_col: str = "chunk_text",
    id_col: str = "chunk_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-query BM25 lexical ranking (Robertson-Sparck Jones) — the
    multi-query generalization of the graded single-query ``bm25_topk``
    registry row. Returns (query_id, id_col, bm25 double, lex_rank) with
    lex_rank ≤ k per query.

    100-TB shape: the corpus token stream is semi-joined against the
    (broadcast-size) distinct query-term set BEFORE the tf aggregation —
    only matching postings shuffle; df and the (n_docs, avgdl) scalar are
    tiny broadcasts; per-query top-k is one window over the
    candidate-sized scored frame."""
    from ..functions.text import tokens
    from ..planprobe import pin

    # toks is deliberately NOT pinned (r11, measured): the token-postings
    # frame is CORPUS-TOKEN-scale, and materializing it (localCheckpoint)
    # costs a full-width write of every token row — measured 2.06× SLOWER
    # on hybrid_rrf_topk than letting each consumer re-run the pruned
    # scan + map-side explode (the q21 `l1` rule: a pruned columnar
    # rescan of a fact-scale frame beats materializing it). The two
    # consumers each keep their map-side shape: the tf leg semi-joins
    # the broadcast query-term set BEFORE any shuffle, the dl agg is
    # map-side partial. Only the DOC-sized dl result is pinned — it
    # feeds the (n_docs, avgdl) scalar AND the comp join.
    toks = corpus_text.select(
        id_col, F.explode(tokens(text_col)).alias("term")
    )
    dl = pin("bm25_rank", "doc_lengths",
             toks.groupBy(id_col).agg(F.count("*").alias("_dl")))
    stats = dl.agg(F.count("*").alias("_n_docs"), F.avg("_dl").alias("_avgdl"))
    qterms = queries.select(
        query_id_col, F.explode(tokens(query_text_col)).alias("term")
    ).distinct()
    # tf IS pinned (candidate-sized: only postings matching the
    # broadcast query-term set survive): it feeds the comp join AND
    # dfreq — unpinned, dfreq re-ran the corpus scan + explode.
    tf = pin("bm25_rank", "query_term_tf", (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("_tf"))
    ))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    comp = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            id_col,
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5))
                )
                * F.col("_tf")
                * F.lit(k1 + 1)
                / (
                    F.col("_tf")
                    + F.lit(k1)
                    * (F.lit(1 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("_c"),
        )
    )
    from pyspark.sql import Window

    scored = comp.groupBy(query_id_col, id_col).agg(
        F.sum("_c").cast("double").alias("bm25")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("lex_rank", F.row_number().over(w)).where(
        F.col("lex_rank") <= k
    )


def rrf_fuse(
    lex: DataFrame,
    vec: DataFrame,
    k: int = 5,
    k0: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "chunk_id",
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a vector result list:
    ``score = Σ_legs 1/(k0 + rank)`` (Cormack et al.'s standard k0=60),
    full-outer on (query, id) so a doc ranked by only one leg still
    scores. Inputs: ``lex`` = (query_id, id, lex_rank), ``vec`` =
    (query_id, id, vec_rank). Returns the per-query top-``k`` by
    (rrf_score desc, id) with both ranks carried (null = that leg missed
    it). Rank-only fusion needs no score calibration between legs, which
    is exactly why RRF is the default hybrid in production retrieval."""
    from pyspark.sql import Window

    keys = [query_id_col, id_col]
    fused = (
        lex.select(*keys, "lex_rank")
        .join(vec.select(*keys, "vec_rank"), keys, "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(k0) + F.col("vec_rank")), F.lit(0.0)
                ),
                8,
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return fused.withColumn("rrf_rank", F.row_number().over(w)).where(
        F.col("rrf_rank") <= k
    )


def hybrid_search(
    index: DataFrame,
    corpus_text: DataFrame,
    queries: DataFrame,
    k: int = 5,
    depth: int = 20,
    k0: int = 60,
    dim: int = 64,
    embed_fn: Callable[[pd.Series], np.ndarray] | None = None,
    exact: bool = False,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    **search_kwargs,
) -> DataFrame:
    """BM25 ⊕ embedding retrieval fused by reciprocal rank — the standard
    hybrid a RAG deployment runs first (lexical catches exact terms the
    embedder abstracts away; the embedder catches paraphrases lexical
    can't see; RRF needs no score calibration between them). Both legs
    retrieve to ``depth`` (> k: fusion needs headroom below each leg's
    top-k), then ``rrf_fuse`` takes the top-``k``.

    ``index`` = chunk_embed_index output (chunk_id + embedding);
    ``corpus_text`` = (chunk_id, chunk_text) — the text side kept
    separate so the persisted vector index stays narrow. Returns
    (query_id, chunk_id, rrf_score, rrf_rank, lex_rank, vec_rank)."""
    from pyspark.sql import Window

    lex = bm25_rank(
        corpus_text,
        queries,
        k=depth,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    )
    hits = search_index(
        index,
        queries,
        k=depth,
        dim=dim,
        embed_fn=embed_fn,
        exact=exact,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        **search_kwargs,
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    vec = hits.select(
        F.col("query_id").alias(query_id_col),
        F.col("neighbor_id").alias("chunk_id"),
        F.row_number().over(wv).alias("vec_rank"),
    )
    return rrf_fuse(
        lex, vec, k=k, k0=k0, query_id_col=query_id_col, id_col="chunk_id"
    )


def search_index(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    embed_fn: Callable[[pd.Series], np.ndarray] | None = None,
    exact: bool = False,
    nbits: int = 4,
    n_tables: int = 8,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    corpus_sigs: DataFrame | None = None,
    ivf: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Top-k chunks for each query text. ``exact=True`` brute-forces
    (the ground-truth path for evaluation); the default probes the
    multi-table LSH buckets — the same OR-amplified equi-join shape whose
    recall@5 is pinned in BASELINE.md. Pass a persisted
    ``index_signatures`` frame as ``corpus_sigs`` to skip the corpus
    signature pass per query batch (the maintained-index shape), or a
    persisted ``index_ivf`` pair as ``ivf`` to probe inverted lists
    instead of LSH buckets. Returns
    (query_id, neighbor_id = chunk_id, cosine_sim); join back to the
    index frame for provenance."""
    qv = embed_texts(
        queries.withColumnRenamed(query_id_col, "chunk_id"),
        query_text_col,
        ["chunk_id"],
        embed_fn,
        dim,
    # a token-less query embeds to the zero vector (hashed_bow_embed);
    # cosine against it is 0/0 = NaN, which would rank nondeterministically —
    # drop such queries (they match nothing meaningfully)
    ).filter(F.exists("embedding", lambda x: x != 0))
    vecs = index.select("chunk_id", "embedding")
    if exact:
        out = cosine_topk(vecs, qv, k, id_col="chunk_id", vec_col="embedding")
    elif ivf is not None:
        # inverted-list probe over the persisted ``index_ivf`` pair; the
        # query side pays one broadcast-argmax assignment, the corpus none
        out = ivf_ann_topk(
            vecs, qv, k, id_col="chunk_id", vec_col="embedding", index=ivf
        )
    else:
        out = lsh_ann_topk(
            vecs, qv, k, nbits=nbits, dim=dim,
            id_col="chunk_id", vec_col="embedding", n_tables=n_tables,
            corpus_sigs=corpus_sigs,
        )
    return out
