"""[EXT] Similarity search over embeddings (BASELINE.json north star).

- ``cosine_topk``: exact brute-force top-k — the oracle-checkable baseline.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path: at
  100 TB the brute-force pairwise join is O(n·q); LSH turns it into an
  equi-join on bucket signatures with a re-rank inside buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, dot, norm
from ..operators.agg import topk_per_group


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small (broadcast); the candidate side streams.
    Output: (query_id, neighbor_id, cosine_sim) with rank ≤ k, self-match
    excluded. cosine is rounded to 6 dp (cross-engine float stability).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    ).withColumn("_qn", norm(F.col("_qv")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
        .drop("_qv", "_cv", "_qn", "_cn")
    )
    # rank by cosine desc, tie-break neighbor_id desc (oracle mirrors this)
    return topk_per_group(scored, ["query_id"], F.struct("cosine_sim", "neighbor_id"), k)


def hyperplane_weights(nbits: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1.0 weight per (plane p, component j): bit 0 of the
    32-bit int from the first 8 hex chars of md5('p:j') — the same
    construction as ``dedup.token_hash32``, evaluated driver-side with
    hashlib (byte-identical to SQL md5). Precomputing makes the weights
    plan-time literals: the previous formulation evaluated an md5 per
    (row, plane, component) at runtime, and literal weights are what lets
    the DuckDB oracle embed the identical arrays."""
    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:8], 16) & 1 else -1.0
            for j in range(dim)
        ]
        for p in range(nbits)
    ]


def hyperplane_signature(vec_col, nbits: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane signature: bit p is 1 iff round(Σ_j w_pj·v_j, 6)
    > 0 (rounded so a 1-ulp accumulation difference between engines cannot
    flip a bit). Returns int in [0, 2^nbits)."""
    v = as_double(vec_col)
    sig = F.lit(0)
    for p, w in enumerate(hyperplane_weights(nbits, dim)):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in w]), lambda x, wj: x * wj),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(F.round(proj, 6) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    out_id: str,
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast the
    centroid table, argmax via max_by over the rounded similarity with a
    centroid-id tiebreak). Output: (out_id, _v, _n, _cid)."""
    v = vectors.select(
        F.col(id_col).alias(out_id), F.col("_v"), F.col("_n")
    )
    c = centroids.select(
        F.col("_cent_id"), F.col("_cv"), F.col("_cn")
    )
    sim = F.round(dot(F.col("_v"), F.col("_cv")) / (F.col("_n") * F.col("_cn")), 6)
    return (
        v.join(F.broadcast(c))
        .groupBy(out_id)
        .agg(
            F.first("_v").alias("_v"),
            F.first("_n").alias("_n"),
            F.max_by(F.col("_cent_id"), F.struct(sim.alias("s"), F.col("_cent_id"))).alias(
                "_cid"
            ),
        )
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists, search only the query's own list
    (single-probe). The coarse quantizer is deliberately deterministic —
    the centroids are the ``n_centroids`` lowest-id vectors — instead of
    k-means: same operator shape and scale behavior (assignment is a
    broadcast argmax join; search is an equi-join on the list id), but
    reproducible and therefore fully oracle-checkable. A production build
    swaps in sampled k-means centroids without touching the plan shape.
    Output schema matches ``cosine_topk``; recall < 1 by construction."""
    base = embeddings.select(
        F.col(id_col).alias("_bid"), as_double(vec_col).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    cents = (
        base.orderBy("_bid")
        .limit(n_centroids)
        .select(
            F.col("_bid").alias("_cent_id"),
            F.col("_v").alias("_cv"),
            F.col("_n").alias("_cn"),
        )
    )
    corpus = ivf_assign(
        base.withColumnRenamed("_bid", id_col), cents, id_col, "neighbor_id"
    )
    qv = queries.select(
        F.col(id_col).alias("_qid"), as_double(vec_col).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    qs = ivf_assign(qv.withColumnRenamed("_qid", id_col), cents, id_col, "query_id")
    scored = (
        corpus.alias("c")
        .join(
            F.broadcast(qs.alias("q")),
            (F.col("q._cid") == F.col("c._cid"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("q._v"), F.col("c._v")) / (F.col("q._n") * F.col("c._n")), 6
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    return topk_per_group(scored, ["query_id"], F.struct("cosine_sim", "neighbor_id"), k)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    nbits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: block by a coarse
    ``nbits``-plane hyperplane signature (equi-join on the bucket), then
    verify candidates with exact cosine ≥ ``threshold``.

    The blocking is the scale lever: the all-pairs O(n²) comparison becomes
    an equi-join with ~n²/2^nbits candidate pairs, at the cost of recall
    (two near-dups land in different buckets with probability
    1−(1−θ/π)^nbits). Exact-verify keeps precision = 1. Output
    (a_id, b_id, cosine_sim)."""
    # norms precomputed per side: cosine = dot/(norm_a·norm_b) evaluates
    # one O(dim) fold per candidate pair instead of three (same FP result —
    # sqrt(Σa²)·sqrt(Σb²) is the exact expression cosine() uses per pair)
    sig = embeddings.select(
        F.col(id_col).alias("_id"),
        as_double(vec_col).alias("_v"),
        hyperplane_signature(F.col(vec_col), nbits, dim).alias("_sig"),
    ).withColumn("_n", norm(F.col("_v")))
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig")) & (F.col("a._id") < F.col("b._id")),
        )
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n")), 6
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            "cosine_sim",
        )
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, re-rank within
    bucket. Recall < 1 by construction (single probe); the scale win is the
    equi-join on the signature. Output schema matches ``cosine_topk``."""
    sig = lambda df, name: df.select(
        F.col(id_col).alias(name),
        as_double(vec_col).alias(f"_{name}_v"),
        hyperplane_signature(F.col(vec_col), nbits, dim).alias("_sig"),
    ).withColumn(f"_{name}_n", norm(F.col(f"_{name}_v")))
    q = sig(queries, "query_id")
    c = sig(embeddings, "neighbor_id")
    scored = (
        c.join(F.broadcast(q), (q["_sig"] == c["_sig"]) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("_query_id_v"), F.col("_neighbor_id_v"))
                / (F.col("_query_id_n") * F.col("_neighbor_id_n")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    return topk_per_group(scored, ["query_id"], F.struct("cosine_sim", "neighbor_id"), k)
