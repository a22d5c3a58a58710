"""[EXT] Similarity search over embeddings (BASELINE.json north star).

- ``cosine_topk``: exact brute-force top-k — the oracle-checkable baseline.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path: at
  100 TB the brute-force pairwise join is O(n·q); LSH turns it into an
  equi-join on bucket signatures with a re-rank inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine
from ..operators.agg import topk_per_group
from ..operators.dedup import token_hash32


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
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
        .drop("_qv", "_cv")
    )
    # rank by cosine desc, tie-break neighbor_id desc (oracle mirrors this)
    return topk_per_group(scored, ["query_id"], F.struct("cosine_sim", "neighbor_id"), k)


def hyperplane_signature(vec_col, nbits: int = 8, dim: int = 64):
    """Deterministic pseudo-random hyperplane signature: plane p component
    j has weight ±1 from the portable md5-derived bit of token 'p:j'. The
    signature bit p is 1 iff Σ_j w_pj·v_j > 0. Returns int in [0, 2^nbits).
    Portable to SQL (same md5 construction as dedup.token_hash32)."""
    v = as_double(vec_col)

    def plane_sign(p: int):
        # closure factory, NOT a default-arg lambda (PySpark counts default
        # args as extra HOF lambda parameters)
        return lambda x, j: F.when(
            token_hash32(F.concat(F.lit(f"{p}:"), j.cast("string"))).bitwiseAND(F.lit(1)) == 1,
            x,
        ).otherwise(-x)

    sig = F.lit(0)
    for p in range(nbits):
        proj = F.aggregate(
            F.zip_with(v, F.sequence(F.lit(0), F.lit(dim - 1)), plane_sign(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig


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
    )
    q = sig(queries, "query_id")
    c = sig(embeddings, "neighbor_id")
    scored = (
        c.join(F.broadcast(q), (q["_sig"] == c["_sig"]) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cosine_sim", F.round(cosine(F.col("_query_id_v"), F.col("_neighbor_id_v")), 6))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    return topk_per_group(scored, ["query_id"], F.struct("cosine_sim", "neighbor_id"), k)
