"""Link-graph analytics: fixed-iteration PageRank over an edge list.

The training-data-pipeline use case is domain-level quality weighting
(the Common-Crawl curation signal: rank hosts by link structure, weight
or gate documents by their host's rank — e.g. the harmonic-centrality /
PageRank screens described in the Common Crawl and RefinedWeb curation
literature). The reference engine has no graph surface (its only
key-propagation shape is the keyed-recency dedup, task.ts:136-190);
this is an [EXT] operator of the corpus-curation family.

Determinism contract (registry convention): every nonlinear step is
rounded to a fixed scale and cast to DECIMAL *before* it enters a sum,
so a SQL oracle replays the whole iteration bit-for-bit — transition
probabilities at 10 dp, rank values at 12 dp, all values positive (so
HALF_UP == round-half-away, and Spark and DuckDB agree).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Both directions of every edge (the undirected → directed prep for
    ``pagerank``'s no-dangling contract): a ⋈ b yields (a→b) and (b→a).
    A self-loop contributes its single row once (the reverse direction
    would be an identical row, not a new edge). Output columns
    (src, dst), duplicates NOT merged — ``pagerank`` weight-aggregates."""
    a = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    b = edges.where(F.col(src) != F.col(dst)).select(
        F.col(dst).alias("src"), F.col(src).alias("dst")
    )
    return a.unionByName(b)


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: str = "0.85",
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    out_col: str = "pagerank",
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count — the rank vector
    after exactly ``iters`` power-iteration steps, not an
    epsilon-convergence loop (fixed steps are what makes the result a
    pure deterministic function of the edge list, replayable by a SQL
    oracle as ``iters`` chained CTEs; for ranking-quality use, 5-10
    steps are the standard operating point on web-scale graphs).

    CONTRACT: every node must have at least one OUT-edge — pass an
    undirected graph through ``symmetrize_edges`` first. Dangling mass
    is not redistributed (a dst-only node never re-emits its rank); on a
    symmetrized graph no node is dangling and total mass is conserved up
    to the per-step 12-dp rounding. Nodes are the DISTINCT edge sources;
    on a symmetrized graph that is every endpoint.

    Arithmetic (exact in both engines): transition probability
    ``p(u→v) = round(w_uv / outw_u, 10)::DECIMAL(12,10)`` (the only
    double division); rank update
    ``r'(v) = round(base + d * round(Σ_in p·r, 12), 12)`` with every
    intermediate an exact decimal operation; ``base = round((1-d)/n, 12)``
    and ``r0 = round(1/n, 12)`` from a 1-row broadcast node-count frame
    (both terms derive from the same ``damping``, so Σ rank stays 1 up to
    rounding for any 2-dp damping, not just 0.85; dampings with more
    than 2 decimal places are rejected — the DECIMAL(3,2) rank update
    would silently round them away from the teleport term).

    100-TB shape: the edge list aggregates once into the transition
    table (one (src,dst)-keyed hash-agg + one src-keyed hash-agg —
    corpus-sized input, GRAPH-sized output: domains ≪ documents), which
    is checkpointed and reused by every step; each step is then ONE
    src-keyed shuffle join + one dst-keyed hash-agg over the graph-sized
    table, with the new rank vector checkpointed and the previous one
    released (the ``connected_components`` round hygiene,
    dedup.py:620 — unrolling the steps instead measurably recomputes the
    transition subtree once per step: ReuseExchange does not fire across
    the differently-pruned iteration branches). ``checkpoint=False``
    keeps the whole thing lazy for plan inspection and tiny graphs. On a
    real cluster prefer ``checkpoint()`` to reliable storage so a lost
    executor replays one step, not the chain.

    Returns (node, ``out_col`` double).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d_dec = Decimal(damping)
    if not (Decimal(0) < d_dec < Decimal(1)):
        raise ValueError("damping must be in (0, 1)")
    # the rank update multiplies by d as DECIMAL(3,2); a damping with >2
    # decimal places would be silently rounded there (0.855 -> 0.86) while
    # the teleport base used the unrounded value, breaking the per-step
    # mass identity base + d*1 = 1 — reject rather than desync the terms
    if d_dec != d_dec.quantize(Decimal("0.01")):
        raise ValueError(
            f"damping must have at most 2 decimal places (got {damping!r}): "
            "the decimal rank update uses DECIMAL(3,2) and would silently "
            "round it away from the teleport term"
        )
    d = F.lit(d_dec).cast("decimal(3,2)")
    teleport = Decimal(1) - d_dec  # base = (1-d)/n, NOT a hardcoded 0.15
    w = F.col(weight) if weight else F.lit(1)
    e = edges.groupBy(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).agg(F.sum(w).alias("_w"))
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    trans = e.join(outw, "_src").select(
        "_src",
        "_dst",
        F.round(F.col("_w").cast("double") / F.col("_ow"), 10)
        .cast("decimal(12,10)")
        .alias("_p"),
    )
    if checkpoint:
        trans = trans.localCheckpoint(eager=True)
    nodes = outw.select(F.col("_src").alias("node"))
    nf = nodes.agg(F.count("*").alias("_n"))
    basef = nf.select(
        F.round(F.lit(float(teleport)) / F.col("_n"), 12)
        .cast("decimal(14,12)")
        .alias("_base")
    )
    if checkpoint:
        basef = basef.localCheckpoint(eager=True)
    r = nodes.crossJoin(F.broadcast(nf)).select(
        "node",
        F.round(F.lit(1.0) / F.col("_n"), 12).cast("decimal(14,12)").alias("_pr"),
    )
    if checkpoint:
        r = r.localCheckpoint(eager=True)
    for _ in range(iters):
        r_new = (
            trans.join(r, trans["_src"] == r["node"])
            .groupBy("_dst")
            .agg(
                F.round(F.sum(F.col("_p") * F.col("_pr")), 12)
                .cast("decimal(14,12)")
                .alias("_c")
            )
            .crossJoin(F.broadcast(basef))
            .select(
                F.col("_dst").alias("node"),
                F.round(F.col("_base") + F.col("_c") * d, 12)
                .cast("decimal(14,12)")
                .alias("_pr"),
            )
        )
        if checkpoint:
            prev, r = r, r_new.localCheckpoint(eager=True)
            prev.unpersist()
        else:
            r = r_new
    return r.select("node", F.col("_pr").cast("double").alias(out_col))
