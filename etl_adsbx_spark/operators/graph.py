"""Link-graph analytics: fixed-iteration PageRank, HITS, and
degree-ordered triangle counting over an edge list.

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

from ..planprobe import probe_step


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
    for _i in range(iters):
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
        probe_step("pagerank", f"iter{_i + 1}", r_new)
        if checkpoint:
            prev, r = r, r_new.localCheckpoint(eager=True)
            prev.unpersist()
        else:
            r = r_new
    return r.select("node", F.col("_pr").cast("double").alias(out_col))


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient via the
    DEGREE-ORDERED orientation (the "curse of the last reducer"
    mitigation, Suri & Vassilvitskii WWW'11 / Cohen's MapReduce triangle
    pattern): orient each undirected edge from its lower-(degree, node)
    endpoint to the higher one, enumerate wedges only at each edge's
    TAIL, and close them with one more equi-join. Orientation bounds
    every out-degree by O(sqrt(m)) on any graph, so the wedge join does
    O(m^{3/2}) work instead of Σ d² — the hub node that would otherwise
    generate (d choose 2) wedge candidates never does.

    Input: any edge list, interpreted as UNDIRECTED; self-loops dropped,
    duplicate/reverse edges merged (a node whose only edges are
    self-loops is isolated and does not appear in the output — degree is
    defined over the simple graph). Output one row per node:
    (node, degree bigint, triangles bigint,
     clustering double = round(2T / (d(d-1)), 8), 0.0 when d < 2).

    100-TB shape: three hash-aggs + three equi-joins, all on graph-sized
    data (the corpus has already been collapsed to an edge list by the
    caller); no broadcast assumptions, no driver-side state. Every
    triangle materializes exactly once (as its orientation-ordered
    (a→b→c) closure) and is attributed to its 3 vertices by an explode —
    triangle-sized, not wedge-sized, intermediate.
    """
    e_raw = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).where(F.col("u") < F.col("v"))
    e = e_raw.distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv"))
    ed = e.join(du, "u").join(dv, "v")
    # orient from lower (degree, node) to higher; carry the HEAD's key so
    # the wedge join can order the two heads without re-joining degrees
    lower_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("_dv")).otherwise(F.col("_du")).alias("bd"),
    )
    o1 = o.select(
        F.col("a"), F.col("b").alias("x"), F.col("bd").alias("xd")
    )
    o2 = o.select(
        F.col("a"), F.col("b").alias("y"), F.col("bd").alias("yd")
    )
    wedges = o1.join(o2, "a").where(
        (F.col("xd") < F.col("yd"))
        | ((F.col("xd") == F.col("yd")) & (F.col("x") < F.col("y")))
    )
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select("a", "x", "y")
    per_node = (
        tris.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("degree").cast("bigint").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0))
            .cast("bigint")
            .alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    8,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def hits(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) with a FIXED iteration
    count and the registry's exact-decimal replay contract (the
    ``pagerank`` discipline: a SQL oracle can replay every step as
    chained CTEs bit-for-bit).

    Per step: ``a'(v) = Σ_{u→v} h(u)`` then L1-normalize;
    ``h'(u) = Σ_{u→v} a'(v)`` then L1-normalize. Scores live as
    DECIMAL(14,12); each normalization is the one double division,
    ``round(x_dbl / s_dbl, 12)::DECIMAL(14,12)`` (IEEE division then
    half-up rounding — both exact-rounded and engine-portable; decimal÷
    decimal is avoided because Spark and DuckDB derive different result
    scales). Duplicate edges are pre-merged into an integer multiplicity
    ``w`` so the update sum is ``Σ w·h`` — exact decimal×int arithmetic.

    Nodes = distinct endpoints (either side); a node with no in-edge has
    authority 0, no out-edge → hub 0, and L1 norms stay positive on any
    nonempty edge list. Initial h = 1/n (rounded to 12 dp).

    100-TB shape: the deduped edge table is checkpointed once and reused
    by all ``2·iters`` joins; each half-step is one shuffle join + one
    hash-agg on graph-sized data plus a 1-row L1-sum broadcast — the
    same per-step cost envelope as ``pagerank``.

    Returns (node, hub double, authority double).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .groupBy("_s", "_d")
        .agg(F.count("*").alias("_w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nf = nodes.agg(F.count("*").alias("_n"))
    h = nodes.crossJoin(F.broadcast(nf)).select(
        "node",
        F.round(F.lit(1.0) / F.col("_n"), 12).cast("decimal(14,12)").alias("_h"),
    ).localCheckpoint(eager=True)
    a = None
    for _i in range(iters):
        prev_a = a
        a_raw = (
            e.join(h, e["_s"] == h["node"])
            .groupBy("_d")
            .agg(F.sum(F.col("_w") * F.col("_h")).alias("_ar"))
        )
        a_norm = a_raw.agg(F.sum("_ar").cast("double").alias("_sa"))
        a_pre = (
            a_raw.crossJoin(F.broadcast(a_norm))
            .select(
                F.col("_d").alias("node"),
                F.round(F.col("_ar").cast("double") / F.col("_sa"), 12)
                .cast("decimal(14,12)")
                .alias("_a"),
            )
        )
        probe_step("hits", f"iter{_i + 1}.authority", a_pre)
        a = a_pre.localCheckpoint(eager=True)
        # the superseded authority checkpoint (only the final iteration's
        # `a` is read again, by the return projection) — freeing it here
        # mirrors the hub rotation below, so the loop holds at most one
        # live checkpoint per score vector instead of leaking iters-1
        # cached authority frames per call
        if prev_a is not None:
            prev_a.unpersist()
        h_raw = (
            e.join(a, e["_d"] == a["node"])
            .groupBy("_s")
            .agg(F.sum(F.col("_w") * F.col("_a")).alias("_hr"))
        )
        h_norm = h_raw.agg(F.sum("_hr").cast("double").alias("_sh"))
        h_pre = (
            h_raw.crossJoin(F.broadcast(h_norm))
            .select(
                F.col("_s").alias("node"),
                F.round(F.col("_hr").cast("double") / F.col("_sh"), 12)
                .cast("decimal(14,12)")
                .alias("_h"),
            )
        )
        probe_step("hits", f"iter{_i + 1}.hub", h_pre)
        h_new = h_pre.localCheckpoint(eager=True)
        prev, h = h, h_new
        prev.unpersist()
    hub = h.select("node", F.col("_h").cast("double").alias("hub"))
    auth = a.select("node", F.col("_a").cast("double").alias("authority"))
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
    )
