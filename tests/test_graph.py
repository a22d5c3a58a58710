"""Link-graph PageRank (operators.graph): pure-Python Decimal reference
parity, symmetrization semantics, mass conservation, and
checkpointed ≡ lazy plan independence. The registry row
`domain_pagerank` adds the full DuckDB chained-CTE oracle replay."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from etl_adsbx_spark.operators.graph import pagerank, symmetrize_edges

EDGES = [
    # a 6-node undirected graph: ring 0-1-2-3-4-5 plus chords and a
    # duplicate edge (multiplicity -> weight 2) and a self-loop
    ("n0", "n1"),
    ("n1", "n2"),
    ("n2", "n3"),
    ("n3", "n4"),
    ("n4", "n5"),
    ("n5", "n0"),
    ("n0", "n3"),
    ("n1", "n4"),
    ("n1", "n4"),
    ("n2", "n2"),
]


def _q(x: float | Decimal, dp: int) -> Decimal:
    d = Decimal(repr(x)) if isinstance(x, float) else x
    return d.quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP)


def ref_pagerank(directed: list[tuple[str, str]], iters: int = 5) -> dict[str, Decimal]:
    """Mirror of pagerank()'s decimal contract, in pure Python."""
    w: dict[tuple[str, str], int] = defaultdict(int)
    for s, t in directed:
        w[(s, t)] += 1
    ow: dict[str, int] = defaultdict(int)
    for (s, _t), c in w.items():
        ow[s] += c
    p = {(s, t): _q(c / ow[s], 10) for (s, t), c in w.items()}
    n = len(ow)
    base = _q(0.15 / n, 12)
    r = {v: _q(1.0 / n, 12) for v in ow}
    for _ in range(iters):
        c: dict[str, Decimal] = defaultdict(lambda: Decimal(0))
        for (s, t), pv in p.items():
            c[t] += pv * r[s]
        r = {v: _q(base + _q(cv, 12) * Decimal("0.85"), 12) for v, cv in c.items()}
    return r


def _sym(directed: list[tuple[str, str]]) -> list[tuple[str, str]]:
    return directed + [(t, s) for s, t in directed if s != t]


def test_symmetrize_edges(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(
        (r["src"], r["dst"]) for r in symmetrize_edges(df).collect()
    )
    assert got == sorted(_sym(EDGES))
    # the self-loop appears exactly once
    assert got.count(("n2", "n2")) == 1


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = {
        r["node"]: r["pagerank"]
        for r in pagerank(symmetrize_edges(df), iters=5).collect()
    }
    want = ref_pagerank(_sym(EDGES), iters=5)
    assert set(out) == set(want)
    for v, d in want.items():
        assert abs(out[v] - float(d)) < 1e-15, (v, out[v], d)
    # symmetrized graph: total mass conserved up to per-step rounding
    # (dominated by the 10-dp transition probabilities: 1/3 -> 3.3e-11
    # per edge term, compounding over iterations)
    assert abs(sum(out.values()) - 1.0) < 1e-8


def test_pagerank_weighted_equals_multiplicity(spark):
    """A pre-aggregated weighted edge list ranks identically to the same
    edges given as duplicated rows."""
    df = spark.createDataFrame(_sym(EDGES), "src string, dst string")
    agg = df.groupBy("src", "dst").agg(F.count("*").alias("w"))
    a = {r["node"]: r["pagerank"] for r in pagerank(df, iters=4).collect()}
    b = {
        r["node"]: r["pagerank"]
        for r in pagerank(agg, iters=4, weight="w").collect()
    }
    assert a == b


def test_pagerank_lazy_equals_checkpointed(spark):
    df = spark.createDataFrame(_sym(EDGES), "src string, dst string")
    a = {r["node"]: r["pagerank"] for r in pagerank(df, iters=3).collect()}
    b = {
        r["node"]: r["pagerank"]
        for r in pagerank(df, iters=3, checkpoint=False).collect()
    }
    assert a == b


def test_pagerank_nondefault_damping_conserves_mass(spark):
    """The teleport term derives from ``damping`` (base = (1-d)/n), so the
    rank vector sums to 1 for ANY damping — the round-6 advice bug was a
    hardcoded 0.15 teleport that broke every damping except 0.85."""
    df = spark.createDataFrame(_sym(EDGES), "src string, dst string")
    for d in ("0.50", "0.85", "0.95"):
        out = {
            r["node"]: r["pagerank"]
            for r in pagerank(df, iters=6, damping=d, checkpoint=False).collect()
        }
        assert abs(sum(out.values()) - 1.0) < 1e-8, (d, sum(out.values()))


def test_pagerank_rejects_out_of_range_damping(spark):
    df = spark.createDataFrame(_sym(EDGES), "src string, dst string")
    import pytest

    for d in ("0", "1", "1.5"):
        with pytest.raises(ValueError):
            pagerank(df, iters=1, damping=d)
    # >2-dp damping would be silently rounded by the DECIMAL(3,2) rank
    # update (0.855 -> 0.86) while the teleport base used the unrounded
    # value, breaking base + d*1 = 1 — rejected instead
    for d in ("0.855", "0.1234"):
        with pytest.raises(ValueError, match="2 decimal places"):
            pagerank(df, iters=1, damping=d)


# ---------------------------------------------------------------------------
# triangle_stats


def ref_triangles(undirected: list[tuple[str, str]]) -> dict[str, tuple[int, int]]:
    """Brute-force per-node (degree, triangle-count) over the deduped
    simple graph — O(n^3), fine for fixtures."""
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in undirected:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)
    tri = {v: 0 for v in nodes}
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y not in adj[x]:
                continue
            for z in nodes:
                if z > y and z in adj[x] and z in adj[y]:
                    for v in (x, y, z):
                        tri[v] += 1
    return {v: (len(adj[v]), tri[v]) for v in nodes}


def test_triangle_stats_matches_bruteforce(spark):
    from etl_adsbx_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_stats(df).collect()
    }
    ref = ref_triangles(EDGES)
    assert set(got) == set(ref)
    for v, (d, t) in ref.items():
        gd, gt, gc = got[v]
        assert (gd, gt) == (d, t), v
        want = round(2.0 * t / (d * (d - 1)), 8) if d >= 2 else 0.0
        assert gc == want, v


def test_triangle_stats_counts_each_triangle_once(spark):
    """K4 has exactly 4 triangles; every node sits on C(3,2)=3 of them
    and has clustering 1.0. Reverse/duplicate edges must not inflate."""
    from etl_adsbx_spark.operators.graph import triangle_stats

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    noisy = k4 + [(b, a) for a, b in k4] + k4[:3] + [("a", "a")]
    rows = triangle_stats(spark.createDataFrame(noisy, ["src", "dst"])).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["degree"] == 3
        assert r["triangles"] == 3
        assert r["clustering"] == 1.0


def test_triangle_stats_triangle_free_graph(spark):
    """A star (bipartite) has zero triangles everywhere; leaves (d=1)
    get clustering 0.0 by the d<2 convention."""
    from etl_adsbx_spark.operators.graph import triangle_stats

    star = [("hub", f"leaf{i}") for i in range(5)]
    rows = triangle_stats(spark.createDataFrame(star, ["src", "dst"])).collect()
    assert all(r["triangles"] == 0 and r["clustering"] == 0.0 for r in rows)
    assert {r["degree"] for r in rows} == {1, 5}


# ---------------------------------------------------------------------------
# hits


def ref_hits(directed: list[tuple[str, str]], iters: int = 4):
    """Mirror of hits()'s decimal contract in pure Python: exact decimal
    update sums, L1 norm = exact decimal sum cast to float once, division
    in float, round-half-up to 12 dp."""
    w: dict[tuple[str, str], int] = defaultdict(int)
    for s, t in directed:
        w[(s, t)] += 1
    nodes = sorted({s for s, _ in w} | {t for _, t in w})
    n = len(nodes)
    h = {v: _q(1.0 / n, 12) for v in nodes}
    a: dict[str, Decimal] = {}
    for _ in range(iters):
        ar: dict[str, Decimal] = defaultdict(lambda: Decimal(0))
        for (s, t), c in w.items():
            if s in h:
                ar[t] += c * h[s]
        sa = float(sum(ar.values()))
        a = {v: _q(float(x) / sa, 12) for v, x in ar.items()}
        hr: dict[str, Decimal] = defaultdict(lambda: Decimal(0))
        for (s, t), c in w.items():
            if t in a:
                hr[s] += c * a[t]
        sh = float(sum(hr.values()))
        h = {v: _q(float(x) / sh, 12) for v, x in hr.items()}
    return (
        {v: float(h.get(v, Decimal(0))) for v in nodes},
        {v: float(a.get(v, Decimal(0))) for v in nodes},
    )


def test_hits_matches_python_reference(spark):
    from etl_adsbx_spark.operators.graph import hits

    directed = [
        ("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a3"),
        ("h3", "a2"), ("h1", "a1"),  # duplicate edge -> weight 2
        ("a1", "a2"),                # a node that is both hub and authority
    ]
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(spark.createDataFrame(directed, ["src", "dst"]), iters=4).collect()}
    rh, ra = ref_hits(directed, iters=4)
    assert set(got) == set(rh)
    for v in rh:
        assert got[v] == (rh[v], ra[v]), v


def test_hits_l1_norms_and_zero_sides(spark):
    """After each full iteration hub and authority are L1-normalized (sum
    ~ 1 up to 12-dp rounding); pure sources have authority 0, pure sinks
    hub 0, and every endpoint appears exactly once."""
    from etl_adsbx_spark.operators.graph import hits

    directed = [("s", "m"), ("m", "t"), ("s", "t")]
    rows = hits(spark.createDataFrame(directed, ["src", "dst"]), iters=3).collect()
    by = {r["node"]: r for r in rows}
    assert len(rows) == 3
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-9
    assert by["s"]["authority"] == 0.0
    assert by["t"]["hub"] == 0.0


def test_hits_rejects_bad_iters(spark):
    from etl_adsbx_spark.operators.graph import hits
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hits(spark.createDataFrame(EDGES, ["src", "dst"]), iters=0)
