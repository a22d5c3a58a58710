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
