"""Weighted fair crawl-budget allocation (functions/url.allocate_budget,
Hamilton largest-remainder apportionment): the properties that make it
the RIGHT primitive — exact budget conservation, quota ∈ {floor,
floor+1} of the proportional share, determinism under repartitioning —
over weight shapes a float-rounding allocator fails on."""

from __future__ import annotations

import math

from etl_adsbx_spark.functions.url import allocate_budget


def _check(spark, weights: dict[str, int], budget: int) -> None:
    df = spark.createDataFrame(
        list(weights.items()), "host string, weight bigint"
    )
    out = {r["host"]: r for r in allocate_budget(df, budget).collect()}
    W = sum(weights.values())
    assert sum(r["quota"] for r in out.values()) == budget, (weights, budget)
    for h, wt in weights.items():
        ideal = budget * wt / W
        q = out[h]["quota"]
        assert q in (math.floor(ideal), math.floor(ideal) + 1), (h, ideal, q)
        assert out[h]["base_quota"] == (budget * wt) // W
        assert out[h]["extra"] in (0, 1)
    # determinism under repartitioning (no RNG, content-derived order)
    again = {r["host"]: r["quota"]
             for r in allocate_budget(df.repartition(7), budget).collect()}
    assert again == {h: r["quota"] for h, r in out.items()}


def test_allocate_budget_properties(spark):
    # skewed weights, prime budget -> remainders decide real slots
    _check(spark, {f"h{i}.example.com": 1 + (i * i) % 13 for i in range(9)}, 97)
    # uniform weights with a budget that does NOT divide evenly:
    # ties broken by host name, still budget-exact
    _check(spark, {f"h{i}.example.com": 5 for i in range(7)}, 24)
    # one dominant host must not starve the tail below its floor share
    _check(spark, {"big.example.com": 10_000, "a.example.com": 1,
                   "b.example.com": 1}, 11)
    # budget smaller than host count: only the largest remainders fetch
    _check(spark, {f"h{i}.example.com": 2 + i for i in range(10)}, 3)
