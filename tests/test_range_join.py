"""Brute-force checks for the range-join family: the keyless pair join
(retired from the graded registry row for its quadratic output — this test
is now its correctness home), the equi-keyed variant, and the per-bucket
count convolution (`range_pair_counts`)."""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows, side):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=s), u) for i, (s, u) in enumerate(rows)],
        f"{side}_id long, {side}_ts timestamp, user_id long",
    )


evt = st.tuples(st.integers(0, 7200), st.integers(0, 3))


@settings(max_examples=12, deadline=None)
@given(st.lists(evt, max_size=25), st.lists(evt, max_size=25))
def test_bucketed_range_join_matches_brute_force(spark, lrows, rrows):
    """Keyless and user-keyed bucketed range joins vs a pure-Python O(n·m)
    scan, ±10 min window, hour buckets (window < bucket, the worst case
    for the explode coverage logic)."""
    from etl_adsbx_spark.operators.joins import bucketed_range_join

    left, right = _mk(spark, lrows, "l"), _mk(spark, rrows, "r")
    w = 600
    expect = {
        (i, j)
        for i, (ls, _) in enumerate(lrows)
        for j, (rs, _) in enumerate(rrows)
        if ls - w <= rs <= ls + w
    }
    got = {
        (r["l_id"], r["r_id"])
        for r in bucketed_range_join(
            left.drop("user_id"), right.drop("user_id"),
            "l_ts", "r_ts", "10 MINUTE", "10 MINUTE", "hour",
        ).collect()
    }
    assert got == expect

    expect_keyed = {
        (i, j)
        for i, (ls, lu) in enumerate(lrows)
        for j, (rs, ru) in enumerate(rrows)
        if lu == ru and ls - w <= rs <= ls + w
    }
    got_keyed = {
        (r["l_id"], r["r_id"])
        for r in bucketed_range_join(
            left, right, "l_ts", "r_ts", "10 MINUTE", "10 MINUTE", "hour",
            extra_keys=["user_id"],
        ).collect()
    }
    assert got_keyed == expect_keyed


@settings(max_examples=12, deadline=None)
@given(st.lists(evt, max_size=25), st.lists(evt, max_size=25))
def test_range_pair_counts_matches_brute_force(spark, lrows, rrows):
    """Minute-bucket pair-count convolution vs brute force at the same
    declared granularity: pairs whose minute buckets are ≤ 10 apart,
    grouped by the left bucket."""
    from etl_adsbx_spark.operators.joins import range_pair_counts

    left, right = _mk(spark, lrows, "l"), _mk(spark, rrows, "r")
    expect: dict[int, int] = {}
    for ls, _ in lrows:
        lb = ls // 60
        n = sum(1 for rs, _ in rrows if abs(rs // 60 - lb) <= 10)
        if n:
            expect[lb] = expect.get(lb, 0) + n
    got = {
        int((r["bucket_ts"] - BASE).total_seconds()) // 60: r["n_pairs"]
        for r in range_pair_counts(
            left, right, "l_ts", "r_ts", window_buckets=10, bucket_unit="minute"
        ).collect()
    }
    assert got == expect


def test_geo_radius_join_equals_brute_force_adversarial(spark):
    """Grid radius join ≡ brute-force haversine cross join on coordinates
    chosen to break naive gridding: near-polar sites (longitude cells
    shrink to nothing — reach must widen to the whole ring), dateline-
    seam pairs (cell index must wrap via pmod), and exact cell-boundary
    points. Any missed pair fails the set comparison."""
    from etl_adsbx_spark.functions.scalar import haversine_km
    from etl_adsbx_spark.operators.joins import geo_radius_join

    pts = [
        (1, 89.4, 10.0), (2, 89.2, -170.0), (3, -89.5, 45.0),   # polar
        (4, 0.1, 179.9), (5, -0.2, -179.8), (6, 0.0, 180.0 - 1e-9),  # seam
        (7, 45.0, 0.0), (8, 45.0, 5.0), (9, 44.999999, 4.999999),  # boundary
        (10, 50.0, 120.0), (11, -33.3, -71.2), (12, 89.9, -5.0),
    ]
    sites = [
        (101, 89.5, -120.0),    # near-pole: every longitude is close
        (102, -0.1, -179.95),   # seam site
        (103, 45.0, 4.0),
        (104, -89.0, 130.0),
        (105, 52.0, 119.0),
    ]
    p = spark.createDataFrame(pts, "pid bigint, lat double, lon double")
    s = spark.createDataFrame(sites, "sid bigint, slat double, slon double")
    for radius in (300.0, 1500.0):
        got = {
            (r["sid"], r["pid"])
            for r in geo_radius_join(
                p, s, radius_km=radius, cell_deg=5.0,
                point_coords=("lat", "lon"), site_coords=("slat", "slon"),
            ).collect()
        }
        brute = {
            (r["sid"], r["pid"])
            for r in p.crossJoin(s)
            .withColumn(
                "d",
                F.round(haversine_km(F.col("lat"), F.col("lon"),
                                     F.col("slat"), F.col("slon")), 4),
            )
            .where(F.col("d") <= radius)
            .collect()
        }
        assert got == brute, (radius, got ^ brute)


def test_geo_radius_join_rejects_non_divisor_cell(spark):
    """``cell_deg`` must divide 360 exactly or the pmod longitude wrap
    misaligns at the antimeridian and seam pairs can be lost (round-6
    advice) — reject up front; divisors still work."""
    import pytest

    from etl_adsbx_spark.operators.joins import geo_radius_join

    pts = spark.createDataFrame([(0.0, 179.9)], ["lat", "lon"])
    sites = spark.createDataFrame([(0.0, -179.9)], ["slat", "slon"])
    with pytest.raises(ValueError, match="divide 360"):
        geo_radius_join(pts, sites, 50.0, cell_deg=7.0, site_coords=("slat", "slon"))
    # a valid non-integer divisor still catches the seam-crossing pair
    out = geo_radius_join(
        pts, sites, 50.0, cell_deg=2.5, site_coords=("slat", "slon")
    ).collect()
    assert len(out) == 1 and out[0]["dist_km"] < 50.0
