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
