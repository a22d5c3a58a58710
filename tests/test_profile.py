"""Column profiler (operators.agg.profile_columns). The registry row
`column_profile` adds the DuckDB oracle replay of exact mode."""

from __future__ import annotations

import datetime

import pytest

from etl_adsbx_spark.operators.agg import profile_columns


def _df(spark):
    rows = [
        (1, "alpha", 10.0, datetime.datetime(2024, 1, 1)),
        (2, "beta", None, datetime.datetime(2024, 1, 2)),
        (3, None, 30.0, None),
        (4, "beta", 40.0, datetime.datetime(2024, 1, 4)),
        (None, "gamma", 50.5, datetime.datetime(2024, 1, 5)),
    ]
    return spark.createDataFrame(
        rows, "id bigint, name string, score double, ts timestamp"
    )


def test_profile_exact_values(spark):
    out = {r["column"]: r for r in profile_columns(_df(spark)).collect()}
    assert set(out) == {"id", "name", "score", "ts"}
    for r in out.values():
        assert r["n_rows"] == 5

    i = out["id"]
    assert (i["dtype"], i["n_nonnull"], i["n_distinct"]) == ("bigint", 4, 4)
    assert (i["min_num"], i["max_num"], i["avg_num"]) == (1.0, 4.0, 2.5)
    assert i["min_str"] is None and i["max_str"] is None

    n = out["name"]
    assert (n["dtype"], n["n_nonnull"], n["n_distinct"]) == ("string", 4, 3)
    assert (n["min_str"], n["max_str"]) == ("alpha", "gamma")
    assert n["avg_num"] == pytest.approx((5 + 4 + 4 + 5) / 4, abs=1e-9)
    assert n["min_num"] is None and n["max_num"] is None

    s = out["score"]
    assert (s["n_nonnull"], s["n_distinct"]) == (4, 4)
    assert (s["min_num"], s["max_num"]) == (10.0, 50.5)
    assert s["avg_num"] == pytest.approx(32.625, abs=1e-9)

    t = out["ts"]  # non-numeric, non-string: counts only
    assert (t["n_nonnull"], t["n_distinct"]) == (4, 4)
    assert t["min_num"] is None and t["avg_num"] is None and t["min_str"] is None


def test_profile_approx_mode(spark):
    exact = {r["column"]: r for r in profile_columns(_df(spark)).collect()}
    approx = {
        r["column"]: r
        for r in profile_columns(_df(spark), distinct="approx").collect()
    }
    for c, r in approx.items():
        e = exact[c]
        # HLL at these cardinalities is exact-ish; bound generously
        assert abs(r["n_distinct"] - e["n_distinct"]) <= max(1, e["n_distinct"] // 5)
        for f in ("n_rows", "n_nonnull", "min_num", "max_num", "avg_num",
                  "min_str", "max_str"):
            assert r[f] == e[f], (c, f)
    # approx mode's plan has no Expand (the point of the mode)
    plan_a = profile_columns(_df(spark), distinct="approx")._jdf.queryExecution().executedPlan().toString()
    plan_e = profile_columns(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan_a
    assert "Expand" in plan_e


def test_profile_column_subset_and_errors(spark):
    out = profile_columns(_df(spark), ["id"]).collect()
    assert [r["column"] for r in out] == ["id"]
    with pytest.raises(ValueError):
        profile_columns(_df(spark), ["nope"])
    with pytest.raises(ValueError):
        profile_columns(_df(spark), distinct="sketchy")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    r = profile_columns(df).collect()[0]
    assert (r["n_rows"], r["n_nonnull"], r["n_distinct"]) == (2, 0, 0)
    assert r["min_num"] is None and r["avg_num"] is None
