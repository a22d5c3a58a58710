"""Count-min sketch counter table: one-sided error, linear-sketch merge
identity, empty-sketch edges, maintained top-k across ticks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_adsbx_spark.operators.agg import (
    cms_merge,
    cms_probe,
    cms_table,
    maintained_topk,
)

# Zipf-ish term stream: term t_i appears ~1000/i times
ZIPF = [(f"t{i}", max(1, 1000 // i)) for i in range(1, 201)]


def _stream(spark, pairs=ZIPF):
    rows = [(w,) for w, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "term string")


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "term string, n bigint")


def test_estimates_one_sided_and_bounded(spark):
    df = _stream(spark)
    cms = cms_table(df, "term", width=2048, depth=5)
    keys = spark.createDataFrame([(w,) for w, _ in ZIPF], "term string")
    est = {r["term"]: r["est_n"] for r in cms_probe(keys, cms, "term").collect()}
    truth = dict(ZIPF)
    n_total = sum(truth.values())
    eps_bound = (2.718 / 2048) * n_total  # e/width * N
    for w, true_n in truth.items():
        assert est[w] >= true_n, (w, est[w], true_n)  # never undercounts
        assert est[w] <= true_n + eps_bound, (w, est[w], true_n)


def test_absent_key_estimates_small(spark):
    df = _stream(spark)
    cms = cms_table(df, "term", width=2048, depth=5)
    keys = spark.createDataFrame([("never-seen",)], "term string")
    est = cms_probe(keys, cms, "term").first()["est_n"]
    n_total = sum(n for _, n in ZIPF)
    assert 0 <= est <= (2.718 / 2048) * n_total


def test_merge_equals_build_of_union(spark):
    a, b = ZIPF[:100], ZIPF[100:]
    cms_a = cms_table(_stream(spark, a), "term")
    cms_b = cms_table(_stream(spark, b), "term")
    merged = {
        (r["row"], r["pos"]): r["n"] for r in cms_merge(cms_a, cms_b).collect()
    }
    full = {
        (r["row"], r["pos"]): r["n"]
        for r in cms_table(_stream(spark), "term").collect()
    }
    assert merged == full


def test_weighted_build_equals_stream_build(spark):
    by_stream = {
        (r["row"], r["pos"]): r["n"]
        for r in cms_table(_stream(spark), "term").collect()
    }
    by_counts = {
        (r["row"], r["pos"]): r["n"]
        for r in cms_table(_counts(spark, ZIPF), "term", weight_col="n").collect()
    }
    assert by_stream == by_counts


def test_merge_sizing_mismatch_raises(spark):
    a = cms_table(_stream(spark, ZIPF[:10]), "term", width=1024)
    b = cms_table(_stream(spark, ZIPF[:10]), "term", width=2048)
    with pytest.raises(ValueError, match="sizing mismatch"):
        cms_merge(a, b)


def test_empty_sketch_probe_and_merge_identity(spark):
    empty = cms_table(_stream(spark).where(F.lit(False)), "term")
    keys = spark.createDataFrame([("x",)], "term string")
    assert cms_probe(keys, empty, "term").first()["est_n"] == 0
    real = cms_table(_stream(spark, ZIPF[:20]), "term")
    merged = {(r["row"], r["pos"]): r["n"] for r in cms_merge(real, empty).collect()}
    alone = {(r["row"], r["pos"]): r["n"] for r in real.collect()}
    assert merged == alone


def test_maintained_topk_across_ticks(spark):
    """Three ticks; the all-time top-5 must be recovered even though no
    single tick contains the full counts."""
    tick_pairs = [
        [(f"t{i}", max(1, 400 // i)) for i in range(1, 80)],
        [(f"t{i}", max(1, 300 // i)) for i in range(1, 120)],
        [(f"t{i}", max(1, 300 // i)) for i in range(5, 200)],
    ]
    truth: dict[str, int] = {}
    for pairs in tick_pairs:
        for w, n in pairs:
            truth[w] = truth.get(w, 0) + n
    cms, cand = None, None
    for pairs in tick_pairs:
        topk, cms, cand = maintained_topk(
            _counts(spark, pairs), cms, cand, "term", k=5, candidate_cap=50
        )
        cms = cms.localCheckpoint()
        cand = cand.localCheckpoint()
    got = [(r["term"], r["est_n"]) for r in topk.orderBy(F.col("est_n").desc(), "term").collect()]
    expect_keys = sorted(truth, key=lambda w: (-truth[w], w))[:5]
    assert [w for w, _ in got] == expect_keys, (got, expect_keys)
    for w, est in got:
        assert est >= truth[w]  # estimates stay one-sided through merges


# --- KLL quantile sketches + drift ---------------------------------------

def _vals(spark, values, stratum="s"):
    return spark.createDataFrame(
        [(stratum, float(v)) for v in values], "lang string, v double"
    )


def test_quantile_sketch_accuracy_and_merge(spark):
    from etl_adsbx_spark.operators.agg import (
        merge_quantile_sketches,
        quantile_sketch,
        sketch_quantiles,
    )

    values = list(range(1000))  # uniform 0..999
    full = quantile_sketch(_vals(spark, values), ["lang"], "v")
    q = sketch_quantiles(full, [0.1, 0.5, 0.9], ["lang"]).first()
    assert abs(q["q_0_1"] - 100) < 40
    assert abs(q["q_0_5"] - 500) < 40
    assert abs(q["q_0_9"] - 900) < 40
    # two-tick merge ~ full build
    t1 = quantile_sketch(_vals(spark, values[:500]), ["lang"], "v")
    t2 = quantile_sketch(_vals(spark, values[500:]), ["lang"], "v")
    merged = merge_quantile_sketches(t1, t2, keys=["lang"])
    qm = sketch_quantiles(merged, [0.5], ["lang"]).first()
    assert abs(qm["q_0_5"] - 500) < 40


def test_quantile_drift_detects_shift(spark):
    from etl_adsbx_spark.operators.agg import quantile_drift, quantile_sketch

    base = [i % 100 for i in range(2000)]
    same = quantile_sketch(_vals(spark, base), ["lang"], "v")
    same2 = quantile_sketch(_vals(spark, list(reversed(base))), ["lang"], "v")
    shifted = quantile_sketch(_vals(spark, [v + 50 for v in base]), ["lang"], "v")
    disjoint = quantile_sketch(_vals(spark, [v + 1000 for v in base]), ["lang"], "v")

    d_same = quantile_drift(same, same2, ["lang"]).first()
    assert d_same["drift"] < 0.05, d_same
    assert d_same["n_old"] == 2000.0 and d_same["n_new"] == 2000.0
    d_shift = quantile_drift(same, shifted, ["lang"]).first()["drift"]
    assert 0.3 < d_shift < 0.7, d_shift  # half the mass moved
    d_disj = quantile_drift(same, disjoint, ["lang"]).first()["drift"]
    assert d_disj > 0.95, d_disj


def test_quantile_drift_per_stratum_join(spark):
    from etl_adsbx_spark.operators.agg import quantile_drift, quantile_sketch

    old = _vals(spark, range(100), "en").unionByName(_vals(spark, range(100), "de"))
    new = _vals(spark, range(100), "en").unionByName(
        _vals(spark, [v + 500 for v in range(100)], "de")
    ).unionByName(_vals(spark, range(100), "fr"))  # fr only in new -> omitted
    so = quantile_sketch(old, ["lang"], "v")
    sn = quantile_sketch(new, ["lang"], "v")
    d = {r["lang"]: r["drift"] for r in quantile_drift(so, sn, ["lang"]).collect()}
    assert set(d) == {"en", "de"}
    assert d["en"] < 0.05 and d["de"] > 0.9


def test_theta_set_report_known_overlap(spark):
    from etl_adsbx_spark.operators.agg import theta_set_report, theta_sketch

    old = spark.createDataFrame([("en", i) for i in range(1000)], "lang string, id bigint")
    new = spark.createDataFrame(
        [("en", i) for i in range(500, 1500)], "lang string, id bigint"
    )
    so = theta_sketch(old, ["lang"], "id")
    sn = theta_sketch(new, ["lang"], "id")
    r = theta_set_report(so, sn, ["lang"]).first()
    # theta sketches are exact below their retention threshold (~4k)
    for col, expect in [
        ("n_old", 1000), ("n_new", 1000), ("n_union", 1500),
        ("n_intersection", 500), ("n_added", 500), ("n_removed", 500),
    ]:
        assert abs(r[col] - expect) <= expect * 0.02, (col, r[col], expect)
    assert abs(r["jaccard"] - 1 / 3) < 0.02
    # disjoint strata are omitted, identical sets give jaccard 1
    same = theta_set_report(so, so, ["lang"]).first()
    assert same["jaccard"] == 1.0 and same["n_added"] == 0.0
