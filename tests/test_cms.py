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
