"""Deterministic sampling / dataset mixing (operators.sampling). The
stratified decision columns are also driver-oracle-checked via
`text_stats` (mix_rate / mix_keep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.operators.sampling import (
    RESOLUTION,
    hash_sample,
    sample_bucket,
    stratified_sample,
    weighted_mix,
)
from etl_adsbx_spark.tables import load_table

from .conftest import SF_SMALL


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_hash_sample_deterministic_and_nested(spark):
    d = _docs(spark)
    a = {r.doc_id for r in hash_sample(d, 0.5, "doc_id").select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(d, 0.5, "doc_id").select("doc_id").collect()}
    assert a == b
    # monotone nesting: a 0.2 sample is a subset of the 0.5 sample
    c = {r.doc_id for r in hash_sample(d, 0.2, "doc_id").select("doc_id").collect()}
    assert c <= a
    n = d.count()
    assert 0.35 * n < len(a) < 0.65 * n  # tolerance at ~500 rows


def test_hash_sample_stable_under_data_growth(spark):
    """Adding rows never flips the decision for existing rows (the
    property rand()-based sampling lacks)."""
    d = _docs(spark)
    half = d.limit(200)
    kept_half = {r.doc_id for r in hash_sample(half, 0.5, "doc_id").select("doc_id").collect()}
    kept_all = {r.doc_id for r in hash_sample(d, 0.5, "doc_id").select("doc_id").collect()}
    half_ids = {r.doc_id for r in half.select("doc_id").collect()}
    assert kept_half == kept_all & half_ids


def test_stratified_rates_dict_and_df_agree(spark):
    d = _docs(spark)
    rates = {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.5}
    via_dict = stratified_sample(d, rates, "lang", "doc_id", default=0.25)
    rates_df = spark.createDataFrame(
        [(k, v) for k, v in rates.items()], ["lang", "rate"]
    )
    via_df = stratified_sample(d, rates_df, "lang", "doc_id", default=0.25)
    a = {r.doc_id for r in via_dict.select("doc_id").collect()}
    b = {r.doc_id for r in via_df.select("doc_id").collect()}
    assert a == b
    # en is kept in full; other strata actually subsample
    n_en = d.filter(F.col("lang") == "en").count()
    assert via_dict.filter(F.col("lang") == "en").count() == n_en
    assert via_dict.count() < d.count()


def test_stratified_sample_independent_of_split(spark):
    """The mixing salt and the train/val/test split hash are different md5
    domains — the sample must not preferentially eat one split."""
    from etl_adsbx_spark.functions.text import split_assign

    d = _docs(spark).withColumn("split", split_assign("doc_id"))
    kept = stratified_sample(d, {"en": 0.5}, "lang", "doc_id", default=0.5)
    full = {r.split: r.c for r in d.groupBy("split").agg(F.count("*").alias("c")).collect()}
    samp = {r.split: r.c for r in kept.groupBy("split").agg(F.count("*").alias("c")).collect()}
    # train keeps roughly half; tolerance wide (binomial at ~450 rows)
    assert 0.35 < samp["train"] / full["train"] < 0.65


def test_weighted_mix_upsamples(spark):
    d = _docs(spark).select("doc_id", "lang", "text")
    n = d.count()
    mix = weighted_mix([(d, 2.3)], "doc_id")
    m = mix.count()
    assert 2.1 * n < m < 2.5 * n
    # every row has >= 2 copies, _rep distinguishes them
    per_key = mix.groupBy("doc_id").agg(
        F.count("*").alias("c"), F.countDistinct("_rep").alias("r")
    )
    assert per_key.filter((F.col("c") < 2) | (F.col("c") != F.col("r"))).count() == 0


def test_weighted_mix_multi_source_downsample(spark):
    d = _docs(spark).select("doc_id", "lang", "text")
    en = d.filter(F.col("lang") == "en")
    rest = d.filter(F.col("lang") != "en")
    mix = weighted_mix([(en, 1.0), (rest, 0.5)], "doc_id")
    n_en, n_rest = en.count(), rest.count()
    got_en = mix.filter(F.col("lang") == "en").count()
    got_rest = mix.count() - got_en
    assert got_en == n_en
    assert 0.3 * n_rest < got_rest < 0.7 * n_rest
    assert mix.columns == en.columns + ["_rep"]


def test_sample_bucket_range(spark):
    d = _docs(spark).select(sample_bucket("doc_id").alias("b"))
    mn, mx = d.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < RESOLUTION


def test_quantile_filter_per_stratum_fraction(spark):
    from etl_adsbx_spark.functions.text import quality_score
    from etl_adsbx_spark.operators.sampling import quantile_filter

    d = _docs(spark).withColumn("q", quality_score("text"))
    kept = quantile_filter(d, "q", 0.3, ["lang"])
    full = {r.lang: r.c for r in d.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    got = {r.lang: r.c for r in kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, n in full.items():
        frac = got.get(lang, 0) / n
        # >= keep_frac (ties kept), bounded above (quality scores tie a lot
        # on short synthetic docs, so allow a generous ceiling)
        assert 0.25 <= frac <= 0.6, (lang, frac)
    # every kept row beats every dropped row within its stratum (threshold
    # filter semantics: kept min >= stratum threshold > dropped max is not
    # guaranteed for approx sketches at ties, so assert against the kept min)
    mins = {r.lang: r.m for r in kept.groupBy("lang").agg(F.min("q").alias("m")).collect()}
    dropped = d.join(kept.select("doc_id"), "doc_id", "left_anti")
    bad = dropped.join(
        spark.createDataFrame([(k, v) for k, v in mins.items()], ["lang", "kmin"]),
        "lang",
    ).where(F.col("q") > F.col("kmin"))
    assert bad.count() == 0


def test_quantile_filter_global_and_plan_shape(spark):
    from etl_adsbx_spark.functions.text import quality_score
    from etl_adsbx_spark.operators.sampling import quantile_filter

    d = _docs(spark).withColumn("q", quality_score("text"))
    kept = quantile_filter(d, "q", 0.5)
    n = d.count()
    assert 0.4 * n <= kept.count() <= 0.75 * n
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # threshold-broadcast, never percent_rank
    assert "Broadcast" in plan


def test_distinct_sketch_mergeable_and_accurate(spark):
    """Sketch-per-tick + union must estimate within HLL error of the true
    cross-tick distinct count, and merging must be order-insensitive."""
    from pyspark.sql import functions as F

    from etl_adsbx_spark.operators.agg import (
        distinct_sketch,
        merge_distinct_sketches,
        sketch_estimate,
    )

    t1 = spark.range(0, 6000).select((F.col("id") % 3).alias("g"), F.col("id").alias("u"))
    t2 = spark.range(3000, 9000).select((F.col("id") % 3).alias("g"), F.col("id").alias("u"))
    s1 = distinct_sketch(t1, ["g"], "u").localCheckpoint()
    s2 = distinct_sketch(t2, ["g"], "u").localCheckpoint()
    merged = merge_distinct_sketches(s1, s2, keys=["g"])
    est = {r.g: r.n_distinct for r in sketch_estimate(merged, ["g"]).collect()}
    # true: ids 0..8999 split by mod 3 -> 3000 distinct per group
    for g in (0, 1, 2):
        assert abs(est[g] - 3000) / 3000 < 0.05, est
    # merge order must not matter
    est2 = {
        r.g: r.n_distinct
        for r in sketch_estimate(merge_distinct_sketches(s2, s1, keys=["g"]), ["g"]).collect()
    }
    assert est == est2
    # global (no-key) form
    g = merge_distinct_sketches(
        distinct_sketch(t1, None, "u").localCheckpoint(),
        distinct_sketch(t2, None, "u").localCheckpoint(),
    )
    n = sketch_estimate(g).collect()[0].n_distinct
    assert abs(n - 9000) / 9000 < 0.05


def test_exact_k_sample_per_stratum(spark):
    from etl_adsbx_spark.operators.sampling import exact_k_sample, sample_rank

    d = _docs(spark)
    out = exact_k_sample(d, 7, "doc_id", strata_cols=["lang"])
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    truth = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {k: min(7, v) for k, v in truth.items()}
    # selection = the k lowest (rank, key) per stratum — brute-force check
    ranked = d.select("doc_id", "lang", sample_rank("doc_id").alias("r")).collect()
    expect: dict[str, list] = {}
    for row in sorted(ranked, key=lambda x: (x["r"], str(x["doc_id"]))):
        expect.setdefault(row["lang"], [])
        if len(expect[row["lang"]]) < 7:
            expect[row["lang"]].append(row["doc_id"])
    got = {
        r["lang"]: r["ids"]
        for r in out.groupBy("lang").agg(F.collect_set("doc_id").alias("ids")).collect()
    }
    assert {k: set(v) for k, v in got.items()} == {k: set(v) for k, v in expect.items()}


def test_exact_k_sample_invariant_under_partitioning_and_shards(spark):
    from etl_adsbx_spark.operators.sampling import exact_k_sample

    d = _docs(spark)
    a = {r["doc_id"] for r in exact_k_sample(d, 9, "doc_id", ["source"]).collect()}
    b = {
        r["doc_id"]
        for r in exact_k_sample(d.repartition(13), 9, "doc_id", ["source"], shards=3).collect()
    }
    assert a == b


def test_exact_k_sample_global(spark):
    from etl_adsbx_spark.operators.sampling import exact_k_sample

    d = _docs(spark)
    out = exact_k_sample(d, 5, "doc_id")
    assert out.count() == 5
    assert out.columns == d.columns  # sample keeps the input schema


def test_skew_report_flags_hot_key(spark):
    from etl_adsbx_spark.operators.skew import skew_report

    rows = [(i, "hot" if i % 10 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    rep = skew_report(df, ["k"], top_n=5).collect()
    assert rep[0]["k"] == "hot" and rep[0]["n_rows"] == 900
    assert abs(rep[0]["frac"] - 0.9) < 1e-9
    by_k = {r["k"]: r for r in rep}
    assert by_k["cold"]["n_rows"] == 100
    r0 = rep[0]
    assert r0["total_rows"] == 1000 and r0["n_keys"] == 2
    assert r0["max_rows_per_key"] == 900
    assert abs(r0["max_frac"] - 0.9) < 1e-9
    assert r0["mean_rows_per_key"] == 500.0


def test_weighted_k_sample_contract_and_determinism(spark):
    from etl_adsbx_spark.operators.sampling import weighted_k_sample

    rows = [(i, "s", 1.0 if i else 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, "id bigint, grp string, w double")
    out = weighted_k_sample(df, 5, "id", "w", ["grp"])
    ids = {r["id"] for r in out.collect()}
    assert len(ids) == 5 and 0 not in ids  # zero-weight row excluded
    assert out.columns == df.columns
    again = {
        r["id"]
        for r in weighted_k_sample(df.repartition(7), 5, "id", "w", ["grp"], shards=3).collect()
    }
    assert again == ids
    # k larger than positive-weight population: all positive rows, no 0-weight
    all_pos = {r["id"] for r in weighted_k_sample(df, 50, "id", "w", ["grp"]).collect()}
    assert all_pos == set(range(1, 20))


def test_weighted_k_sample_favors_heavy_weights(spark):
    """One heavy item (w=200) among 20 light (w=1): across 40 salts it
    must be sampled (k=3) far more often than any light item — and the
    empirical inclusion rate must be near the E-S theoretical one."""
    from etl_adsbx_spark.operators.sampling import weighted_k_sample

    rows = [(0, 200.0)] + [(i, 1.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    heavy = 0
    for s in range(40):
        ids = {
            r["id"]
            for r in weighted_k_sample(df, 3, "id", "w", salt=f"t{s}").collect()
        }
        assert len(ids) == 3
        heavy += 0 in ids
    # P(heavy in top-3) ~ 1 - (light mass winning 3 straight) ≈ ~1
    assert heavy >= 36, heavy


def test_quantile_filter_exact_mode_matches_numpy(spark):
    """exact=True (the oracle-graded config) computes the interpolated
    (n−1)·p percentile — per-stratum thresholds must equal numpy's
    linear-interpolation percentile bit-for-bit (integer scores + dyadic
    p keep every step exact in double), and the kept set is exactly the
    rows at-or-above the threshold."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_adsbx_spark.operators.sampling import quantile_filter
    from etl_adsbx_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    keep = 0.75
    kept = {
        r["doc_id"]
        for r in quantile_filter(d, "n_chars", keep, ["lang"], exact=True).collect()
    }
    rows = d.collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    thr = {
        lang: float(np.percentile(np.array(v, dtype=np.float64), 25.0))
        for lang, v in by_lang.items()
    }
    want = {r["doc_id"] for r in rows if r["n_chars"] >= thr[r["lang"]]}
    assert kept == want


def test_dsir_log_weights_matches_python_reference(spark):
    """dsir_log_weights ≡ a pure-Python DSIR reference (hashed
    unigram+bigram bag models, add-one smoothing, round-6 HALF_UP
    per-bucket ratios summed per doc), and the intended signal holds:
    per-feature weights of target-language docs strictly exceed the
    others'."""
    import hashlib
    import math
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal

    from etl_adsbx_spark.operators.sampling import dsir_log_weights

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the cat food"),
        (3, "de", "der hund und die katze"),
        (4, "fr", "le chat et le chien"),
        (5, "en", "cat cat cat"),
        (6, "de", "die katze sitzt auf der matte"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            df, F.col("lang") == "en", m=64, carry=["lang"]
        ).collect()
    }

    m = 64

    def feats(text: str) -> list[int]:
        t = _re.split(r"\s+", text.strip().lower())
        fs = list(t) + [f"{a} {b}" for a, b in zip(t, t[1:])]
        return [int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % m for f in fs]

    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _id, lang, text in rows:
        for b in feats(text):
            rc[b] = rc.get(b, 0) + 1
            if lang == "en":
                tc[b] = tc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())

    def w(b: int) -> Decimal:
        v = math.log((tc.get(b, 0) + 1) / (tt + m)) - math.log(
            (rc.get(b, 0) + 1) / (rt + m)
        )
        return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    for _id, lang, text in rows:
        fs = feats(text)
        assert out[_id]["n_feats"] == len(fs)
        assert out[_id]["lang"] == lang
        assert abs(out[_id]["dsir_logweight"] - float(sum(w(b) for b in fs))) < 1e-9
    en = [
        out[i]["dsir_logweight"] / out[i]["n_feats"] for i, l, _ in rows if l == "en"
    ]
    other = [
        out[i]["dsir_logweight"] / out[i]["n_feats"] for i, l, _ in rows if l != "en"
    ]
    assert min(en) > max(other), (en, other)


def test_dsir_xxhash_mode(spark):
    """The production hash path: same shape and n_feats, finite weights,
    different bucket assignment than the portable-md5 default."""
    from etl_adsbx_spark.operators.sampling import dsir_log_weights

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "de", "der hund und die katze"),
        (3, "en", "the dog ate the cat food"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    a = {r["doc_id"]: r for r in dsir_log_weights(df, F.col("lang") == "en", m=64).collect()}
    b = {r["doc_id"]: r for r in dsir_log_weights(df, F.col("lang") == "en", m=64, hash="xxhash64").collect()}
    assert set(a) == set(b) == {1, 2, 3}
    for i in a:
        assert a[i]["n_feats"] == b[i]["n_feats"]
        assert b[i]["dsir_logweight"] is not None


def test_mixture_allocation_python_reference(spark):
    """Temperature mixing ≡ a pure-Python Decimal reference on a skewed
    3-source frame, plus the flattening property: tau=0.7 moves share
    from the head source to the tail ones."""
    from decimal import ROUND_HALF_UP, Decimal

    from etl_adsbx_spark.operators.sampling import mixture_allocation

    rows = [(i, "web" if i < 80 else ("books" if i < 95 else "code"), 100 + i)
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    out = {r["group"]: r for r in mixture_allocation(
        df, "source", "n_chars", temperature=0.7, budget=1_000_000
    ).collect()}

    def r6(v: float) -> Decimal:
        return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    toks = {}
    for _, s, n in rows:
        toks[s] = toks.get(s, 0) + n
    tot = sum(toks.values())
    raw = {s: r6(n / tot) for s, n in toks.items()}
    w = {s: r6(float(raw[s]) ** 0.7) for s in toks}
    wt = sum(w.values())
    for s in toks:
        r = out[s]
        ts = r6(float(w[s]) / float(wt))
        alloc = int((ts * 1_000_000).quantize(Decimal(1), ROUND_HALF_UP))
        assert r["n_tokens"] == toks[s]
        assert Decimal(repr(r["raw_share"])) == raw[s], s
        assert Decimal(repr(r["temp_share"])) == ts, s
        assert r["alloc_tokens"] == alloc, s
        assert Decimal(repr(r["sample_rate"])) == r6(alloc / toks[s]), s
    # flattening: the head source's tempered share < its raw share,
    # every tail source's tempered share > its raw share
    assert out["web"]["temp_share"] < out["web"]["raw_share"]
    for s in ("books", "code"):
        assert out[s]["temp_share"] > out[s]["raw_share"]
