"""End-to-end training-data preparation plan (plans.training): clean →
decontaminate → mix → pack → write, composed from individually-verified
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.plans.training import decontaminate_against, prepare_training_data
from etl_adsbx_spark.tables import load_table

from .conftest import SF_SMALL


def test_decontaminate_against_drops_overlap(spark):
    d = load_table(spark, SF_SMALL, "documents")
    ev = d.filter(F.col("doc_id") % 23 == 0)
    tr = d.filter(F.col("doc_id") % 23 != 0)
    out = decontaminate_against(tr, ev)
    assert out.count() < tr.count()  # synthetic corpus shares shingles
    # no survivor shares a 5-gram with the eval set
    from etl_adsbx_spark.operators.dedup import word_shingles

    evg = ev.select(F.explode(word_shingles("text", 5)).alias("g")).distinct()
    outg = out.select(F.explode(word_shingles("text", 5)).alias("g")).distinct()
    assert outg.join(evg, "g", "left_semi").count() == 0


def test_prepare_training_data_end_to_end(spark, tmp_path):
    d = load_table(spark, SF_SMALL, "documents")
    ev = d.filter(F.col("doc_id") % 23 == 0)
    out_dir = str(tmp_path / "train_corpus")
    final, counts = prepare_training_data(
        spark,
        SF_SMALL,
        out_dir=out_dir,
        eval_docs=ev,
        mix_rates={"src0": 1.0, "src1": 1.0},
        mix_default=0.5,
    )
    # stages only ever shrink the corpus (no mixing weight > 1 here)
    assert (
        counts["input"]
        >= counts["cleaned"]
        >= counts["decontaminated"]
        >= counts["mixed"]
        == counts["written"]
        > 0
    )
    # offsets tile the token stream exactly: sorted by offset, each doc
    # starts where the previous ended, and the total matches the sum
    rows = final.orderBy("start_offset").collect()
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        pos += r.n_tokens
    assert pos == final.agg(F.sum("n_tokens")).first()[0]
    # chunk spans consistent with the 512 budget
    for r in rows:
        assert r.first_chunk == r.start_offset // 512
        assert r.last_chunk == (r.start_offset + r.n_tokens - 1) // 512
    # written corpus is split-partitioned and readable
    import glob

    assert glob.glob(out_dir + "/split=*"), "no split partitions"
    back = spark.read.parquet(out_dir)
    assert back.count() == len(rows)
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }


def test_prepare_training_data_deterministic(spark):
    a, ca = prepare_training_data(spark, SF_SMALL, mix_rates={"src0": 0.5}, mix_default=0.5)
    b, cb = prepare_training_data(spark, SF_SMALL, mix_rates={"src0": 0.5}, mix_default=0.5)
    assert ca == cb
    ra = sorted((r.doc_id, r.start_offset) for r in a.collect())
    rb = sorted((r.doc_id, r.start_offset) for r in b.collect())
    assert ra == rb


def test_prepare_training_data_counts_optional(spark):
    final, counts = prepare_training_data(spark, SF_SMALL, stage_counts=False)
    assert counts == {}
    assert final.count() > 0


def test_prepare_training_data_shuffle_seed(spark, tmp_path):
    """shuffle_seed writes hash-ordered shards: same row multiset as the
    unshuffled corpus, `_order` ascending within every file, and the
    shard order reproducible across writes with the same seed."""
    import glob

    import pyarrow.parquet as pq

    from etl_adsbx_spark.plans.training import prepare_training_data

    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    final, _ = prepare_training_data(
        spark, SF_SMALL, out_dir=out1, stage_counts=False, shuffle_seed=7,
        files_per_partition=2,
    )
    assert "_order" in final.columns
    prepare_training_data(
        spark, SF_SMALL, out_dir=out2, stage_counts=False, shuffle_seed=7,
        files_per_partition=2,
    )
    files1 = sorted(glob.glob(out1 + "/split=*/*.parquet"))
    assert files1
    all_rows = []
    for f in files1:
        t = pq.read_table(f, columns=["doc_id", "_order"])
        orders = t.column("_order").to_pylist()
        assert orders == sorted(orders), f"rows not _order-clustered in {f}"
        all_rows += t.column("doc_id").to_pylist()
    plain, _ = prepare_training_data(spark, SF_SMALL, stage_counts=False)
    assert sorted(all_rows) == sorted(r.doc_id for r in plain.select("doc_id").collect())
    # same seed -> same shard contents
    files2 = sorted(glob.glob(out2 + "/split=*/*.parquet"))
    ids = lambda fs: [  # noqa: E731
        pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist() for f in fs
    ]
    assert ids(files1) == ids(files2)


def test_prepare_training_data_classifier_gate_and_token_budget(spark):
    from etl_adsbx_spark.functions.classify import fit_quality_classifier
    from etl_adsbx_spark.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    w, _ = fit_quality_classifier(
        d.withColumn("label", (F.col("lang") == "en").cast("int")), "label", steps=20
    )
    base, base_counts = prepare_training_data(spark, SF_SMALL)
    gated, counts = prepare_training_data(
        spark, SF_SMALL, classifier_weights=w, classifier_min=0.5
    )
    assert counts["classifier_gated"] <= base_counts["cleaned"]
    assert gated.count() == counts["classifier_gated"]
    # gated output is a subset of the ungated run
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    gated_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert gated_ids <= base_ids

    budget = 2000
    sel, scounts = prepare_training_data(spark, SF_SMALL, select_budget=budget)
    assert scounts["budget_selected"] < base_counts["cleaned"]
    assert sel.agg(F.sum("n_tokens")).first()[0] <= budget
    # offsets re-tile contiguously over the selected set
    assert sel.agg(F.max(F.col("start_offset") + F.col("n_tokens"))).first()[0] == (
        sel.agg(F.sum("n_tokens")).first()[0]
    )
    # budget selection keeps the BEST-quality docs: min kept quality >=
    # max dropped quality (modulo the boundary doc that crossed the budget)
    kept_q = sel.select("doc_id").join(base, "doc_id", "left_semi")
    assert kept_q.count() == scounts["budget_selected"]
