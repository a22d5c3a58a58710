"""Scale probe for the tokenizer/classifier/sampling operators added in
round 4: BPE fit (word-freq shuffle + driver merge loop), BPE encode
(Arrow kernel throughput), logistic-regression quality fit (per-step agg
jobs) and map-side scoring, exact-k stratified sampling. Measures sf0.1
vs sf1 (10x docs) medians, one JSON line — appended to BASELINE.md.

Usage: python scripts/probe_tokenizer_classifier.py [target_dir] [base_dir]
base_dir defaults to /root/testdata/sf0.1 — pass testdata_sf1 when
probing sf10 (third decade) so each ratio stays a 10x step.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_adsbx_spark.functions.bpe import bpe_encode, fit_bpe  # noqa: E402
from etl_adsbx_spark.functions.classify import (  # noqa: E402
    fit_quality_classifier,
    score_quality,
)
from etl_adsbx_spark.operators.sampling import exact_k_sample, hash_sample  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402
from etl_adsbx_spark.tables import load_table  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def probes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def bpe_fit():
        fit_bpe(docs, num_merges=200).count()

    merges = fit_bpe(docs, num_merges=200).localCheckpoint()

    def bpe_enc():
        bpe_encode(docs, merges).agg(F.sum("n_bpe_tokens")).collect()

    def clf_fit():
        # production shape: fit on a deterministic 10% sample (a d=6
        # model saturates long before that), label = lang=='en'
        fit_quality_classifier(
            hash_sample(docs, 0.1, "doc_id").withColumn(
                "label", (F.col("lang") == "en").cast("int")
            ),
            "label",
            steps=30,
        )

    w, _ = fit_quality_classifier(
        docs.withColumn("label", (F.col("lang") == "en").cast("int")),
        "label",
        steps=10,
    )

    def clf_score():
        score_quality(docs, w).agg(F.sum("quality_prob")).collect()

    def exact_k():
        exact_k_sample(docs, 1000, "doc_id", ["lang"]).count()

    return {
        "bpe_fit_200": bpe_fit,
        "bpe_encode": bpe_enc,
        "logreg_fit_30steps_10pct": clf_fit,
        "logreg_score": clf_score,
        "exact_k_sample_1k_per_lang": exact_k,
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata_sf1")
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("etl-adsbx-probe-tokenizer-classifier")
    spark.sparkContext.setLogLevel("ERROR")

    for fn in probes(spark, "/root/testdata/sf0.001").values():
        fn()

    out: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in (("sf0.1", base_dir), ("sf1", sf1_dir)):
        for name, fn in probes(spark, sf_dir).items():
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
            out.setdefault(name, {})[sf_name] = round(statistics.median(samples), 3)
    for name, d in out.items():
        d["ratio"] = round(d["sf1"] / d["sf0.1"], 2) if d["sf0.1"] > 0 else float("nan")
        print(f"## {name}: {d}", file=sys.stderr)
    print(json.dumps({"metric": "probe_tokenizer_classifier", "runs": N_RUNS, "queries": out}))


if __name__ == "__main__":
    main()
