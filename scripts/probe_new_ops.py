"""Scale probe for the late-round-4 operators: semantic dedup, Bloom
incremental admission, deterministic shuffle. Measures sf0.1 vs sf1
(10x docs/embeddings) medians, printing one JSON line — appended to
BASELINE.md's scaling evidence.

Usage: python scripts/probe_new_ops.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_adsbx_spark.operators.dedup import (  # noqa: E402
    bloom_index,
    exact_dedup,
    incremental_exact_dedup,
)
from etl_adsbx_spark.operators.layout import deterministic_shuffle  # noqa: E402
from etl_adsbx_spark.operators.similarity import semantic_dedup  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402
from etl_adsbx_spark.tables import load_table  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def probes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    def semantic():
        semantic_dedup(
            emb, eps=0.05, n_clusters=None, target_cluster_size=256, sample_mod=4
        ).count()

    def semantic_twolevel():
        semantic_dedup(
            emb, eps=0.05, n_clusters=None, target_cluster_size=256, sample_mod=4,
            assign="two_level",
        ).count()

    def bloom_build():
        bloom_index(exact_dedup(corpus).select("text_sha"), num_bits=1 << 22).count()

    bloom = bloom_index(
        exact_dedup(corpus).select("text_sha"), num_bits=1 << 22
    ).localCheckpoint()

    def admit_plain():
        incremental_exact_dedup(batch, corpus).count()

    def admit_bloom():
        incremental_exact_dedup(batch, corpus, bloom=bloom).count()

    def shuffle():
        deterministic_shuffle(docs, seed=7).count()

    return {
        "semantic_dedup": semantic,
        "semantic_dedup_twolevel": semantic_twolevel,
        "bloom_index_build": bloom_build,
        "incr_admit_antijoin": admit_plain,
        "incr_admit_bloom": admit_bloom,
        "deterministic_shuffle": shuffle,
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata_sf1")
    spark = get_spark("etl-adsbx-probe-new-ops")
    spark.sparkContext.setLogLevel("ERROR")

    # warm codegen at the smallest SF
    for fn in probes(spark, "/root/testdata/sf0.001").values():
        fn()

    out: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
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
    print(json.dumps({"metric": "probe_new_ops", "runs": N_RUNS, "queries": out}))


if __name__ == "__main__":
    main()
