"""Scale probe for the generation-monitoring plan: the per-publish
sketch pass (corpus-proportional) vs the cross-generation report
(sketch-side, should be ~flat). sf0.1 vs sf1 medians, one JSON line.

Usage: python scripts/probe_monitor.py [target_dir] [base_dir]
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

from etl_adsbx_spark.plans.monitor import generation_report, generation_sketches  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402
from etl_adsbx_spark.tables import load_table  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def probes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def sketch_pass():
        generation_sketches(docs).count()

    # two "generations": drop 10% / different 10% — sketches materialized
    # once so the report probe measures only the sketch-side comparison
    old_sk = generation_sketches(docs.where(F.col("doc_id") % 10 != 0)).localCheckpoint()
    new_sk = generation_sketches(docs.where(F.col("doc_id") % 10 != 1)).localCheckpoint()

    def report():
        generation_report(old_sk, new_sk).count()

    return {"generation_sketch_pass": sketch_pass, "generation_report": report}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata_sf1")
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("etl-adsbx-probe-monitor")
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
    print(json.dumps({"metric": "probe_monitor", "runs": N_RUNS, "queries": out}))


if __name__ == "__main__":
    main()
