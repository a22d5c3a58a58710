"""Scale probe for the round-7/8 rows still missing decade readings
(round-7 verdict item 6 + the r8 additions): cluster_keep_best,
line_dedup_global, the graded tfidf composition's third decade, and the
r8 operators (text_normalize, split_leakage_audit, corr_matrix).
Measures target-vs-base medians (a 10x decade per invocation), one JSON
line — appended to BASELINE.md.

Usage: python scripts/probe_r8.py [target_dir] [base_dir] [keys_csv]
base_dir defaults to /root/testdata/sf0.1 — pass testdata_sf1 when
probing sf10 so each ratio stays a 10x step. keys_csv limits the probe
set (the tfidf composition runs ~3 min/run at sf1; probe it with
SPARK_GRAFT_BENCH_RUNS=1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_adsbx_spark import queries as registry  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

PROBE_KEYS = [
    "cluster_keep_best",
    "line_dedup_global",
    "tfidf_simhash_rep_pairs",  # alias: the graded composition behind tfidf_cosine_pairs
    "text_normalize",
    "split_leakage_audit",
    "corr_matrix",
]


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBE_KEYS
    spark = get_spark("etl-adsbx-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    out: dict[str, dict] = {}
    for which, sf_dir in (("base", base), ("target", target)):
        for name in keys:
            key = "tfidf_cosine_pairs" if name == "tfidf_simhash_rep_pairs" else name
            if key not in qs:
                continue

            def fn():
                qs[key](spark, sf_dir).count()

            fn()  # warm
            ts = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            out.setdefault(name, {})[which] = round(statistics.median(ts), 3)
    for name, d in out.items():
        if "base" in d and "target" in d and d["base"]:
            d["ratio"] = round(d["target"] / d["base"], 2)
    print(
        json.dumps(
            {
                "metric": "probe_r8",
                "base": base,
                "target": target,
                "runs": N_RUNS,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
