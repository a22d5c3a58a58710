"""Scale probe for the round-5 continuation-2 registry rows: fuzzy
edit-distance join, BM25 retrieval, URL/domain analytics, MAD outlier
gate. Times each registry callable at two SF dirs (default
/root/testdata/sf0.1 vs ./testdata_sf1) and prints one JSON line with
per-op medians and the 10x-data ratio — appended to BASELINE.md's
scaling evidence.

Usage: python scripts/probe_cont2.py [big_dir] [small_dir]
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
OPS = ["fuzzy_name_pairs", "bm25_topk", "url_domain_stats", "mad_outlier_gate"]


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    small = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("etl-adsbx-probe-cont2")
    qs = registry.queries()
    for name in OPS:  # warm-up: codegen + JIT at the smallest SF
        qs[name](spark, "/root/testdata/sf0.001").count()
    out = {}
    for sf_dir in (small, big):
        for name in OPS:
            times = []
            for _ in range(N_RUNS):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                times.append(time.time() - t0)
            out.setdefault(name, {})[sf_dir] = round(statistics.median(times), 3)
    for name, row in out.items():
        row["ratio_10x"] = round(row[big] / row[small], 2)
    print(json.dumps({"metric": "probe_cont2", "runs": N_RUNS, "queries": out}))


if __name__ == "__main__":
    main()
