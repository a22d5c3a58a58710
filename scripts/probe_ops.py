"""Generic two-SF scale probe for registry queries: times each named
registry callable at a small and a big SF dir and prints one JSON line
with per-op medians and the big/small ratio — the generator for
BASELINE.md's scaling-evidence rows.

Usage: python scripts/probe_ops.py op1,op2,... [big_dir] [small_dir]

Pass ``testdata_sf10 testdata_sf1`` for the third decade (build sf10
with SPARK_GRAFT_REPLICAS=100 scripts/make_sf1.py — see TESTDATA notes).
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


def main() -> None:
    ops = [s for s in sys.argv[1].split(",") if s]
    big = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1"
    small = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("etl-adsbx-probe-ops")
    qs = registry.queries()
    unknown = [o for o in ops if o not in qs]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")
    for name in ops:  # warm-up: codegen + JIT at the smallest SF
        qs[name](spark, "/root/testdata/sf0.001").count()
    out = {}
    for sf_dir in (small, big):
        for name in ops:
            times = []
            for _ in range(N_RUNS):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                times.append(time.time() - t0)
            out.setdefault(name, {})[sf_dir] = round(statistics.median(times), 3)
    for name, row in out.items():
        row["ratio"] = round(row[big] / row[small], 2)
    print(json.dumps({"metric": "probe_ops", "runs": N_RUNS, "queries": out}))


if __name__ == "__main__":
    main()
