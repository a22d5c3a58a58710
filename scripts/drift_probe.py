#!/usr/bin/env python
"""Box-drift noise probe (r10 verdict item 7: the r10 drift analysis ran
by hand and was unfalsifiable after the fact). One command that answers
"did the MACHINE change speed?" before any cross-round bench comparison:

- times 5 PINNED code-stable scalar queries at sf0.1 (the same class the
  r10 analysis used: trivial plans over unchanging code+data, so any
  movement is the box) — N runs each, [min, median, max];
- runs the bench calibration workload (bench.calibrate: fixed 256 MiB
  sha256 + the warmed q1@sf0.001 scan) before and after;
- captures /proc/loadavg and the CPU steal/total jiffy split around the
  run (a noisy neighbor or CFS throttling shows up here).

Output: ONE JSON line. Record it next to the anchor in BASELINE.md; the
drift factor vs a prior round is median(this.pinned)/median(prior.pinned)
cross-checked against the calibration ratio — mechanical, not argued.

Usage: python scripts/drift_probe.py [sf_dir]   (default /root/testdata/sf0.1)
Env:   SPARK_GRAFT_BENCH_RUNS (default 5 here — spreads matter more than
       wall time for a probe).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrate  # noqa: E402
from etl_adsbx_spark import queries as registry  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402

#: code-stable, shuffle-light scalar queries — the drift canaries. These
#: specific five inflated together on identical code/data in the r10
#: anchor (q1 0.212→0.314s, pivot 0.133→0.222s …), which is what a
#: box-drift signature looks like.
PINNED = [
    "q1_pricing_summary",
    "pivot_unpivot",
    "string_funcs",
    "datetime_funcs",
    "set_ops",
]

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))


def _cpu_jiffies() -> dict[str, int]:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq",
             "steal", "guest", "guest_nice"]
    vals = dict(zip(names, map(int, parts[1:])))
    return {"total": sum(vals.values()), "steal": vals.get("steal", 0),
            "idle": vals.get("idle", 0) + vals.get("iowait", 0)}


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as fh:
        return [float(x) for x in fh.read().split()[:3]]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("etl-adsbx-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    load0, jif0 = _loadavg(), _cpu_jiffies()
    for name in PINNED:  # codegen/JVM warm-up
        qs[name](spark, "/root/testdata/sf0.001").count()
    cal_before = calibrate(spark, qs)

    spreads: dict[str, list[float]] = {}
    for name in PINNED:
        samples = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        spreads[name] = [round(min(samples), 3),
                         round(statistics.median(samples), 3),
                         round(max(samples), 3)]

    cal_after = calibrate(spark, qs)
    load1, jif1 = _loadavg(), _cpu_jiffies()
    dtotal = max(1, jif1["total"] - jif0["total"])
    print(json.dumps({
        "metric": "drift_probe",
        "sf_dir": sf_dir,
        "runs": N_RUNS,
        "pinned_spreads": spreads,
        "pinned_median_total": round(sum(s[1] for s in spreads.values()), 3),
        "calibration": {"before": cal_before, "after": cal_after},
        "loadavg_before": load0,
        "loadavg_after": load1,
        "steal_pct": round(100 * (jif1["steal"] - jif0["steal"]) / dtotal, 2),
        "busy_pct": round(
            100 * (dtotal - (jif1["idle"] - jif0["idle"])) / dtotal, 1
        ),
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
