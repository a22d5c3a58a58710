"""tfidf_cosine_pairs decade-scaling evidence (round-9 verdict item 6 /
"what's wrong" #2): the 35.6× sf0.1→sf1 ratio was EXPLAINED as
candidate/true-pair density saturation from exactly two data points.
This probe makes the claim measurable: per SF it runs the GRADED
composition (tfidf_simhash_rep_pairs at the graded config) with an
Observation on the candidate frame (free — aggregates rows the plan
already produces) and reports

    {sf: {sec, candidate_pairs, rep_rows, true_pairs}}

true_pairs = Σ n_members (rep-level rows expanded by multiplicity —
the member-pair count the output density argument is about).

Usage: python scripts/probe_tfidf_density.py [sf_dir ...]
Defaults to sf0.1, testdata_sf1, testdata_sf3, testdata_sf10 (skipping
dirs that don't exist; build the replicas with scripts/make_sf1.py —
SPARK_GRAFT_REPLICAS=30 SPARK_GRAFT_SF_DST=testdata_sf3 for the sf3
midpoint).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_adsbx_spark.operators.dedup import tfidf_simhash_rep_pairs  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402
from etl_adsbx_spark.tables import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    os.path.join(REPO, "testdata_sf1"),
    os.path.join(REPO, "testdata_sf3"),
    os.path.join(REPO, "testdata_sf10"),
]


def main() -> None:
    dirs = sys.argv[1:] or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    spark = get_spark("probe-tfidf-density")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for sf_dir in dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        d = load_table(spark, sf_dir, "documents")
        obs = Observation()
        pairs = tfidf_simhash_rep_pairs(
            d, threshold=0.5, max_df_frac=0.2, nbits=32, max_hamming=3,
            observation=obs,
        )
        t0 = time.perf_counter()
        agg = pairs.agg(
            F.count("*").alias("rep_rows"),
            F.sum("n_members").cast("bigint").alias("true_pairs"),
        ).first()
        sec = round(time.perf_counter() - t0, 1)
        out[label] = {
            "sec": sec,
            "candidate_pairs": int(obs.get["candidate_pairs"]),
            "rep_rows": int(agg["rep_rows"]),
            "true_pairs": int(agg["true_pairs"] or 0),
        }
        print(f"{label}: {out[label]}", flush=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
