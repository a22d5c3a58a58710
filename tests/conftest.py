from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must precede the session import: DEFAULT_SHUFFLE_PARTITIONS binds at
# module import. 8 shuffle partitions for the shared test session — batch
# results are partitioning-invariant by the registry's exactness contracts
# (and test_determinism re-checks them at 7 partitions in its own
# session), while STATEFUL STREAMING tests pay per state partition per
# micro-batch (state store open/commit + a Python state worker each):
# measured r12, the stateful-last-position drain drops 11.8 → 7.3 s going
# 32 → 8. Tests that need a specific count pin their own sessions.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

from etl_adsbx_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    # hypothesis suites run hundreds of tiny Spark jobs: the production
    # fine-grained AQE start (initialPartitionNum=256, session.py) is
    # pure per-job overhead at that shape — pin tests to the shuffle
    # count; results are partitioning-invariant by the exactness
    # contracts (and the decade probes/bench exercise the 256 default)
    os.environ.setdefault("SPARK_GRAFT_INIT_PARTS", "32")
    # the pre-touched heap floor (session.default_driver_xms) sizes for
    # the sf0.1 bench working set; at sf0.001 the suite never needs it —
    # keep the test JVM's cold start fast (same rationale as INIT_PARTS)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_XMS", "2g")
    s = get_spark("etl-adsbx-spark-tests")
    yield s


@pytest.fixture(autouse=True)
def _release_pins_between_tests():
    """Drop each test's dead checkpoint blocks as soon as it finishes.

    Operators pin shared subtrees with lazy ``localCheckpoint`` via
    ``planprobe.pin``; in the bench those blocks are freed between timed
    samples, but a pytest session never released them — over ~600 tests
    the dead blocks pile up in the BlockManager, the driver heap grows
    past the 2g test floor, and on this memory-bandwidth-starved host
    the page-fault churn slows LATER tests by up to ~10×
    (test_cc_incremental_matches_full_recompute: 610 s at suite position
    ~540 vs 66 s in isolation, measured r12 — the r11 bench-stall
    pathology inside pytest). Releasing after EACH test is safe: no
    fixture carries a pinned DataFrame across tests (module-scoped
    fixtures hold raw createDataFrame frames or already-collected rows),
    so only dead frames are dropped; the next test constructs and pins
    its own frames fresh.

    Also stops any streaming query a test left RUNNING: a stateful query
    whose timers keep re-arming never drains under availableNow, so an
    ``awaitTermination(timeout)`` that times out returns with the query
    still firing micro-batches — measured r12: one such zombie burned a
    ~2.6 s no-data batch continuously for the rest of the suite and
    slowed every later test up to ~10× (the 610 s in-suite vs 66 s
    isolated gap). No test hands a running query to another test, so
    stopping leftovers at the boundary is safe."""
    yield
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            for q in s.streams.active:
                q.stop()
    except Exception:  # noqa: BLE001 — a dead session has nothing to stop
        pass
    from etl_adsbx_spark.planprobe import release_pins

    release_pins()
