"""LSH parameter planner: S-curve math, planner constraints, and a
measured calibration of the curve against the real minhash_lsh_pairs
operator on pairs of known Jaccard similarity."""

from __future__ import annotations

import pytest

from etl_adsbx_spark.operators.dedup import (
    lsh_candidate_prob,
    minhash_lsh_pairs,
    plan_lsh,
)


def test_s_curve_endpoints_and_monotonicity():
    assert lsh_candidate_prob(0.0, 16, 4) == 0.0
    assert lsh_candidate_prob(1.0, 16, 4) == 1.0
    probs = [lsh_candidate_prob(s / 10, 16, 4) for s in range(11)]
    assert probs == sorted(probs)
    # the driver config (16 hashes / 4 bands, r=4): high sim nearly
    # certain, low sim rare — the regime minhash_pairs relies on
    assert lsh_candidate_prob(0.9, 16, 4) > 0.95
    assert lsh_candidate_prob(0.2, 16, 4) < 0.01


def test_s_curve_validates_band_divisibility():
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_prob(0.5, 16, 5)


def test_planner_meets_targets_and_is_minimal():
    plan = plan_lsh(threshold=0.8, target_recall=0.9, max_fp_prob=0.05)
    nh, b = plan["num_hashes"], plan["bands"]
    assert nh % b == 0
    assert plan["predicted_recall_at_threshold"] >= 0.9
    assert plan["predicted_fp_prob_at_low_sim"] <= 0.05
    # minimality: no valid config with fewer hashes
    for smaller in range(4, nh):
        for bb in range(1, smaller + 1):
            if smaller % bb:
                continue
            ok = (
                lsh_candidate_prob(0.8, smaller, bb) >= 0.9
                and lsh_candidate_prob(0.4, smaller, bb) <= 0.05
            )
            assert not ok, (smaller, bb)


def test_planner_raises_when_budget_insufficient():
    with pytest.raises(ValueError, match="no \\(num_hashes"):
        # threshold and fp_at nearly coincide: no curve separates them
        plan_lsh(threshold=0.5, fp_at=0.49, target_recall=0.99,
                 max_fp_prob=0.01, max_hashes=64)


def _pairs_with_jaccard(n_pairs: int, m: int, shared: int, tag: str):
    """Doc pairs over pair-unique vocabularies: both docs have m tokens,
    sharing a prefix of ``shared`` tokens. With 3-gram shingling each doc
    has m-2 shingles of which shared-2 coincide, so Jaccard =
    (shared-2) / (2(m-2) - (shared-2)) exactly — no cross-pair
    collisions because every pair uses its own token namespace."""
    rows = []
    for p in range(n_pairs):
        common = [f"{tag}c{p}_{i}" for i in range(shared)]
        a = common + [f"{tag}a{p}_{i}" for i in range(m - shared)]
        b = common + [f"{tag}b{p}_{i}" for i in range(m - shared)]
        rows.append((2 * p, " ".join(a)))
        rows.append((2 * p + 1, " ".join(b)))
    jac = (shared - 2) / (2 * (m - 2) - (shared - 2))
    return rows, jac


def test_s_curve_calibrates_against_real_operator(spark):
    """Measure candidate-detection rates of minhash_lsh_pairs on pairs of
    constructed Jaccard similarity and compare with the S-curve. The
    universal-hash minhash is an approximation of ideal permutations and
    n_pairs=80 has binomial noise, so the assertion is banded, not
    exact."""
    n_pairs, m = 80, 22
    high_rows, high_j = _pairs_with_jaccard(n_pairs, m, shared=20, tag="h")
    low_rows, low_j = _pairs_with_jaccard(n_pairs, m, shared=8, tag="l")
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(high_rows + low_rows)],
        "doc_id bigint, text string",
    )
    found = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(docs, num_hashes=16, bands=4).collect()
    }
    hi_hits = sum(
        1 for p in range(n_pairs) if (2 * p, 2 * p + 1) in found
    )
    lo_base = 2 * n_pairs
    lo_hits = sum(
        1
        for p in range(n_pairs)
        if (lo_base + 2 * p, lo_base + 2 * p + 1) in found
    )
    pred_hi = lsh_candidate_prob(high_j, 16, 4)
    pred_lo = lsh_candidate_prob(low_j, 16, 4)
    meas_hi, meas_lo = hi_hits / n_pairs, lo_hits / n_pairs
    assert abs(meas_hi - pred_hi) < 0.2, (meas_hi, pred_hi, high_j)
    assert abs(meas_lo - pred_lo) < 0.2, (meas_lo, pred_lo, low_j)
    assert meas_hi > meas_lo  # the curve separates the two regimes


def test_simhash_neardup_pairs_exact_vs_brute_force(spark):
    """Pigeonhole completeness: block-join candidates + popcount verify
    find EXACTLY the pairs brute force finds at the same threshold."""
    from etl_adsbx_spark.operators.dedup import simhash_docs, simhash_neardup_pairs

    texts = []
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    for i in range(30):
        words = base.split()
        # small perturbations -> some signatures land within a few bits
        words[i % len(words)] = f"w{i}"
        if i % 3 == 0:
            words[(i + 5) % len(words)] = f"v{i}"
        texts.append(" ".join(words))
    texts += [f"completely different document number {i} about topic{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    k = 4
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in simhash_neardup_pairs(docs, max_hamming=k).collect()
    }
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
    ids = sorted(sigs)
    expect = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= k
    }
    assert got == expect
    assert len(expect) > 0  # the fixture actually produces near pairs
    # identical docs are hamming 0
    twins = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here")], "doc_id bigint, text string"
    )
    tw = simhash_neardup_pairs(twins, max_hamming=0).collect()
    assert [(r["a_id"], r["b_id"], r["hamming"]) for r in tw] == [(1, 2, 0)]


def test_simhash_neardup_plan_is_equi_join(spark):
    """The pigeonhole search must execute as a hash/sort-merge equi-join
    on (blk, val) — never a nested-loop/cartesian pair scan."""
    from etl_adsbx_spark.operators.dedup import simhash_neardup_pairs

    docs = spark.createDataFrame(
        [(i, f"some words {i}") for i in range(10)], "doc_id bigint, text string"
    )
    plan = simhash_neardup_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
