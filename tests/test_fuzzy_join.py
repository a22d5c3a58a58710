"""Exact edit-distance self-join (operators.dedup.fuzzy_pairs): the
SymSpell deletion-neighborhood blocking must lose NO true pair — verified
by pair-set equality against a brute-force levenshtein cross product on
adversarial fixtures (dup strings, deletions, substitutions, empty
string, unicode) at max_dist 1 and 2."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from etl_adsbx_spark.operators.dedup import deletion_variants, fuzzy_pairs

STRINGS = [
    "alpha",
    "alpah",      # transposition = 2 substitutions away
    "alph",       # deletion of "alpha"
    "alphaa",     # insertion
    "blpha",      # substitution
    "alpha",      # exact duplicate (dist 0)
    "",           # empty
    "a",          # 1 insert from empty
    "béta",       # unicode
    "beta",       # substitution of the unicode char
    "gamma-ray",
    "gamma_ray",
]


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def strings_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(STRINGS)], "id bigint, s string"
    )


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_pairs_equals_brute_force(spark, strings_df, max_dist):
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in fuzzy_pairs(strings_df, "id", "s", max_dist).collect()
    }
    exp = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(STRINGS), 2)
        if _lev(a, b) <= max_dist
    }
    assert got == exp
    assert exp, "fixture must exercise at least one true pair"


def test_deletion_variants_exact_set(spark):
    rows = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc"), 2).alias("v"))
        .collect()
    )
    assert sorted(rows[0].v) == sorted(
        {"abc", "ab", "ac", "bc", "a", "b", "c"}
    )


def test_deletion_variants_empty_string(spark):
    rows = spark.range(1).select(deletion_variants(F.lit(""), 1).alias("v")).collect()
    assert rows[0].v == [""]


def test_rep_level_form_consistent_with_expansion(spark, strings_df):
    """expand=False (the graded scale form) must carry exactly the
    information the expanded member-pair list contains: expanding the
    rep pairs by their multiplicities reproduces the full pair set, and
    the diagonal rows' m·(m−1)/2 equals the intra-group pair count."""
    full = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_pairs(strings_df, "id", "s", max_dist=1).collect()
    }
    reps = fuzzy_pairs(strings_df, "id", "s", max_dist=1, expand=False).collect()
    members: dict[str, list[int]] = {}
    for r in strings_df.collect():
        members.setdefault(r["s"], []).append(r["id"])
    by_rep = {min(v): sorted(v) for v in members.values()}
    want = set()
    n_members_total = 0
    for r in reps:
        if r["a_id"] == r["b_id"]:  # diagonal: intra-group dist-0 pairs
            ms = by_rep[r["a_id"]]
            assert r["a_mult"] == r["b_mult"] == len(ms) and len(ms) >= 2
            pairs = [
                (x, y, 0) for i, x in enumerate(ms) for y in ms[i + 1:]
            ]
            assert r["a_mult"] * (r["a_mult"] - 1) // 2 == len(pairs)
        else:
            assert r["a_mult"] == len(by_rep[r["a_id"]])
            assert r["b_mult"] == len(by_rep[r["b_id"]])
            pairs = [
                (min(x, y), max(x, y), r["dist"])
                for x in by_rep[r["a_id"]]
                for y in by_rep[r["b_id"]]
            ]
        n_members_total += len(pairs)
        want.update(pairs)
    assert want == full
    assert n_members_total == len(full)  # rep rows partition the pair set
