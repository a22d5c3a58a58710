"""Perceptual image hashing (phash_images) + Hamming-ball pairs
(phash_pairs): kernel vs an independent numpy reference, perturbation
robustness on structured images, block-join exactness vs brute force, and
Arrow batch-shape invariance."""

from __future__ import annotations

import numpy as np
import pytest

from etl_adsbx_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _dct_matrix,
    phash_images,
    phash_pairs,
    stdlib_decode,
)

W, H = 64, 48


def _smooth_image(seed: int) -> np.ndarray:
    """Low-frequency structured image (sum of seeded 2-D cosines): the
    natural-image regime pHash is designed for — small pixel noise must
    not flip low-frequency DCT signs the way it would on iid static."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    # dense low-frequency spectrum with coefficients bounded away from
    # zero: every bit of the 8x8 DCT block sits far from the median
    # threshold, so +-3 pixel noise cannot flip it (the regime pHash
    # assumes; sparse spectra leave near-zero coefficients that flip on
    # any perturbation)
    for _ in range(24):
        fy, fx = rng.randint(0, 8, size=2)
        if fy == fx == 0:
            continue
        amp = rng.uniform(0.5, 1.0) * rng.choice([-1.0, 1.0])
        img += amp * np.cos(np.pi * fy * y / H) * np.cos(np.pi * fx * x / W)
    # rescale into 20..235 so a +10 brightness shift cannot clip
    img = (img - img.min()) / (img.max() - img.min() + 1e-9) * 215.0 + 20.0
    return np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)


def _ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _reference_phash(img: np.ndarray) -> int:
    gray = img.astype(np.float64).mean(axis=2)
    yi = np.linspace(0, H - 1, 32).round().astype(int)
    xi = np.linspace(0, W - 1, 32).round().astype(int)
    small = gray[np.ix_(yi, xi)]
    dct = _dct_matrix(32)
    low = (dct @ small @ dct.T)[:8, :8].flatten()
    med = np.median(low[1:])
    bits = 0
    for b in (low > med).astype(int):
        bits = (bits << 1) | int(b)
    return int(np.int64(np.uint64(bits)))


def _media_df(spark, images: dict[int, np.ndarray]):
    rows = [
        (mid, _ppm(img), "image/x-portable-pixmap", W, H)
        for mid, img in images.items()
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.fixture(scope="module")
def corpus():
    base = {s: _smooth_image(s) for s in range(8)}
    images: dict[int, np.ndarray] = {}
    for s, img in base.items():
        images[s * 10] = img
        noisy = img.astype(np.int16) + np.random.RandomState(1000 + s).randint(
            -3, 4, img.shape
        )
        images[s * 10 + 1] = np.clip(noisy, 0, 255).astype(np.uint8)
        images[s * 10 + 2] = np.clip(img.astype(np.int16) + 10, 0, 255).astype(
            np.uint8
        )  # brightness shift
    return images


def test_kernel_matches_numpy_reference(spark, corpus):
    got = {
        r["media_id"]: r["phash"]
        for r in phash_images(_media_df(spark, corpus)).collect()
    }
    want = {mid: _reference_phash(img) for mid, img in corpus.items()}
    assert got == want


def test_near_duplicates_within_ball_distinct_outside(spark, corpus):
    sigs = {
        r["media_id"]: r["phash"]
        for r in phash_images(_media_df(spark, corpus)).collect()
    }

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for s in range(8):
        assert ham(sigs[s * 10], sigs[s * 10 + 1]) <= 6, f"noise twin of {s}"
        assert ham(sigs[s * 10], sigs[s * 10 + 2]) <= 6, f"brightness twin of {s}"
    far = [
        ham(sigs[a * 10], sigs[b * 10]) for a in range(8) for b in range(a + 1, 8)
    ]
    assert min(far) > 6, f"distinct structured images collided: min={min(far)}"


def test_pairs_join_equals_brute_force(spark, corpus):
    hashes = phash_images(_media_df(spark, corpus))
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in phash_pairs(hashes, max_hamming=6).collect()
    }
    sigs = {r["media_id"]: r["phash"] for r in hashes.collect()}

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (a, b, ham(sa, sb))
        for a, sa in sigs.items()
        for b, sb in sigs.items()
        if a < b and ham(sa, sb) <= 6
    }
    assert got == want
    assert len(got) >= 16, "every planted twin pair must be found"


def test_pairs_join_mixed_sign_signatures(spark):
    """Regression: signatures with bit 63 set are NEGATIVE int64s; the
    block-0 key must not follow the dividend sign (a `%`-keyed block 0
    silently missed every pair that agrees only on block 0 while
    differing in the sign bit)."""

    def to_i64(u: int) -> int:
        return int(np.int64(np.uint64(u)))

    sigs = {
        1: to_i64(0x0000000000000001),
        2: to_i64(0x8000211008040201),  # hamming 6 from id 1, sign bit set
        3: to_i64(0x8000211008040200),  # hamming 1 from id 2
        4: to_i64(0x7FFFFFFFFFFFFFFF),
        5: to_i64(0xFFFFFFFFFFFFFFFF),  # hamming 1 from id 4 (sign flip)
        6: to_i64(0x0123456789ABCDEF),
    }
    hashes = spark.createDataFrame(
        [(k, v) for k, v in sigs.items()], "media_id long, phash long"
    )

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for k in (0, 1, 7):
        got = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in phash_pairs(hashes, max_hamming=k).collect()
        }
        want = {
            (a, b, ham(sa, sb))
            for a, sa in sigs.items()
            for b, sb in sigs.items()
            if a < b and ham(sa, sb) <= k
        }
        assert got == want, f"max_hamming={k}"
    assert (1, 2, 7) in {
        tuple(r) for r in phash_pairs(hashes, max_hamming=7).collect()
    }


def test_batch_shape_invariance(spark, corpus):
    df = _media_df(spark, corpus)
    one = sorted(map(tuple, phash_images(df.repartition(1)).collect()))
    many = sorted(map(tuple, phash_images(df.repartition(7)).collect()))
    assert one == many


def test_plan_is_block_equijoin_not_cartesian(spark, corpus):
    hashes = phash_images(_media_df(spark, corpus))
    plan = phash_pairs(hashes, max_hamming=6)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decode_roundtrip_is_real(corpus):
    img = corpus[0]
    assert stdlib_decode(_ppm(img), "image/x-portable-pixmap") == img.tobytes()


def test_incremental_media_admit(spark, corpus):
    from etl_adsbx_spark.operators.multimodal import (
        incremental_media_admit,
        phash_images,
    )

    # corpus index: base images 0,10,20,30 (seeds 0-3)
    index_imgs = {s * 10: corpus[s * 10] for s in range(4)}
    index = phash_images(_media_df(spark, index_imgs))
    # batch: noisy twins of seeds 0,1 (must be rejected against the index),
    # base+twin of seed 5 (intra-batch near-dup pair: only the lower id
    # survives), and base of seed 6 (clean admit)
    batch_imgs = {
        101: corpus[1],  # twin of indexed seed 0
        102: corpus[11],  # twin of indexed seed 1
        150: corpus[50],  # new: seed 5 base
        151: corpus[51],  # new: seed 5 noisy twin (loses to 150)
        160: corpus[60],  # new: seed 6 base
    }
    batch = _media_df(spark, batch_imgs)
    admitted = incremental_media_admit(batch, index, max_hamming=6)
    got = sorted(r["media_id"] for r in admitted.collect())
    assert got == [150, 160]
    # admitted rows carry their phash for index append without re-decode
    assert "phash" in admitted.columns
    want = {
        r["media_id"]: r["phash"]
        for r in phash_images(_media_df(spark, batch_imgs)).collect()
    }
    for r in admitted.collect():
        assert r["phash"] == want[r["media_id"]]
    # two consecutive ticks: appending the admitted rows then replaying the
    # same batch admits nothing (idempotent admission)
    index2 = index.unionByName(admitted.select("media_id", "phash"))
    again = incremental_media_admit(batch, index2, max_hamming=6)
    assert again.count() == 0
