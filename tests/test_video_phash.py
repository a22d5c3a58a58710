"""Video near-dup (video_frame_phashes / video_candidate_pairs): luma
pHash per frame vs the image-path reference, noisy-twin recovery through
the frame-aligned candidate join, frame sampling, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from etl_adsbx_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _dct_matrix,
    _phash_of_gray,
    video_candidate_pairs,
    video_frame_phashes,
)

W, H = 64, 48
N_FRAMES = 6


def _frame_gray(seed: int, t: int) -> np.ndarray:
    """Frame t of clip `seed`: dense low-frequency pattern that evolves
    slowly over time (same regime rationale as the image tests)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    for c in range(24):
        fy, fx = rng.randint(0, 8, size=2)
        if fy == fx == 0:
            continue
        amp = rng.uniform(0.5, 1.0) * rng.choice([-1.0, 1.0])
        phase_drift = 0.05 * t * ((c % 3) - 1)
        img += amp * np.cos(np.pi * fy * y / H + phase_drift) * np.cos(
            np.pi * fx * x / W
        )
    img = (img - img.min()) / (img.max() - img.min() + 1e-9) * 215.0 + 20.0
    return img.astype(np.uint8)


def _y4m(frames: list[np.ndarray]) -> bytes:
    out = bytearray(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420\n".encode())
    uv = bytes([128] * (W * H // 2))
    for f in frames:
        out += b"FRAME\n" + f.tobytes() + uv
    return bytes(out)


def _clip(seed: int, noise_seed: int | None = None) -> bytes:
    frames = [_frame_gray(seed, t) for t in range(N_FRAMES)]
    if noise_seed is not None:
        rng = np.random.RandomState(noise_seed)
        frames = [
            np.clip(
                f.astype(np.int16) + rng.randint(-3, 4, f.shape), 0, 255
            ).astype(np.uint8)
            for f in frames
        ]
    return _y4m(frames)


def _media_df(spark, clips: dict[int, bytes]):
    rows = [(mid, c, "video/x-yuv4mpeg", W, H) for mid, c in clips.items()]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.fixture(scope="module")
def clips():
    out = {}
    for s in range(4):
        out[s * 10] = _clip(s)
        out[s * 10 + 1] = _clip(s, noise_seed=700 + s)
    return out


def test_frame_hashes_match_image_reference(spark, clips):
    got: dict[tuple[int, int], int] = {}
    for r in video_frame_phashes(_media_df(spark, clips)).collect():
        got[(r["media_id"], r["frame_idx"])] = r["phash"]
    dct = _dct_matrix(32)
    for s in range(4):
        for t in range(N_FRAMES):
            want = _phash_of_gray(
                _frame_gray(s, t).astype(np.float64), dct, 32, 8
            )
            assert got[(s * 10, t)] == want
    assert len(got) == len(clips) * N_FRAMES


def test_every_n_sampling(spark, clips):
    rows = video_frame_phashes(_media_df(spark, clips), every_n=2).collect()
    idxs = {r["frame_idx"] for r in rows}
    assert idxs == {0, 2, 4}
    assert len(rows) == len(clips) * 3


def test_noisy_twin_recovered_unrelated_rejected(spark, clips):
    fps = video_frame_phashes(_media_df(spark, clips))
    rows = video_candidate_pairs(
        fps, max_hamming=6, min_matching_frames=2, max_mean_hamming=8.0
    ).collect()
    got = {(r["a_id"], r["b_id"]): r for r in rows}
    for s in range(4):
        pair = (s * 10, s * 10 + 1)
        assert pair in got, f"noisy twin of clip {s} not recovered"
        assert got[pair]["aligned_frames"] == N_FRAMES
        assert got[pair]["mean_hamming"] <= 6
    for a, b in got:
        assert a // 10 == b // 10, f"unrelated clips {a},{b} passed verification"


def test_plan_is_frame_aligned_equijoin(spark, clips):
    fps = video_frame_phashes(_media_df(spark, clips))
    plan = (
        video_candidate_pairs(fps)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
