"""Audio fingerprinting (audio_fingerprint / audio_candidate_pairs):
Haitsma-Kalker bits vs an independent numpy reference, noise robustness
on synthetic tones, candidate-join exactness, and stereo downmix."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from etl_adsbx_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_candidate_pairs,
    audio_fingerprint,
)

SR = 8000
FRAME = 1024
N_BANDS = 32


def _tone_mix(seed: int, seconds: float = 2.0) -> np.ndarray:
    """Seeded mixture of sinusoids across the band range — structured
    audio whose band-energy landscape is stable under small noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * seconds)) / SR
    sig = np.zeros_like(t)
    for _ in range(24):
        freq = rng.uniform(100, 3500)
        sig += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * freq * t + rng.uniform(0, 6))
    return (sig / np.abs(sig).max() * 20000).astype(np.int16)


def _wav(pcm: np.ndarray, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(SR)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


HOP = 256


def _reference_fps(pcm: np.ndarray) -> list[int]:
    sig = pcm.astype(np.float64)
    windows = np.lib.stride_tricks.sliding_window_view(sig, FRAME)[::HOP]
    mag = np.abs(np.fft.rfft(windows, axis=1))[:, 1:]
    bands = mag.reshape(len(windows), N_BANDS, -1).sum(axis=2)
    diff = bands[:, :-1] - bands[:, 1:]
    bits = (diff[1:] - diff[:-1]) > 0
    out = []
    for row in bits:
        word = 0
        for b in row.astype(int):
            word = (word << 1) | int(b)
        out.append(int(np.int64(np.uint64(word))))
    return out


def _media_df(spark, clips: dict[int, bytes]):
    rows = [(mid, wav, "audio/wav", None, None) for mid, wav in clips.items()]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.fixture(scope="module")
def clips():
    out: dict[int, bytes] = {}
    for s in range(4):
        base = _tone_mix(s)
        noise = np.random.RandomState(500 + s).randint(-200, 201, base.shape)
        out[s * 10] = _wav(base)
        out[s * 10 + 1] = _wav(
            np.clip(base.astype(np.int32) + noise, -32768, 32767).astype(np.int16)
        )
    return out


def test_kernel_matches_numpy_reference(spark, clips):
    got: dict[int, dict[int, int]] = {}
    for r in audio_fingerprint(_media_df(spark, clips), hop=HOP).collect():
        got.setdefault(r["media_id"], {})[r["frame_idx"]] = r["fp"]
    for s in range(4):
        base = _tone_mix(s)
        want = _reference_fps(base)
        assert [got[s * 10][i] for i in range(len(want))] == want


def test_noisy_twin_low_ber_unrelated_high(spark, clips):
    fps = audio_fingerprint(_media_df(spark, clips), hop=HOP)
    rows = audio_candidate_pairs(
        fps, min_matching_frames=1, max_ber=0.25, n_bands=N_BANDS
    ).collect()
    got = {(r["a_id"], r["b_id"]): r["ber"] for r in rows}
    for s in range(4):
        pair = (s * 10, s * 10 + 1)
        assert pair in got, f"noisy twin of clip {s} not recovered"
        assert got[pair] <= 0.2, f"twin BER too high: {got[pair]}"
    for (a, b) in got:
        assert a // 10 == b // 10, f"unrelated clips {a},{b} passed the BER gate"


def test_stereo_downmix_equals_mono(spark):
    base = _tone_mix(9)
    stereo = np.repeat(base[:, None], 2, axis=1).reshape(-1)
    df = spark.createDataFrame(
        [
            (1, _wav(base), "audio/wav", None, None),
            (2, _wav(stereo, nch=2), "audio/wav", None, None),
        ],
        MEDIA_SCHEMA,
    )
    got: dict[int, list] = {1: [], 2: []}
    for r in audio_fingerprint(df, hop=HOP).collect():
        got[r["media_id"]].append((r["frame_idx"], r["fp"]))
    assert sorted(got[1]) == sorted(got[2])


def test_batch_shape_invariance(spark, clips):
    df = _media_df(spark, clips)
    one = sorted(map(tuple, audio_fingerprint(df.repartition(1), hop=HOP).collect()))
    many = sorted(map(tuple, audio_fingerprint(df.repartition(5), hop=HOP).collect()))
    assert one == many


def test_candidate_plan_is_equijoin(spark, clips):
    fps = audio_fingerprint(_media_df(spark, clips), hop=HOP)
    plan = (
        audio_candidate_pairs(fps)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
