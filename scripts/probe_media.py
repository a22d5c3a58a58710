#!/usr/bin/env python
"""Media near-dup scale probe: synthesize n and 10n images/audio clips
DISTRIBUTED (mapInPandas generators — the driver never holds payloads),
then measure the fingerprint pass and the near-dup join at both sizes.
Ratios near 10 = linear in corpus size; the joins should stay near-linear
because both are banded equi-joins (block keys / frame postings), never
all-pairs. Output: one JSON line; append readings to BASELINE.md by hand.

Usage: python scripts/probe_media.py [n_small]  (default 2000 images,
500 clips; the large leg is always 10x)."""

from __future__ import annotations

import io
import json
import os
import statistics
import sys
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from etl_adsbx_spark.operators.multimodal import (  # noqa: E402
    MEDIA_SCHEMA,
    audio_candidate_pairs,
    audio_fingerprint,
    phash_images,
    phash_pairs,
    video_candidate_pairs,
    video_frame_phashes,
)
from etl_adsbx_spark.session import get_spark  # noqa: E402

W, H = 64, 48
SR, FRAME, HOP = 8000, 1024, 256
#: Base patterns per corpus size. Fixed count (env SPARK_GRAFT_MEDIA_PATTERNS)
#: makes duplicate-cluster SIZE grow with n — the adversarial regime where
#: near-dup pair OUTPUT is quadratic in cluster size by semantics. Scaling
#: the pattern count with n (default, patterns = n/10 -> constant cluster
#: size 10) is the production-shaped control: admission pipelines keep
#: clusters from accumulating, so cluster size is bounded in practice.
_FIXED_PATTERNS = os.environ.get("SPARK_GRAFT_MEDIA_PATTERNS")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _smooth(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    for _ in range(24):
        fy, fx = rng.randint(0, 8, size=2)
        if fy == fx == 0:
            continue
        img += (
            rng.uniform(0.5, 1.0)
            * rng.choice([-1.0, 1.0])
            * np.cos(np.pi * fy * y / H)
            * np.cos(np.pi * fx * x / W)
        )
    img = (img - img.min()) / (img.max() - img.min() + 1e-9) * 215.0 + 20.0
    return np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)


def _n_patterns(n: int) -> int:
    return int(_FIXED_PATTERNS) if _FIXED_PATTERNS else max(1, n // 10)


def images_df(spark, n: int):
    npat = _n_patterns(n)

    def gen(it):
        header = f"P6\n{W} {H}\n255\n".encode()
        for pdf in it:
            rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                base = _smooth(mid % npat)
                noise = np.random.RandomState(10_000 + mid).randint(-3, 4, base.shape)
                img = np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)
                rows["media_id"].append(mid)
                rows["payload"].append(header + img.tobytes())
                rows["mime"].append("image/x-portable-pixmap")
                rows["width"].append(W)
                rows["height"].append(H)
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(32).mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_df(spark, n: int):
    npat = _n_patterns(n)

    def gen(it):
        t = np.arange(SR) / SR  # 1-second clips
        for pdf in it:
            rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.RandomState(mid % npat)
                sig = np.zeros_like(t)
                for _ in range(24):
                    sig += rng.uniform(0.3, 1.0) * np.sin(
                        2 * np.pi * rng.uniform(100, 3500) * t + rng.uniform(0, 6)
                    )
                pcm = (sig / np.abs(sig).max() * 20000).astype(np.int16)
                noise = np.random.RandomState(20_000 + mid).randint(
                    -200, 201, pcm.shape
                )
                pcm = np.clip(pcm.astype(np.int32) + noise, -32768, 32767).astype(
                    np.int16
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(SR)
                    wf.writeframes(pcm.tobytes())
                rows["media_id"].append(mid)
                rows["payload"].append(buf.getvalue())
                rows["mime"].append("audio/wav")
                rows["width"].append(None)
                rows["height"].append(None)
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(32).mapInPandas(gen, schema=MEDIA_SCHEMA)


N_VIDEO_FRAMES = 6


def video_df(spark, n: int):
    npat = _n_patterns(n)

    def gen(it):
        header = f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420\n".encode()
        uv = bytes([128] * (W * H // 2))
        for pdf in it:
            rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                base = _smooth(mid % npat)[:, :, 0]  # luma-like single channel
                rng = np.random.RandomState(30_000 + mid)
                out = bytearray(header)
                for t in range(N_VIDEO_FRAMES):
                    frame = np.clip(
                        base.astype(np.int16)
                        + rng.randint(-3, 4, base.shape)
                        + 2 * t,
                        0,
                        255,
                    ).astype(np.uint8)
                    out += b"FRAME\n" + frame.tobytes() + uv
                rows["media_id"].append(mid)
                rows["payload"].append(bytes(out))
                rows["mime"].append("video/x-yuv4mpeg")
                rows["width"].append(W)
                rows["height"].append(H)
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(32).mapInPandas(gen, schema=MEDIA_SCHEMA)


def timed(fn) -> float:
    runs = []
    for _ in range(N_RUNS):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_aud = max(100, n_img // 4)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for scale, mult in (("small", 1), ("large", 10)):
        img = images_df(spark, n_img * mult).persist()
        img.count()
        sigs = phash_images(img).persist()
        out.setdefault("phash_fingerprint", {})[scale] = timed(
            lambda: phash_images(img).count()
        )
        sigs.count()
        out.setdefault("phash_pairs_join", {})[scale] = timed(
            lambda: phash_pairs(sigs, max_hamming=6).count()
        )
        aud = audio_df(spark, n_aud * mult).persist()
        aud.count()
        fps = audio_fingerprint(aud, hop=HOP).persist()
        out.setdefault("audio_fingerprint", {})[scale] = timed(
            lambda: audio_fingerprint(aud, hop=HOP).count()
        )
        fps.count()
        out.setdefault("audio_candidates_join", {})[scale] = timed(
            lambda: audio_candidate_pairs(fps, min_matching_frames=3).count()
        )
        vid = video_df(spark, n_aud * mult).persist()
        vid.count()
        vfps = video_frame_phashes(vid).persist()
        out.setdefault("video_fingerprint", {})[scale] = timed(
            lambda: video_frame_phashes(vid).count()
        )
        vfps.count()
        out.setdefault("video_candidates_join", {})[scale] = timed(
            lambda: video_candidate_pairs(vfps, min_matching_frames=2).count()
        )
        for f in (img, sigs, aud, fps, vid, vfps):
            f.unpersist()
    for v in out.values():
        v["ratio"] = round(v["large"] / v["small"], 2) if v["small"] else None
    print(
        json.dumps(
            {
                "metric": "media_scale_probe",
                "n_images": [n_img, n_img * 10],
                "n_clips": [n_aud, n_aud * 10],
                "n_videos": [n_aud, n_aud * 10],
                "runs": N_RUNS,
                "ops": out,
            }
        )
    )


if __name__ == "__main__":
    main()
