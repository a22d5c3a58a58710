"""WebDataset tar-shard ingest: member expansion, sample grouping, the
media projection, and the end-to-end shard→decode→pHash→near-dup path."""

from __future__ import annotations

import io
import json
import tarfile

import numpy as np
import pytest

from etl_adsbx_spark.sources.webdataset import (
    group_samples,
    read_webdataset,
    samples_as_media,
)

from .test_phash import H, W, _ppm, _smooth_image


def _add(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """Two shards, four samples each: PPM image + txt caption + json meta
    per sample; sample 'dup-*' images are noisy twins across shards."""
    d = tmp_path_factory.mktemp("wds")
    base = _smooth_image(3)
    twin = np.clip(
        base.astype(np.int16)
        + np.random.RandomState(77).randint(-3, 4, base.shape),
        0,
        255,
    ).astype(np.uint8)
    for shard_idx, img_for_dup in ((0, base), (1, twin)):
        with tarfile.open(d / f"shard-{shard_idx:04d}.tar", "w") as tf:
            for i in range(3):
                key = f"s{shard_idx}-{i:03d}"
                img = _smooth_image(10 + shard_idx * 3 + i)
                _add(tf, f"{key}.ppm", _ppm(img))
                _add(tf, f"{key}.txt", f"caption for {key}".encode())
                _add(tf, f"{key}.json", json.dumps({"k": key}).encode())
            _add(tf, f"dup-{shard_idx}.ppm", _ppm(img_for_dup))
            _add(tf, f"dup-{shard_idx}.txt", b"the duplicated sample")
            # compound extension + hidden member: grouping edge cases
            _add(tf, f"s{shard_idx}-000.seg.ppm", _ppm(img_for_dup))
            _add(tf, "._hidden", b"resource fork noise")
    return str(d)


def test_member_expansion(spark, shard_dir):
    rows = read_webdataset(spark, shard_dir).collect()
    by_ext: dict[str, int] = {}
    for r in rows:
        by_ext[r["ext"]] = by_ext.get(r["ext"], 0) + 1
    assert by_ext == {"ppm": 8, "txt": 8, "json": 6, "seg.ppm": 2}
    assert all(not r["sample_key"].startswith(".") for r in rows)
    # compound extension keeps the full suffix and the base sample key
    seg = [r for r in rows if r["ext"] == "seg.ppm"]
    assert {r["sample_key"] for r in seg} == {"s0-000", "s1-000"}


def test_group_samples_map_column(spark, shard_dir):
    grouped = group_samples(read_webdataset(spark, shard_dir))
    rows = {r["sample_key"]: r for r in grouped.collect() if r["sample_key"] == "s0-000"}
    parts = dict(rows["s0-000"]["parts"])
    assert set(parts) == {"ppm", "txt", "json", "seg.ppm"}
    assert bytes(parts["txt"]) == b"caption for s0-000"
    assert json.loads(bytes(parts["json"]))["k"] == "s0-000"


def test_end_to_end_shard_to_neardup(spark, shard_dir):
    from etl_adsbx_spark.operators.multimodal import phash_images, phash_pairs

    samples = group_samples(read_webdataset(spark, shard_dir))
    media = samples_as_media(
        samples, "ppm", "image/x-portable-pixmap", width=W, height=H
    )
    assert media.count() == 8
    pairs = phash_pairs(phash_images(media), max_hamming=6).collect()
    # exactly the planted cross-shard twin pair (dup-0 vs dup-1) survives
    from pyspark.sql import functions as F

    key_of = {
        r["media_id"]: r["sample_key"]
        for r in samples.select(
            F.xxhash64("shard", "sample_key").alias("media_id"), "sample_key"
        ).collect()
    }
    got = {tuple(sorted((key_of[p["a_id"]], key_of[p["b_id"]]))) for p in pairs}
    assert got == {("dup-0", "dup-1")}


def test_media_id_distinct_for_per_shard_numbering(spark, tmp_path):
    """Regression: WebDataset shards conventionally restart sample
    numbering per shard (000000.ppm in every shard); a key-only hash
    collapsed all of them into one media_id."""
    d = tmp_path / "wds-numbered"
    d.mkdir()
    for shard_idx in range(3):
        with tarfile.open(d / f"shard-{shard_idx:04d}.tar", "w") as tf:
            _add(tf, "000000.ppm", _ppm(_smooth_image(40 + shard_idx)))
    media = samples_as_media(
        group_samples(read_webdataset(spark, str(d))),
        "ppm",
        "image/x-portable-pixmap",
        width=W,
        height=H,
    )
    ids = [r["media_id"] for r in media.collect()]
    assert len(ids) == 3 and len(set(ids)) == 3


def test_media_id_stable_across_rereads(spark, shard_dir):
    med = lambda: sorted(  # noqa: E731
        r["media_id"]
        for r in samples_as_media(
            group_samples(read_webdataset(spark, shard_dir)),
            "ppm",
            "image/x-portable-pixmap",
        ).collect()
    )
    assert med() == med()
