"""Multimodal plumbing tests: toy-codec round trips, mapInPandas operator
schemas and values, stub behavior for real formats, and determinism of the
fixture-derived media table."""

from __future__ import annotations

import numpy as np
import pytest

from tp1_distribuidos_mapreduce_spark.operators import multimodal as M

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return M.synthesize_media(docs).cache()


def test_codec_round_trips():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (12, 9, 3)).astype(np.uint8)
    assert (M.decode_fimg(M.encode_fimg(img)) == img).all()
    pcm = (rng.randn(1000) * 1000).astype(np.int16)
    samples, rate = M.decode_faud(M.encode_faud(pcm, 8000))
    assert rate == 8000 and (samples == pcm).all()
    frames = [rng.randint(0, 256, (4, 4, 3)).astype(np.uint8) for _ in range(3)]
    out = M.decode_fvid(M.encode_fvid(frames))
    assert len(out) == 3 and all((a == b).all() for a, b in zip(out, frames))


def test_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_fimg(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        M.decode_faud(b"RIFF....WAVE")
    with pytest.raises(NotImplementedError):
        M.decode_fvid(b"\x00\x00\x00 ftypmp42")


def test_media_table_schema_and_determinism(spark, media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,data:binary,"
        "meta:struct<height:int,width:int,channels:int,sample_rate:int,n_frames:int>>"
    )
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    again = {r.media_id: bytes(r.data) for r in M.synthesize_media(docs).collect()}
    first = {r.media_id: bytes(r.data) for r in media.collect()}
    assert first == again  # same seed -> identical blobs, any partitioning
    kinds = {r.media_id % 3: r.kind for r in media.collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video"}


def test_image_stats_values_match_numpy(spark, media):
    out = {r.media_id: r for r in M.image_stats(media).collect()}
    sample = media.where("kind = 'image'").limit(5).collect()
    assert out
    for row in sample:
        px = M.decode_fimg(bytes(row.data)).astype(np.float64)
        got = out[row.media_id]
        assert (got.height, got.width) == px.shape[:2]
        assert got.mean == round(float(px.mean()), 4)
        assert got.channel_means == [round(float(m), 4) for m in px.mean(axis=(0, 1))]
        # metadata column agrees with the decoded bytes
        assert (row.meta.height, row.meta.width) == px.shape[:2]


def test_resize_images_shape_and_nn_semantics(spark, media):
    out = M.resize_images(media, 16, 16).collect()
    assert out
    for r in out[:5]:
        px = M.decode_fimg(bytes(r.data))
        assert px.shape == (16, 16, 3)
    # upscale of a constant image stays constant
    const = M.encode_fimg(np.full((4, 4, 3), 7, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, "image", bytearray(const))], "media_id long, kind string, data binary"
    )
    (resized,) = M.resize_images(df, 8, 8).collect()
    assert (M.decode_fimg(bytes(resized.data)) == 7).all()


def test_audio_stats(spark, media):
    out = M.audio_stats(media).collect()
    assert out
    for r in out:
        assert r.duration_sec > 0 and r.rms > 0 and 0 <= r.zero_crossing_rate <= 1
    # silent audio -> rms 0
    silent = M.encode_faud(np.zeros(100, dtype=np.int16), 16000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(silent))], "media_id long, kind string, data binary"
    )
    (row,) = M.audio_stats(df).collect()
    assert row.rms == 0.0 and row.duration_sec == round(100 / 16000, 4)


def test_sample_frames_keeps_every_nth(spark, media):
    vids = {r.media_id: r.meta.n_frames for r in media.where("kind='video'").collect()}
    out = M.sample_frames(media, every=2).collect()
    got: dict[int, list[int]] = {}
    for r in out:
        got.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(got) == set(vids)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, vids[mid], 2))
    # frames decode to the metadata dimensions
    px = M.decode_fimg(bytes(out[0].data))
    assert px.shape == (8, 8, 3)


def test_media_summary_is_metadata_only(spark, media):
    rows = {r.kind: r for r in M.media_summary(media).collect()}
    assert set(rows) == {"image", "audio", "video"}
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n for r in rows.values()) == n_docs
    for r in rows.values():
        assert r.min_bytes > 0 and r.total_bytes >= r.max_bytes >= r.min_bytes


def test_image_phash_dupes_match_numpy_reference(spark):
    """Every duplicate group the operator reports must be exactly the
    groups a direct numpy pass over the replayed media table computes —
    and the replay construction guarantees at least one group."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    replayed = M.media_with_replayed_images(docs).cache()
    got = {
        r.ahash: (r.n_images, r.first_media_id, r.last_media_id)
        for r in M.image_phash_dupes(replayed).collect()
    }
    from collections import defaultdict

    ref = defaultdict(list)
    for row in replayed.where("kind = 'image'").collect():
        ref[M.ahash64(M.decode_fimg(bytes(row.data)))].append(row.media_id)
    want = {
        h: (len(ids), min(ids), max(ids))
        for h, ids in ref.items()
        if len(ids) > 1
    }
    assert got == want
    assert got, "replay construction must produce at least one dup group"
    # Each replayed blob pairs with its original: negative mirror id.
    for _, (n, first, last) in got.items():
        assert n == 2 and first == -last - 1


def test_ahash64_properties():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    h = M.ahash64(px)
    assert len(h) == 16 and int(h, 16) >= 0
    assert M.ahash64(px) == h  # deterministic
    # Constant images hash to all-zero bits (no pixel exceeds the mean).
    assert M.ahash64(np.full((9, 9, 3), 128, dtype=np.uint8)) == "0" * 16
