"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The pipeline pattern for 100 TB multimodal training data: media lives in a
``binary`` column next to typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions inside
``mapInPandas`` so each task streams record batches without materializing
a partition, and the bytes never route through the driver.

This container has no image/audio codecs (no PIL/ffmpeg/librosa), so real
formats (JPEG/PNG/WAV/MP4) are STUBBED: ``decode_media`` raises
NotImplementedError for them, by design. The Spark-side plumbing — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested via
a deterministic toy codec:

- FIMG: b"FIMG" u8-height u8... header ``FIMG`` + uint16 height + uint16
  width + uint8 channels + raw uint8 pixels (row-major).
- FAUD: header ``FAUD`` + uint32 sample_rate + int16 PCM samples.
- FVID: header ``FVID`` + uint16 n_frames + concatenated FIMG frames.

All integers little-endian. Synthetic blobs are generated deterministically
from the documents fixture (seeded per doc_id), so inputs derive from the
driver-provided tables. Feature extraction (channel stats, nearest-neighbor
resize, RMS/zero-crossings, frame sampling) is real numpy — only the
real-world codec layer is a stub.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, "
    "meta struct<height:int, width:int, channels:int, sample_rate:int, n_frames:int>"
)

# ---------------------------------------------------------------------------
# Toy codec (deterministic stand-in for PIL/ffmpeg — see module docstring)
# ---------------------------------------------------------------------------


def encode_fimg(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    return b"FIMG" + struct.pack("<HHB", h, w, c) + pixels.astype(np.uint8).tobytes()


def decode_fimg(data: bytes) -> np.ndarray:
    if data[:4] != b"FIMG":
        raise NotImplementedError(
            "real image codecs (JPEG/PNG) are not available in this "
            "environment; only the FIMG toy format is decodable"
        )
    h, w, c = struct.unpack("<HHB", data[4:9])
    return np.frombuffer(data[9 : 9 + h * w * c], dtype=np.uint8).reshape(h, w, c)


def encode_faud(samples: np.ndarray, sample_rate: int) -> bytes:
    return b"FAUD" + struct.pack("<I", sample_rate) + samples.astype("<i2").tobytes()


def decode_faud(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"FAUD":
        raise NotImplementedError(
            "real audio codecs (WAV/MP3) are not available in this "
            "environment; only the FAUD toy format is decodable"
        )
    (rate,) = struct.unpack("<I", data[4:8])
    return np.frombuffer(data[8:], dtype="<i2"), rate


def encode_fvid(frames: list[np.ndarray]) -> bytes:
    blob = b"FVID" + struct.pack("<H", len(frames))
    for f in frames:
        enc = encode_fimg(f)
        blob += struct.pack("<I", len(enc)) + enc
    return blob


def decode_fvid(data: bytes) -> list[np.ndarray]:
    if data[:4] != b"FVID":
        raise NotImplementedError(
            "real video codecs (MP4/WebM) are not available in this "
            "environment; only the FVID toy format is decodable"
        )
    (n,) = struct.unpack("<H", data[4:6])
    frames, off = [], 6
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[off : off + 4])
        off += 4
        frames.append(decode_fimg(data[off : off + ln]))
        off += ln
    return frames


# ---------------------------------------------------------------------------
# Synthetic media table derived from the documents fixture
# ---------------------------------------------------------------------------


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media blobs seeded per doc_id: doc_id % 3 picks the
    modality. Runs distributed via mapInPandas — each Arrow batch yields
    its blobs without driver involvement, exactly how a real ingest joins
    object-store bytes onto a metadata table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                rng = np.random.RandomState(doc_id % (2**31))
                kind = ("image", "audio", "video")[doc_id % 3]
                meta = dict(height=0, width=0, channels=0, sample_rate=0, n_frames=0)
                if kind == "image":
                    h, w, c = int(rng.randint(8, 33)), int(rng.randint(8, 33)), 3
                    data = encode_fimg(rng.randint(0, 256, (h, w, c)))
                    meta.update(height=h, width=w, channels=c)
                elif kind == "audio":
                    rate, n = 16000, int(rng.randint(800, 3200))
                    data = encode_faud(
                        (rng.randn(n) * 3000).astype(np.int16), rate
                    )
                    meta.update(sample_rate=rate)
                else:
                    nf, h, w = int(rng.randint(2, 6)), 8, 8
                    data = encode_fvid(
                        [rng.randint(0, 256, (h, w, 3)) for _ in range(nf)]
                    )
                    meta.update(height=h, width=w, channels=3, n_frames=nf)
                out.append((int(doc_id), kind, data, meta))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "data", "meta"]
            )

    return documents.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------


def image_stats(media: DataFrame) -> DataFrame:
    """Decode image blobs and emit per-channel mean/std plus dimensions.
    Filter on kind is pushed below the decode — only image rows ever cross
    into Python, and only as Arrow batches."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                px = decode_fimg(bytes(blob)).astype(np.float64)
                rows.append(
                    (
                        int(mid),
                        px.shape[0],
                        px.shape[1],
                        round(float(px.mean()), 4),
                        round(float(px.std()), 4),
                        [round(float(m), 4) for m in px.mean(axis=(0, 1))],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "height", "width", "mean", "std", "channel_means"],
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(
            stats,
            "media_id long, height int, width int, mean double, std double, "
            "channel_means array<double>",
        )
    )


def resize_images(media: DataFrame, out_h: int = 16, out_w: int = 16) -> DataFrame:
    """Nearest-neighbor resize to (out_h, out_w), re-encoded as FIMG — the
    shape of a training-data preprocessing stage (decode → transform →
    re-encode) with constant memory per batch."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                px = decode_fimg(bytes(blob))
                yi = (np.arange(out_h) * px.shape[0] // out_h).astype(int)
                xi = (np.arange(out_w) * px.shape[1] // out_w).astype(int)
                rows.append((int(mid), encode_fimg(px[yi][:, xi])))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(resize, "media_id long, data binary")
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """Duration, RMS, and zero-crossing rate per audio blob."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                samples, rate = decode_faud(bytes(blob))
                x = samples.astype(np.float64)
                zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if len(x) > 1 else 0
                rows.append(
                    (
                        int(mid),
                        round(len(x) / rate, 4),
                        round(float(np.sqrt(np.mean(x**2))), 4) if len(x) else 0.0,
                        round(zc / max(len(x) - 1, 1), 4),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_sec", "rms", "zero_crossing_rate"]
            )

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "data")
        .mapInPandas(
            stats,
            "media_id long, duration_sec double, rms double, zero_crossing_rate double",
        )
    )


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Explode videos into every Nth frame, one FIMG row per kept frame —
    1 input row → K output rows, the mapInPandas analogue of the
    reference's Map-side record expansion (plugins/wc/wc.go:11-21)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                for idx, frame in enumerate(decode_fvid(bytes(blob))):
                    if idx % every == 0:
                        rows.append((int(mid), idx, encode_fimg(frame)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "data"])

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "data")
        .mapInPandas(frames, "media_id long, frame_idx int, data binary")
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata aggregation (no Python): blob sizes and
    counts per modality — metadata queries must not touch the bytes."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("data")).alias("total_bytes"),
            F.min(F.length("data")).alias("min_bytes"),
            F.max(F.length("data")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


def ahash64(px: np.ndarray) -> str:
    """64-bit average-hash of an image array: nearest-neighbor downsample
    to 8×8, channel-mean to gray, threshold at the gray mean, bits packed
    MSB-first into a fixed-width hex string. Pure numpy — the same
    function is the pytest ground-truth reference."""
    yi = (np.arange(8) * px.shape[0] // 8).astype(int)
    xi = (np.arange(8) * px.shape[1] // 8).astype(int)
    gray = px[yi][:, xi].astype(np.float64).mean(axis=2)
    bits = (gray > gray.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:016x}"


def image_phash_dupes(media: DataFrame) -> DataFrame:
    """Perceptual-hash image dedup: groups of images whose 64-bit
    average-hash is identical — (ahash, n_images, first_media_id,
    last_media_id), groups of size 1 dropped, ordered by first id.

    This is the multimodal twin of prefix_duplicates: decode + hash run
    as an Arrow-batched ``mapInPandas`` (bytes never reach the driver),
    then ONE 16-char-key census aggregate with map-side combine — the
    pixel data stays in the executors, only fixed-width hashes shuffle.
    A production pass would bucket on the hash and verify within buckets
    (the SimHash discipline); exact-equality groups are the precision-1
    core of that.

    Rows-only by nature (DuckDB cannot decode FIMG blobs);
    tests/test_multimodal.py pins every group against the numpy
    reference computed directly from the synthesized pixel arrays.
    """

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                rows.append((int(mid), ahash64(decode_fimg(bytes(blob)))))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    hashed = (
        media.where(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(hashes, "media_id long, ahash string")
    )
    return (
        hashed.groupBy("ahash")
        .agg(
            F.count("*").alias("n_images"),
            F.min("media_id").alias("first_media_id"),
            F.max("media_id").alias("last_media_id"),
        )
        .where(F.col("n_images") > 1)
        .orderBy("first_media_id")
    )


def media_with_replayed_images(documents: DataFrame) -> DataFrame:
    """Media fixture with at-least-once image replays: every 5th image
    blob re-appears under the NEGATIVE mirror id (-media_id − 1), which
    cannot collide with any real non-negative id at any SF (the
    incremental-dedup re-key lesson — no arithmetic offset to outgrow).
    Gives image_phash_dupes non-trivial exact-duplicate groups to find:
    each replayed blob forms a size-2 group with its original.

    The replay branch filters the DOCUMENTS (media_id = doc_id, kind =
    doc_id % 3, so image ∧ media_id % 5 == 0 ⟺ doc_id % 15 == 0) and
    re-synthesizes only that 1-in-15 slice — filtering a second full
    synthesize_media lineage would regenerate every blob twice."""
    media = synthesize_media(documents)
    replayed = synthesize_media(
        documents.where(F.col("doc_id") % 15 == 0)
    ).withColumn("media_id", -F.col("media_id") - 1)
    return media.unionByName(replayed)
