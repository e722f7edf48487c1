"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images are REAL (numpy codecs from crawlspark.image — no Pillow needed), and
as of round 3 audio and video are too: PCM16 WAV is pure RIFF struct parsing
and the VPPM frame container reuses the PPM codec (crawlspark.av), so both
decode paths run end-to-end in this sandbox with zero codec libraries.
Compressed formats (MP3/H.264) would plug into the same av.* seams.

Batch-shape notes for 100 TB: binary rows are big → mapInPandas (iterator of
Arrow batches) with a small maxRecordsPerBatch, and payload columns are joined
in ONLY for the stage that needs pixels (engine keeps bytes out of earlier
shuffles — SURVEY.md §4.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark import image as IMG

FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_lum double, "
    "contrast double, phash long, decode_ok boolean"
)

THUMB_SCHEMA = "image_id string, thumb binary, tw int, th int"


def image_features(images: DataFrame) -> DataFrame:
    """Decode → per-image luminance stats + phash, via iterator-of-batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, raw, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = IMG.DECODERS[fmt](bytes(raw))
                    lum = px.mean(axis=2)
                    rows.append(
                        (iid, px.shape[1], px.shape[0], fmt, float(lum.mean()),
                         float(lum.std()), IMG.average_hash(px), True)
                    )
                except Exception:
                    rows.append((iid, None, None, fmt, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "fmt", "mean_lum", "contrast", "phash", "decode_ok"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, FEATURES_SCHEMA)


def image_thumbnails(images: DataFrame, size: int = 8) -> DataFrame:
    """Block-mean resize to size×size, re-encoded as PPM — the vectorized
    'resize' stage of a multimodal pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, raw, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = IMG.DECODERS[fmt](bytes(raw))
                    h, w, _ = px.shape
                    bh, bw = max(h // size, 1), max(w // size, 1)
                    small = (
                        px[: bh * size, : bw * size]
                        .reshape(size, bh, size, bw, 3)
                        .mean(axis=(1, 3))
                        .astype(np.uint8)
                    )
                    rows.append((iid, IMG.encode_ppm(small), size, size))
                except Exception:
                    rows.append((iid, None, None, None))
            yield pd.DataFrame(rows, columns=["image_id", "thumb", "tw", "th"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, THUMB_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "clip_id string, sr int, n_channels int, duration_s double, rms double, "
    "zcr double, peak double, decode_ok boolean"
)


def audio_features(clips: DataFrame) -> DataFrame:
    """REAL audio decode (round 3 — was a NotImplementedError stub): PCM16
    WAV parsed by crawlspark.av (RIFF chunk walk + numpy int16 buffer, no
    codec library needed), then duration/RMS/zero-crossing-rate/peak per
    clip. Corrupt or non-PCM16 bytes → decode_ok=False row, never a task
    crash (M-5 panic-recovery semantics). Real compressed formats (MP3 …)
    would plug their decoder into av.audio_feature_row; everything else —
    batch shape, schema, oracle twin — is format-agnostic."""
    from crawlspark import av

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    f = av.audio_feature_row(raw)
                    rows.append(
                        (cid, f["sr"], f["n_channels"], f["duration_s"],
                         f["rms"], f["zcr"], f["peak"], True)
                    )
                except Exception:
                    rows.append((cid, None, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "sr", "n_channels", "duration_s", "rms",
                         "zcr", "peak", "decode_ok"],
            )

    return clips.select("clip_id", "bytes").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "clip_id string, frame_no int, fh int, fw int, lum_q long, frame_md5 string"
)


def video_frame_sample(clips: DataFrame, every_n: int = 3) -> DataFrame:
    """REAL frame sampling (round 3 — was a stub): VPPM containers
    (crawlspark.av — the MJPEG shape with PPM frames) are decoded per clip
    and every n-th frame yields dims + quantized mean luminance + a payload
    md5. Undecodable clips are dropped (their absence is the signal;
    audio_features shows the flag-column alternative)."""
    from crawlspark import av

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    rows.extend(av.video_frame_rows(cid, raw, every_n))
                except Exception:
                    continue
            yield pd.DataFrame(
                rows, columns=["clip_id", "frame_no", "fh", "fw", "lum_q", "frame_md5"]
            )

    return clips.select("clip_id", "bytes").mapInPandas(run, VIDEO_FRAMES_SCHEMA)


N_PHASH_BANDS = 8  # 64-bit hash → 8 bands of 8 bits


def phash_hamming_pairs(feat: DataFrame, max_dist: int = 7) -> DataFrame:
    """Near-duplicate images by perceptual-hash Hamming distance.

    Banding the 64-bit phash into 8 bands of 8 bits bounds the self-join —
    two hashes within distance d share at least one EXACT band whenever
    d < number of bands (pigeonhole: d differing bits can touch at most d
    bands). max_dist must therefore be < 8; larger radii silently lose
    recall (the round-1 bug: 4×16-bit bands called with max_dist=20).
    """
    if max_dist >= N_PHASH_BANDS:
        raise ValueError(
            f"max_dist={max_dist} breaks the pigeonhole guarantee of "
            f"{N_PHASH_BANDS}-band LSH (requires max_dist < {N_PHASH_BANDS})"
        )
    q = feat.select(
        "image_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("phash"), i * 8).bitwiseAND(F.lit(0xFF)).alias("chunk"),
                )
                for i in range(N_PHASH_BANDS)
            ])
        ).alias("bq"),
    ).select("image_id", "phash", F.col("bq.band").alias("band"), F.col("bq.chunk").alias("chunk"))
    a = q.select(F.col("image_id").alias("img_a"), F.col("phash").alias("pa"), "band", "chunk")
    b = q.select(F.col("image_id").alias("img_b"), F.col("phash").alias("pb"), "band", "chunk")
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("img_a") < F.col("img_b"))
        .select("img_a", "img_b", "pa", "pb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))))
        .filter(F.col("hamming") <= max_dist)
        .select("img_a", "img_b", F.col("hamming").cast("int").alias("hamming"))
    )
