"""Audio/video codecs with zero external dependencies — numpy + struct only.

Round 2 shipped audio/video as loud NotImplementedError stubs ("no codec
libs in this sandbox"). That was too pessimistic for two real formats:

  * WAV/PCM16 is pure struct parsing (RIFF header walk + int16 buffer) —
    a genuine audio decode, no codec library involved;
  * a motion-PPM container ("VPPM": magic, frame count, length-prefixed PPM
    frames — the same self-describing shape as MJPEG) reuses the existing
    numpy PPM codec (crawlspark.image) for a genuine frame-decode path.

Real media (MP3/H.264) still needs external codecs; the decode seam here is
exactly where they would plug in, and everything downstream (Arrow batch
shape, feature math, oracle twins) is format-agnostic.

Reference note: scrapemate has no audio/video analog (response.go:9-27
carries only body + screenshot bytes) — this is graft-axis work for the
multimodal training-data pipeline, mirrored on the image codecs'
design (image.py).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV / PCM16
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """PCM16 little-endian WAV. `samples` is float in [-1, 1], shape (N,) or
    (N, n_channels); clipped then scaled to int16."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_channels = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = 2 * n_channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Parse a PCM16 WAV by walking RIFF chunks. Returns
    (sample_rate, n_channels, samples float64 in [-1, 1] shape (N, C)).
    Raises ValueError on anything that is not PCM16 RIFF/WAVE."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt_chunk, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("truncated fmt chunk")
            fmt_chunk = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_chunk is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt_chunk
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    raw = np.frombuffer(pcm[: (len(pcm) // (2 * n_channels)) * 2 * n_channels], dtype="<i2")
    x = raw.astype(np.float64).reshape(-1, n_channels) / 32767.0
    return sample_rate, n_channels, x


def synth_tone(clip_id: str, seconds: float = 0.5, sample_rate: int = 8000) -> np.ndarray:
    """Deterministic test tone per clip_id: fundamental + one harmonic, with
    md5-derived frequency/amplitude/phase (no RNG — same everywhere)."""
    h = hashlib.md5(clip_id.encode()).digest()
    f0 = 200.0 + (h[0] << 8 | h[1]) % 1800
    amp = 0.3 + (h[2] % 60) / 100.0
    phase = (h[3] / 255.0) * 2 * np.pi
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    x = amp * np.sin(2 * np.pi * f0 * t + phase) + 0.15 * np.sin(2 * np.pi * 2 * f0 * t)
    return np.clip(x, -1.0, 1.0)


def audio_feature_row(data: bytes) -> dict:
    """The shared decode+features math (executor kernel AND oracle twin):
    duration, RMS, zero-crossing rate, peak — rounded to 6 dp so the VALUES
    twin hashes identically."""
    sr, nch, x = decode_wav(bytes(data))
    mono = x.mean(axis=1)
    n = len(mono)
    zc = int(np.sum(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
    return {
        "sr": int(sr),
        "n_channels": int(nch),
        "duration_s": round(n / sr, 6),
        "rms": round(float(np.sqrt(np.mean(mono ** 2))) if n else 0.0, 6),
        "zcr": round(zc / max(n - 1, 1), 6),
        "peak": round(float(np.abs(mono).max()) if n else 0.0, 6),
    }


# ---------------------------------------------------------------------------
# VPPM — length-prefixed PPM frame container (the MJPEG shape)
# ---------------------------------------------------------------------------

VPPM_MAGIC = b"VPPM"


def encode_vppm(frames: list) -> bytes:
    """Container: magic + u32 frame count + per frame u32 length + PPM bytes."""
    from crawlspark import image as IMG

    out = [VPPM_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        ppm = IMG.encode_ppm(np.asarray(fr, dtype=np.uint8))
        out.append(struct.pack("<I", len(ppm)))
        out.append(ppm)
    return b"".join(out)


def decode_vppm(data: bytes) -> list:
    """Returns the list of H×W×3 uint8 frames; ValueError on malformed input."""
    from crawlspark import image as IMG

    if len(data) < 8 or data[:4] != VPPM_MAGIC:
        raise ValueError("not a VPPM stream")
    (n,) = struct.unpack("<I", data[4:8])
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated frame table")
        (ln,) = struct.unpack("<I", data[pos:pos + 4])
        pos += 4
        if pos + ln > len(data):
            raise ValueError("truncated frame payload")
        frames.append(IMG.decode_ppm(data[pos:pos + ln]))
        pos += ln
    return frames


def synth_video(clip_id: str, n_frames: int = 12, size: int = 8) -> bytes:
    """Deterministic clip: a bright block drifting across a dark background
    (so motion statistics are non-trivial), md5-seeded per clip_id."""
    h = hashlib.md5(clip_id.encode()).digest()
    frames = []
    for f in range(n_frames):
        px = np.full((size, size, 3), h[4] % 64, dtype=np.uint8)
        x0 = (h[5] + f) % size
        y0 = (h[6] + 2 * f) % size
        px[y0, x0] = (200 + h[7] % 56, 180, 120)
        frames.append(px)
    return encode_vppm(frames)


def video_frame_rows(clip_id: str, data: bytes, every_n: int = 3) -> list[dict]:
    """Shared frame-sampling math (executor kernel AND oracle twin): every
    n-th frame's dims, quantized mean luminance, and payload md5."""
    frames = decode_vppm(bytes(data))
    rows = []
    for fno in range(0, len(frames), every_n):
        px = frames[fno]
        lum = px.mean(axis=2)
        rows.append(
            {
                "clip_id": clip_id,
                "frame_no": fno,
                "fh": int(px.shape[0]),
                "fw": int(px.shape[1]),
                "lum_q": int(np.floor(float(lum.mean()) * 100)),
                "frame_md5": hashlib.md5(px.tobytes()).hexdigest(),
            }
        )
    return rows
