"""Audio/video codecs (crawlspark.av) + their Spark operators.

The analytic assertions (sine RMS = A/√2, ZCR = 2·f0/sr, exact int16
round-trip) are independent of the shared decode code, so they pin the
codec itself — the VALUES oracles in __spark_entry__ then pin the executor
path against the same math."""

import math
import struct

import numpy as np
import pytest

from crawlspark import av


def test_wav_roundtrip_exact():
    x = np.linspace(-1, 1, 1000)
    sr, nch, y = av.decode_wav(av.encode_wav(x, 8000))
    assert (sr, nch) == (8000, 1)
    # int16 quantization is the only loss
    assert np.abs(y[:, 0] - x).max() <= 1.0 / 32767 + 1e-12


def test_wav_stereo_and_chunk_walk():
    x = np.stack([np.sin(np.arange(400) / 10), np.cos(np.arange(400) / 10)], axis=1) * 0.5
    data = av.encode_wav(x, 16000)
    # splice an unknown chunk between WAVE and fmt — the RIFF walk must skip it
    extra = b"LIST" + struct.pack("<I", 6) + b"info!!"
    spliced = data[:12] + extra + data[12:]
    sr, nch, y = av.decode_wav(spliced)
    assert (sr, nch) == (16000, 2)
    assert y.shape == (400, 2)


def test_sine_rms_and_zcr_analytic():
    sr, f0, amp, secs = 8000, 400.0, 0.6, 1.0
    t = np.arange(int(sr * secs)) / sr
    x = amp * np.sin(2 * np.pi * f0 * t)
    f = av.audio_feature_row(av.encode_wav(x, sr))
    assert abs(f["rms"] - amp / math.sqrt(2)) < 1e-3
    assert abs(f["zcr"] - 2 * f0 / sr) < 2e-3  # 2 crossings per period
    assert abs(f["duration_s"] - secs) < 1e-9
    assert abs(f["peak"] - amp) < 1e-3


@pytest.mark.parametrize(
    "bad",
    [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"definitely not a wav"],
)
def test_wav_corrupt_raises(bad):
    with pytest.raises(ValueError):
        av.decode_wav(bad)


def test_vppm_roundtrip_and_truncation():
    frames = [np.full((4, 4, 3), i * 20, dtype=np.uint8) for i in range(5)]
    data = av.encode_vppm(frames)
    back = av.decode_vppm(data)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        av.decode_vppm(data[:-3])
    with pytest.raises(ValueError):
        av.decode_vppm(b"nope")


def test_audio_features_operator_flags_corrupt(spark):
    from crawlspark.datapipe.multimodal import audio_features

    clips = [("good", av.encode_wav(av.synth_tone("good"), 8000)), ("bad", b"junk")]
    out = {r.clip_id: r for r in audio_features(
        spark.createDataFrame(clips, "clip_id string, bytes binary")).collect()}
    assert out["good"].decode_ok and out["good"].sr == 8000
    assert not out["bad"].decode_ok and out["bad"].rms is None


def test_video_frame_sample_operator(spark):
    from crawlspark.datapipe.multimodal import video_frame_sample

    clips = [("v1", av.synth_video("v1", n_frames=10)), ("vbad", b"VPPMx")]
    rows = video_frame_sample(
        spark.createDataFrame(clips, "clip_id string, bytes binary"), every_n=3
    ).collect()
    got = sorted((r.clip_id, r.frame_no) for r in rows)
    assert got == [("v1", 0), ("v1", 3), ("v1", 6), ("v1", 9)]  # bad clip dropped
    assert all(r.fh == 8 and r.fw == 8 for r in rows)
