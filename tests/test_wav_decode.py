"""Real WAV decode path (stdlib ``wave``, no soft deps): synthesized
RIFF/PCM fixtures run through the distributed operators and are checked
against numpy ground truth computed outside Spark."""

from __future__ import annotations

import io
import math
import wave

import numpy as np
import pytest

from database_fragmentation_and_query_processor_spark.multimodal import (
    binary_ops as B,
)


def _make_wav(freq_hz: float, n_frames: int, sr: int = 8000,
              n_ch: int = 1, amp: int = 12000) -> bytes:
    t = np.arange(n_frames, dtype=np.float64) / sr
    x = (amp * np.sin(2 * math.pi * freq_hz * t)).astype("<i2")
    pcm = np.repeat(x[:, None], n_ch, axis=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_decode_wav_roundtrip():
    raw = _make_wav(440.0, 1000, sr=16000, n_ch=2)
    sr, n_ch, pcm = B.decode_wav(raw)
    assert (sr, n_ch) == (16000, 2)
    assert pcm.shape == (1000, 2)
    assert pcm.dtype == np.int16
    # channels are duplicates of the same sine
    assert (pcm[:, 0] == pcm[:, 1]).all()


def test_decode_wav_rejects_non_16bit():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x80" * 64)
    with pytest.raises(ValueError, match="16-bit"):
        B.decode_wav(buf.getvalue())


def test_wav_features_matches_numpy(spark):
    payloads = [
        (1, _make_wav(440.0, 2000, sr=8000)),
        (2, _make_wav(100.0, 4000, sr=16000, n_ch=2)),
        (3, _make_wav(50.0, 123, sr=4000)),
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {r["media_id"]: r for r in B.wav_features(df).collect()}
    assert set(got) == {1, 2, 3}
    for mid, raw in payloads:
        sr, n_ch, pcm = B.decode_wav(raw)
        r = got[mid]
        assert r["sample_rate"] == sr
        assert r["n_channels"] == n_ch
        assert r["n_frames"] == pcm.shape[0]
        assert r["duration_sec"] == pytest.approx(pcm.shape[0] / sr)
        assert r["peak_amp"] == int(np.abs(pcm).max())
        x = pcm.astype(np.float64)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))


def test_wav_frame_rms_matches_numpy(spark):
    raw = _make_wav(440.0, 1000, sr=8000)
    df = spark.createDataFrame([(7, raw)], "media_id long, payload binary")
    frame, hop = 256, 128
    rows = sorted(
        B.wav_frame_rms(df, frame=frame, hop=hop).collect(),
        key=lambda r: r["frame_idx"],
    )
    _sr, _nc, pcm = B.decode_wav(raw)
    mono = pcm.astype(np.float64).mean(axis=1)
    n = mono.size
    n_f = max((max(n - frame, 0) + hop - 1) // hop, 0) + 1
    assert len(rows) == n_f
    for r in rows:
        s = r["frame_idx"] * hop
        seg = mono[s : s + frame]
        want = float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
        assert r["start_frame"] == s
        assert r["rms"] == pytest.approx(want), r["frame_idx"]


def test_wav_frame_rms_constant_signal(spark):
    """A DC signal's RMS equals its amplitude in every full frame —
    catches any prefix-sum misalignment."""
    sr, amp, n = 8000, 5000, 512
    pcm = np.full(n, amp, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    df = spark.createDataFrame([(1, buf.getvalue())],
                               "media_id long, payload binary")
    for r in B.wav_frame_rms(df, frame=128, hop=64).collect():
        assert r["rms"] == pytest.approx(float(amp))
