"""Silence trimming behavior."""

import numpy as np

from svcc23_fastsvc_tpu.dsp.trim import trim_silence


def test_trim_removes_silence_ends():
    sr = 16000
    rng = np.random.default_rng(0)
    sig = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
    y = np.concatenate([np.zeros(8000), sig, np.zeros(12000)]).astype(np.float32)
    trimmed, (start, end) = trim_silence(y, top_db=40)
    # trimmed span should cover the tone and little of the silence
    assert abs(start - 8000) < 2048
    assert abs(end - (8000 + sr)) < 2048
    assert len(trimmed) == end - start


def test_trim_all_silence():
    y = np.zeros(16000, np.float32)
    trimmed, span = trim_silence(y)
    # degenerate all-equal signal: everything is at max power -> kept whole
    assert len(trimmed) in (0, len(y))


def test_trim_keeps_loud_signal_intact():
    rng = np.random.default_rng(1)
    y = rng.standard_normal(16000).astype(np.float32)
    trimmed, (start, end) = trim_silence(y, top_db=60)
    assert end - start >= len(y) - 1024
