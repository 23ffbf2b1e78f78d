"""Audio frontend tests: STFT vs numpy reference DFT, mel filterbank vs
librosa-style expectations, LFR shapes, WAV roundtrip. Mirrors the
reference's stft_gpu shape+numerics tests (gpt-sovits stft_gpu.rs:163-195)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.audio import dsp
from ominix_mlx_tpu.audio.io import load_wav, resample, save_wav


def test_stft_matches_numpy():
    t = np.arange(1600) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.3 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    got = np.asarray(dsp.stft(jnp.asarray(sig), n_fft=400, hop=160))
    # numpy reference
    pad = 200
    padded = np.pad(sig, (pad, pad), mode="reflect")
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(400) / 400))
    frames = np.lib.stride_tricks.sliding_window_view(padded, 400)[::160]
    want = np.fft.rfft(frames * win, axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_peak_bin():
    """A pure tone must peak at its frequency bin."""
    sr, n_fft = 16000, 400
    freq = 2000.0
    t = np.arange(sr) / sr
    sig = np.sin(2 * np.pi * freq * t).astype(np.float32)
    mag = np.abs(np.asarray(dsp.stft(jnp.asarray(sig), n_fft, 160)))
    peak = mag[10].argmax()
    assert abs(peak - freq * n_fft / sr) <= 1


def test_mel_filterbank_shape_and_coverage():
    fb = np.asarray(dsp.mel_filterbank(80, 400, 16000))
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_log_mel_whisper_shape():
    sig = jnp.asarray(np.random.default_rng(0).normal(size=16000)
                      .astype(np.float32))
    mel = dsp.log_mel_spectrogram(sig, 400, 160, 128, 16000)
    assert mel.shape == (101, 128)
    assert np.isfinite(np.asarray(mel)).all()


def test_lfr_stacking():
    feats = jnp.asarray(np.arange(20 * 4, dtype=np.float32).reshape(20, 4))
    out = np.asarray(dsp.apply_lfr(feats, 7, 6))
    assert out.shape == (4, 28)
    # first output frame: 3 copies of frame 0 (left pad) then frames 0..3
    np.testing.assert_array_equal(out[0, :4], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[0, 12:16], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[0, 16:20], [4, 5, 6, 7])


def test_wav_roundtrip_and_resample():
    sig = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)
           ).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.wav")
        save_wav(p, sig, 16000)
        back, rate = load_wav(p)
        assert rate == 16000
        np.testing.assert_allclose(back, sig, atol=1e-3)
        half, rate2 = load_wav(p, target_rate=8000)
        assert rate2 == 8000 and abs(len(half) - 4000) <= 1
    r = resample(sig, 16000, 24000)
    assert abs(len(r) - 12000) <= 1


def test_wsola_time_stretch_lengths():
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    fast = dsp.wsola_time_stretch(x, sr, 1.5)
    slow = dsp.wsola_time_stretch(x, sr, 0.75)
    assert 0.55 < len(fast) / len(x) < 0.8      # ~1/1.5
    assert 1.15 < len(slow) / len(x) < 1.5      # ~1/0.75
    assert np.abs(fast).max() <= 1.5


def test_playback_headless_fallback(monkeypatch, tmp_path):
    """audio.playback: import never fails; with no backend it raises a
    RuntimeError pointing at save_wav (reference: cpal playback,
    voice_clone.rs:1846 — headless hosts degrade gracefully)."""
    import shutil as _sh

    import numpy as np
    import pytest

    from ominix_mlx_tpu.audio import playback

    monkeypatch.setattr(_sh, "which", lambda name: None)
    wav = np.zeros(160, np.float32)
    try:
        backend = playback.play(wav, 16000)
    except RuntimeError as e:
        assert "save_wav" in str(e)
    else:
        assert isinstance(backend, str)
