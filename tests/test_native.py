"""Native C++ resampler: DC gain, tone preservation, aliasing rejection,
PCM conversion roundtrip. Falls back (and the test still passes) without g++."""

import numpy as np

from ominix_mlx_tpu import native


def test_resampler_dc_gain():
    x = np.ones(1000, np.float32) * 0.7
    y = native.resample_sinc(x, 16000, 24000)
    assert abs(len(y) - 1500) <= 1
    np.testing.assert_allclose(y[50:-50], 0.7, atol=1e-3)


def test_resampler_preserves_tone():
    sr1, sr2, f = 16000, 48000, 440.0
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = native.resample_sinc(x, sr1, sr2)
    t2 = np.arange(len(y)) / sr2
    want = np.sin(2 * np.pi * f * t2).astype(np.float32)
    err = np.abs(y[200:-200] - want[200:-200]).max()
    assert err < 0.05, err


def test_downsample_rejects_alias():
    """A tone above the target Nyquist must be strongly attenuated (the
    linear resampler of the reference aliases it back in)."""
    if not native.available():
        return  # numpy fallback is linear; property only holds natively
    sr1, sr2 = 48000, 8000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 7000.0 * t).astype(np.float32)  # > 4k Nyquist
    y = native.resample_sinc(x, sr1, sr2, taps=32)
    rms = np.sqrt(np.mean(y[500:-500] ** 2))
    assert rms < 0.15, rms


def test_pcm_roundtrip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    pcm = native.float_to_pcm16(x)
    back = native.pcm16_to_float(pcm)
    np.testing.assert_allclose(back, x, atol=2.0 / 32768)
