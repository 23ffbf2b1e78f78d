"""WAV I/O and resampling (host-side, like the reference's hound-based I/O).

Reference: mlx-rs-core/src/audio.rs load_wav (:46), save_wav (:178),
linear resample (:285). Pure numpy + stdlib wave — no external deps.
"""

from __future__ import annotations

import wave

import numpy as np


def load_wav(path: str, target_rate: int | None = None):
    """-> (samples float32 [-1, 1] mono, sample_rate)."""
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if target_rate and target_rate != rate:
        data = resample(data, rate, target_rate)
        rate = target_rate
    return data, rate


def save_wav(path: str, samples: np.ndarray, rate: int):
    samples = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = (samples * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def resample(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Band-limited resample via the native windowed-sinc kernel
    (ominix_mlx_tpu/native/resample.cc) — a quality upgrade over the
    reference's linear interpolation (audio.rs:285); numpy linear fallback
    when no C++ toolchain is present."""
    from ominix_mlx_tpu import native

    return native.resample_sinc(samples, src_rate, dst_rate)
