"""On-device audio DSP: framed STFT (jnp.fft.rfft), mel filterbanks, LFR+CMVN.

TPU-native replacement for the reference's audio frontend
(mlx-rs-core/src/audio.rs): its naive O(n^2) CPU DFT ``stft_magnitude``
(audio.rs:415) and rustfft paths become ONE jitted framed-rfft — the
reference's own GPU-STFT module (gpt-sovits-mlx/src/audio/stft_gpu.rs:30-120)
proves this is the right shape; on TPU the whole mel pipeline is a single
XLA program (frame gather -> window -> rfft -> |.|^2 -> mel matmul -> log).

Covers every frontend variant used by the model families:
  - Whisper-style log-mel (qwen3-asr: 128 mels, n_fft 400, hop 160,
    qwen3-asr-mlx/src/audio.rs:1-8)
  - Paraformer 80-mel + LFR (7-frame stack, stride 6) + CMVN
    (funasr-mlx/src/paraformer.rs:155-278, audio.rs:616-666)
  - GPT-SoVITS raw-magnitude STFT mel (audio.rs:482)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, periodic: bool = True) -> jax.Array:
    """Hann window (reference: audio.rs:352)."""
    m = n if periodic else n - 1
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n) / m)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center",
                                             "pad_mode", "window_fn"))
def stft(samples: jax.Array, n_fft: int = 400, hop: int = 160,
         center: bool = True, pad_mode: str = "reflect",
         window_fn=hann_window) -> jax.Array:
    """[T] float32 -> complex spectrogram [frames, n_fft//2 + 1].

    Framed rfft: frames are gathered with a static index grid so XLA lowers
    the whole thing to one gather + batched FFT (the TPU version of
    stft_gpu.rs:30).
    """
    if center:
        pad = n_fft // 2
        samples = jnp.pad(samples, (pad, pad), mode=pad_mode)
    n = samples.shape[0]
    num_frames = 1 + (n - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])             # static [F, n_fft]
    frames = samples[jnp.asarray(idx)]
    frames = frames * window_fn(n_fft)
    return jnp.fft.rfft(frames, axis=-1)


def _hz_to_mel(f, htk: bool):
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_step = np.log(6.4) / 27.0
    brk = 1000.0
    above = f >= brk
    mel = np.where(above, 15.0 + np.log(np.maximum(f, brk) / brk) / log_step, mel)
    return mel


def _mel_to_hz(m, htk: bool):
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    log_step = np.log(6.4) / 27.0
    above = m >= 15.0
    return np.where(above, 1000.0 * np.exp(log_step * (np.maximum(m, 15.0) - 15.0)), f)


@functools.lru_cache(maxsize=None)
def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   htk: bool = False, norm: Optional[str] = "slaney"):
    """[n_mels, n_fft//2+1] triangular filterbank (reference: audio.rs:371).

    Built host-side in numpy (static per config), applied as one matmul.
    """
    fmax = fmax or sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_bins)
    mels = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz = _mel_to_hz(mels, htk)
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    if norm == "slaney":
        enorm = 2.0 / (hz[2:] - hz[:-2])
        fb *= enorm[:, None]
    # cache NUMPY, not a jax array: under a jit trace jnp.asarray yields a
    # tracer, and lru_cache would leak it into later traces
    return np.asarray(fb, np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels",
                                             "sample_rate", "htk", "log_base",
                                             "whisper_norm", "center"))
def log_mel_spectrogram(samples: jax.Array, n_fft: int = 400, hop: int = 160,
                        n_mels: int = 128, sample_rate: int = 16000,
                        htk: bool = False, log_base: str = "log10",
                        whisper_norm: bool = True,
                        center: bool = True) -> jax.Array:
    """Whisper-compatible log-mel: [T] -> [frames, n_mels].

    Matches the qwen3-asr frontend (qwen3-asr-mlx/src/audio.rs): power
    spectrum -> mel -> log10 -> clamp to (max - 8) -> (x + 4) / 4.
    """
    spec = stft(samples, n_fft, hop, center=center)
    power = jnp.abs(spec) ** 2                        # [F, bins]
    fb = mel_filterbank(n_mels, n_fft, sample_rate, htk=htk)
    mel = power @ fb.T                                 # [F, n_mels]
    mel = jnp.maximum(mel, 1e-10)
    logm = jnp.log10(mel) if log_base == "log10" else jnp.log(mel)
    if whisper_norm:
        logm = jnp.maximum(logm, logm.max() - 8.0)
        logm = (logm + 4.0) / 4.0
    return logm


@functools.partial(jax.jit, static_argnames=("lfr_m", "lfr_n"))
def apply_lfr(feats: jax.Array, lfr_m: int = 7, lfr_n: int = 6) -> jax.Array:
    """Low-frame-rate stacking: stack lfr_m frames every lfr_n
    (Paraformer frontend, reference: mlx-rs-core/src/audio.rs:666)."""
    T, D = feats.shape
    # left-pad with (lfr_m - 1) // 2 copies of the first frame
    lpad = (lfr_m - 1) // 2
    padded = jnp.concatenate([jnp.repeat(feats[:1], lpad, axis=0), feats], 0)
    Tp = padded.shape[0]
    n_out = (T + lfr_n - 1) // lfr_n
    # pad end so every window is full
    need = (n_out - 1) * lfr_n + lfr_m
    if need > Tp:
        padded = jnp.concatenate(
            [padded, jnp.repeat(padded[-1:], need - Tp, axis=0)], 0)
    idx = (np.arange(n_out)[:, None] * lfr_n + np.arange(lfr_m)[None, :])
    return padded[jnp.asarray(idx)].reshape(n_out, lfr_m * D)


def apply_cmvn(feats: jax.Array, means: jax.Array, vars_: jax.Array) -> jax.Array:
    """Global CMVN (reference: CmvnStats, audio.rs:616)."""
    return (feats + means) * vars_


def wsola_time_stretch(samples, rate: int, speed: float,
                       frame_ms: float = 30.0, overlap_ms: float = 10.0,
                       search_ms: float = 8.0):
    """WSOLA time-stretching for TTS speed control (reference:
    qwen3-tts-mlx/src/lib.rs:1063). Host-side numpy (it is a small
    sequential search over ms-scale windows). speed > 1 shortens audio."""
    x = np.asarray(samples, np.float32)
    if abs(speed - 1.0) < 1e-3 or len(x) == 0:
        return x
    frame = int(rate * frame_ms / 1000)
    overlap = int(rate * overlap_ms / 1000)
    search = int(rate * search_ms / 1000)
    hop_out = frame - overlap
    hop_in = int(round(hop_out * speed))
    n_frames = max(1, (len(x) - frame - search) // hop_in)
    out = np.zeros(n_frames * hop_out + frame, np.float32)
    win = np.hanning(2 * overlap + 1)[:overlap] if overlap else None
    prev_tail = None
    pos_out = 0
    for i in range(n_frames):
        target = i * hop_in
        if prev_tail is not None and search > 0:
            lo = max(0, target - search)
            hi = min(len(x) - frame, target + search)
            best, best_c = target, -np.inf
            for cand in range(lo, hi + 1, max(1, search // 16)):
                seg = x[cand:cand + overlap]
                c = float(np.dot(seg, prev_tail))
                if c > best_c:
                    best_c, best = c, cand
            target = best
        seg = x[target:target + frame]
        if len(seg) < frame:
            seg = np.pad(seg, (0, frame - len(seg)))
        if prev_tail is not None and overlap:
            out[pos_out:pos_out + overlap] *= (1 - win)
            out[pos_out:pos_out + overlap] += seg[:overlap] * win
            out[pos_out + overlap:pos_out + frame] = seg[overlap:]
        else:
            out[pos_out:pos_out + frame] = seg
        prev_tail = x[target + hop_out:target + hop_out + overlap]
        pos_out += hop_out
    return out[:pos_out + overlap]
