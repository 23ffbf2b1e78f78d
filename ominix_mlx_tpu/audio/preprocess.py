"""GPT-SoVITS dataset preprocessing: slicer, denoiser, ASR labeling.

Behavior-parity port of the reference preprocessing module
(gpt-sovits-mlx/src/preprocessing/{slicer.rs:1-449, denoise.rs:1-347,
asr.rs:1-274, mod.rs:50-232}), which itself ports GPT-SoVITS's slicer2.py.
TPU-first split of labor:

  - the SLICER state machine is inherently sequential and tiny (one scalar
    per 20ms frame) -> host numpy, with the RMS framing vectorized;
  - the DENOISER is a dense STFT -> magnitude op -> ISTFT chain -> one jit
    on device (the reference runs a naive O(n^2) DFT per frame on CPU,
    denoise.rs:95-117 even says "for production, use FFT library");
  - LABELING drives any model exposing ``transcribe(samples, rate)``
    (paraformer, qwen3-asr adapters) and writes the GPT-SoVITS
    ``path|speaker|lang|text`` list format (mod.rs:195-216).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Tuple

import numpy as np


# ------------------------------------------------------------- slicer -------

@dataclasses.dataclass
class SlicerConfig:
    sample_rate: int = 32000
    threshold_db: float = -40.0
    min_length_ms: int = 5000
    min_interval_ms: int = 300
    hop_size_ms: int = 20
    max_sil_kept_ms: int = 1000
    max_amplitude: float = 0.9
    alpha: float = 0.25


class Slicer:
    """Silence-detection audio slicer (slicer2 semantics, slicer.rs:76-290)."""

    def __init__(self, config: SlicerConfig = SlicerConfig()):
        self.config = config
        sr = float(config.sample_rate)
        self.threshold = 10.0 ** (config.threshold_db / 20.0)
        self.hop_size = int(round(sr * config.hop_size_ms / 1000.0))
        min_interval_samples = int(round(sr * config.min_interval_ms / 1000.0))
        self.win_size = min(min_interval_samples, 4 * self.hop_size)
        self.min_length = int(round(sr * config.min_length_ms / 1000.0
                                    / self.hop_size))
        self.min_interval = int(round(min_interval_samples / self.hop_size))
        self.max_sil_kept = int(round(sr * config.max_sil_kept_ms / 1000.0
                                      / self.hop_size))

    def _rms(self, samples: np.ndarray) -> np.ndarray:
        """Per-frame RMS over centered windows (vectorized framing)."""
        fl, hop = self.win_size, self.hop_size
        pad = fl // 2
        x = np.pad(samples.astype(np.float32), (pad, pad))
        n_frames = (len(x) - fl) // hop + 1
        idx = np.arange(n_frames)[:, None] * hop + np.arange(fl)[None, :]
        frames = x[idx]
        return np.sqrt(np.mean(frames * frames, axis=1))

    def slice(self, samples: np.ndarray
              ) -> List[Tuple[np.ndarray, int, int]]:
        """-> [(chunk_samples, start_ms, end_ms)] (slicer.rs:152-290)."""
        sr = float(self.config.sample_rate)
        total = len(samples)
        if total <= self.min_length * self.hop_size:
            return [(np.asarray(samples), 0, int(total / sr * 1000))]

        rms = self._rms(np.asarray(samples))
        total_frames = len(rms)
        sil_tags: List[Tuple[int, int]] = []
        silence_start: Optional[int] = None
        clip_start = 0

        def argmin(lo, hi):
            return int(np.argmin(rms[lo:hi])) + lo

        for i, r in enumerate(rms):
            if r < self.threshold:
                if silence_start is None:
                    silence_start = i
                continue
            if silence_start is None:
                continue
            s = silence_start
            is_leading = s == 0 and i > self.max_sil_kept
            need = (i - s >= self.min_interval
                    and i - clip_start >= self.min_length)
            if not is_leading and not need:
                silence_start = None
                continue
            if i - s <= self.max_sil_kept:
                pos = argmin(s, min(i + 1, total_frames))
                if s == 0:
                    sil_tags.append((0, pos))
                else:
                    sil_tags.append((pos, pos))
                clip_start = pos
            elif i - s <= self.max_sil_kept * 2:
                lo = max(i - self.max_sil_kept, 0)
                hi = min(s + self.max_sil_kept + 1, total_frames)
                pos = argmin(lo, hi)
                pos_l = argmin(s, hi)
                pos_r = argmin(lo, min(i + 1, total_frames))
                if s == 0:
                    sil_tags.append((0, pos_r))
                    clip_start = pos_r
                else:
                    sil_tags.append((min(pos_l, pos), max(pos_r, pos)))
                    clip_start = max(pos_r, pos)
            else:
                pos_l = argmin(s, min(s + self.max_sil_kept + 1, total_frames))
                pos_r = argmin(max(i - self.max_sil_kept, 0),
                               min(i + 1, total_frames))
                sil_tags.append((0, pos_r) if s == 0 else (pos_l, pos_r))
                clip_start = pos_r
            silence_start = None

        if silence_start is not None \
                and total_frames - silence_start >= self.min_interval:
            pos = argmin(silence_start,
                         min(silence_start + self.max_sil_kept + 1,
                             total_frames))
            sil_tags.append((pos, total_frames))

        if not sil_tags:
            return [(np.asarray(samples), 0, int(total / sr * 1000))]

        def ms(sample_idx):
            return int(sample_idx / sr * 1000)

        chunks = []
        if sil_tags[0][0] > 0:
            end = min(sil_tags[0][0] * self.hop_size, total)
            chunks.append((samples[:end], 0, ms(end)))
        for (a, b2), (c, _) in zip(sil_tags, sil_tags[1:]):
            start, end = b2 * self.hop_size, min(c * self.hop_size, total)
            if start < end <= total:
                chunks.append((samples[start:end], ms(start), ms(end)))
        if sil_tags[-1][1] < total_frames:
            start = sil_tags[-1][1] * self.hop_size
            if start < total:
                chunks.append((samples[start:], ms(start), ms(total)))
        return chunks

    def normalize(self, chunk: np.ndarray) -> np.ndarray:
        """Peak-normalize >1.0 then alpha-mix toward max_amplitude
        (slicer.rs:292-310)."""
        x = np.asarray(chunk, np.float32).copy()
        m = float(np.max(np.abs(x))) if len(x) else 0.0
        if m > 1.0:
            x /= m
        target = self.config.max_amplitude * self.config.alpha
        return x / max(m, 1.0) * target + (1.0 - self.config.alpha) * x

    def slice_file(self, input_path: str, output_dir: str
                   ) -> List[Tuple[str, int, int]]:
        """Slice a wav file into normalized chunk wavs; returns
        [(chunk_path, start_ms, end_ms)]."""
        from ominix_mlx_tpu.audio import io as audio_io
        samples, _rate = audio_io.load_wav(
            input_path, target_rate=self.config.sample_rate)
        os.makedirs(output_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(input_path))[0]
        out = []
        for chunk, start_ms, end_ms in self.slice(np.asarray(samples)):
            path = os.path.join(output_dir,
                                f"{stem}_{start_ms:010d}_{end_ms:010d}.wav")
            audio_io.save_wav(path, self.normalize(chunk),
                              self.config.sample_rate)
            out.append((path, start_ms, end_ms))
        return out


# ------------------------------------------------------------ denoiser ------

@dataclasses.dataclass
class DenoiseConfig:
    sample_rate: int = 32000
    n_fft: int = 2048
    hop_length: int = 512
    noise_frames: int = 10
    spectral_floor: float = 0.01
    over_subtraction: float = 1.0


def denoise(samples: np.ndarray,
            config: DenoiseConfig = DenoiseConfig()) -> np.ndarray:
    """Spectral-subtraction denoise (denoise.rs:120-220): noise magnitude is
    estimated from the first ``noise_frames`` STFT frames, subtracted with a
    spectral floor, and the signal is rebuilt from the original phase. The
    whole chain is one jitted on-device STFT -> mask -> ISTFT."""
    import jax
    import jax.numpy as jnp

    from ominix_mlx_tpu.audio.dsp import hann_window, stft

    n = len(samples)
    if n < config.n_fft:
        return np.asarray(samples, np.float32)

    n_fft, hop = config.n_fft, config.hop_length

    @jax.jit
    def run(x):
        spec = stft(x, n_fft=n_fft, hop=hop, center=True)   # [F, bins]
        mag = jnp.abs(spec)
        phase = spec / jnp.maximum(mag, 1e-12)
        noise = jnp.mean(mag[:config.noise_frames], axis=0, keepdims=True)
        clean = jnp.maximum(mag - config.over_subtraction * noise,
                            config.spectral_floor * mag)
        frames = jnp.fft.irfft(clean * phase, n=n_fft, axis=-1)
        win = hann_window(n_fft)
        frames = frames * win
        # overlap-add with window-square normalization
        F = frames.shape[0]
        length = n_fft + (F - 1) * hop
        idx = (np.arange(F)[:, None] * hop
               + np.arange(n_fft)[None, :]).reshape(-1)
        out = jnp.zeros((length,)).at[idx].add(frames.reshape(-1))
        wsum = jnp.zeros((length,)).at[idx].add(
            jnp.tile(win * win, (F, 1)).reshape(-1))
        return out / jnp.maximum(wsum, 1e-8)

    y = np.asarray(run(jnp.asarray(samples, jnp.float32)))
    pad = n_fft // 2                       # stft(center=True) padding
    return y[pad:pad + n].astype(np.float32)


# ------------------------------------------------------------ pipeline ------

class PreprocessPipeline:
    """slice -> (denoise) -> transcribe -> GPT-SoVITS list file
    (mod.rs:108-232). ``transcriber`` is any object exposing
    ``transcribe(samples: np.ndarray, rate: int) -> str`` (the server's ASR
    capability contract), language tags the list entries."""

    def __init__(self, transcriber=None, slicer: Optional[Slicer] = None,
                 enable_denoise: bool = False,
                 denoise_config: DenoiseConfig = DenoiseConfig(),
                 language: str = "zh", speaker: str = "speaker"):
        self.slicer = slicer or Slicer()
        self.transcriber = transcriber
        self.enable_denoise = enable_denoise
        self.denoise_config = denoise_config
        self.language = language
        self.speaker = speaker

    def process_file(self, input_path: str, output_dir: str) -> List[dict]:
        from ominix_mlx_tpu.audio import io as audio_io
        chunks = self.slicer.slice_file(input_path, output_dir)
        results = []
        for path, start_ms, end_ms in chunks:
            samples, rate = audio_io.load_wav(path)
            if self.enable_denoise:
                samples = denoise(np.asarray(samples), self.denoise_config)
                audio_io.save_wav(path, samples, rate)
            text = (self.transcriber.transcribe(np.asarray(samples), rate)
                    if self.transcriber is not None else "")
            results.append({"audio_path": path, "start_ms": start_ms,
                            "end_ms": end_ms, "transcript": text,
                            "language": self.language})
        return results

    def process_directory(self, input_dir: str, output_dir: str
                          ) -> List[dict]:
        results = []
        for name in sorted(os.listdir(input_dir)):
            if name.rsplit(".", 1)[-1].lower() == "wav":
                results.extend(self.process_file(
                    os.path.join(input_dir, name), output_dir))
        return results

    def write_transcript_list(self, results: List[dict], output_path: str):
        """``audio_path|speaker|language|transcript`` per line
        (mod.rs:195-216; GPT-SoVITS training list format)."""
        with open(output_path, "w", encoding="utf-8") as f:
            for r in results:
                f.write(f"{r['audio_path']}|{self.speaker}"
                        f"|{r.get('language', self.language)}"
                        f"|{r['transcript']}\n")
