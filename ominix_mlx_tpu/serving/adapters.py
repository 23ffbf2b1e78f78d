"""Serving adapters: wrap the model facades into the duck-typed capability
objects the server routes on (synthesize / transcribe).

Counterpart of the reference's per-crate public APIs feeding the unified
server (README.md:444-490)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class TTSAdapter:
    """Wraps a qwen3_tts.Synthesizer + tokenizer into synthesize(text)."""

    def __init__(self, synthesizer, tokenizer, codec_prefix,
                 sample_rate: int = 24000, speed: float = 1.0):
        self.synth = synthesizer
        self.tokenizer = tokenizer
        self.codec_prefix = list(codec_prefix)
        self.sample_rate = sample_rate
        self.speed = speed
        self.dir = "<assembled>"

    def synthesize(self, text: str, voice: Optional[str] = None):
        from ominix_mlx_tpu.audio.dsp import wsola_time_stretch

        ids = self.tokenizer.encode(text)
        res = self.synth.synthesize_codes(ids, self.codec_prefix)
        wav = (self.synth.decode_audio(res.codes)
               if self.synth.codec is not None
               else np.zeros((res.frames * 1920,), np.float32))
        if self.speed != 1.0:
            wav = wsola_time_stretch(wav, self.sample_rate, self.speed)
        return wav, self.sample_rate


class ASRAdapter:
    """Wraps a qwen3_asr.Qwen3ASR (or funasr facade) into
    transcribe(samples, rate)."""

    def __init__(self, model, tokenizer, prompt_prefix, prompt_suffix,
                 stop_tokens=()):
        self.model = model
        self.tokenizer = tokenizer
        self.prefix = jnp.asarray(prompt_prefix, jnp.int32)
        self.suffix = jnp.asarray(prompt_suffix, jnp.int32)
        self.stop_tokens = tuple(stop_tokens)
        self.dir = "<assembled>"

    def transcribe(self, samples: np.ndarray, rate: int) -> str:
        from ominix_mlx_tpu.audio.io import resample

        if rate != 16000:
            samples = resample(np.asarray(samples, np.float32), rate, 16000)
        feats = self.model.encode_audio(jnp.asarray(samples))
        ids = self.model.transcribe_embeds(feats, self.prefix, self.suffix,
                                           stop_tokens=self.stop_tokens)
        return self.tokenizer.decode(ids)
