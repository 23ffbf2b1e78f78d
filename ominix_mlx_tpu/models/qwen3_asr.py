"""Qwen3-ASR: AuT windowed-attention audio encoder + Qwen3 decoder.

TPU-native counterpart of reference crate qwen3-asr-mlx:
  - Whisper-compatible mel frontend (128 mels, n_fft 400, hop 160)
    (qwen3-asr-mlx/src/audio.rs:1-8) -> audio/dsp.py
  - AuT encoder: 3x Conv2d stride-2 (kernel 3, pad 1) + sinusoidal
    positions + block-windowed attention over 100-frame chunks
    (qwen3-asr-mlx/src/encoder.rs:1-40, 230-460)
  - Qwen3 decoder consuming spliced audio embeddings, language forcing
    (qwen3-asr-mlx/src/model.rs:576-673)

TPU design notes: chunks are all padded to exactly 100 frames so the conv
stack and transformer trace once per padded length (prompt-style length
buckets); the final partial chunk's invalid tokens are dropped with a
statically-shaped gather (chunk count and frame count are static per
bucket).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.audio.dsp import log_mel_spectrogram
from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.nn.layers import conv2d, init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    """Defaults mirror qwen3-asr-mlx/src/encoder.rs:43-53."""
    num_mel_bins: int = 128
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    d_model: int = 1024
    max_source_positions: int = 1500
    n_window: int = 50
    output_dim: int = 2048
    n_window_infer: int = 800
    downsample_hidden_size: int = 480

    @property
    def chunk_frames(self) -> int:
        return self.n_window * 2          # 100 mel frames per chunk

    @property
    def tokens_per_chunk(self) -> int:
        return out_length(self.chunk_frames)  # 13

    @staticmethod
    def from_hf(d: dict) -> "AudioEncoderConfig":
        keys = AudioEncoderConfig.__dataclass_fields__
        return AudioEncoderConfig(**{k: v for k, v in d.items() if k in keys})


def out_length(input_length: int) -> int:
    """Conv-stack output length incl. 100-frame chunking
    (reference: encoder.rs:76-80)."""
    leave = input_length % 100
    feat = (leave - 1) // 2 + 1
    return ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (input_length // 100) * 13


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """[length, channels]: sin in first half, cos in second
    (reference: encoder.rs:89-105)."""
    half = channels // 2
    log_ts = math.log(10000.0) / (half - 1)
    pos = np.arange(length)[:, None]
    scaled = pos * np.exp(-log_ts * np.arange(half))[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


def init_encoder_params(cfg: AudioEncoderConfig, key,
                        dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.encoder_layers + 8))
    ds = cfg.downsample_hidden_size
    d = cfg.d_model

    def conv_p(cin, cout):
        k = next(ks)
        s = 1.0 / math.sqrt(cin * 9)
        return {"w": jax.random.uniform(k, (cout, 3, 3, cin), dtype, -s, s),
                "b": jnp.zeros((cout,), dtype)}

    freq_after = (((cfg.num_mel_bins + 1) // 2 + 1) // 2 + 1) // 2
    layers = []
    for _ in range(cfg.encoder_layers):
        layers.append({
            "self_attn_layer_norm": {"w": jnp.ones((d,), dtype),
                                     "b": jnp.zeros((d,), dtype)},
            "q_proj": init_linear(next(ks), d, d, True, dtype),
            "k_proj": init_linear(next(ks), d, d, True, dtype),
            "v_proj": init_linear(next(ks), d, d, True, dtype),
            "out_proj": init_linear(next(ks), d, d, True, dtype),
            "final_layer_norm": {"w": jnp.ones((d,), dtype),
                                 "b": jnp.zeros((d,), dtype)},
            "fc1": init_linear(next(ks), d, cfg.encoder_ffn_dim, True, dtype),
            "fc2": init_linear(next(ks), cfg.encoder_ffn_dim, d, True, dtype),
        })
    return {
        "conv2d1": conv_p(1, ds),
        "conv2d2": conv_p(ds, ds),
        "conv2d3": conv_p(ds, ds),
        "conv_out": init_linear(next(ks), ds * freq_after, d, False, dtype),
        "layers": layers,
        "ln_post": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "proj1": init_linear(next(ks), d, d, True, dtype),
        "proj2": init_linear(next(ks), d, cfg.output_dim, True, dtype),
    }


def _encoder_layer(lp: dict, cfg: AudioEncoderConfig, x: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Pre-norm MHA + gelu MLP (reference: encoder.rs:212-229)."""
    B, T, D = x.shape
    H = cfg.encoder_attention_heads
    hd = D // H
    h = layer_norm(lp["self_attn_layer_norm"], x)
    q = linear(lp["q_proj"], h).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = linear(lp["k_proj"], h).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    v = linear(lp["v_proj"], h).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    o = sdpa(q, k, v, scale=hd ** -0.5, mask=mask)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    x = x + linear(lp["out_proj"], o)
    h = layer_norm(lp["final_layer_norm"], x)
    return x + linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], h)))


def encode(params: dict, cfg: AudioEncoderConfig, mel: jax.Array,
           n_frames: int) -> jax.Array:
    """mel: [n_mels, T_padded] (T_padded = chunks * 100 >= n_frames, static)
    -> audio features [valid_tokens, output_dim].

    Mirrors reference forward_encoder (encoder.rs:304-436) with all-equal
    chunks: pad -> conv stack per chunk -> +sinusoid -> drop invalid ->
    block-windowed attention -> ln_post -> proj1/gelu/proj2.
    """
    n_mels, Tp = mel.shape
    C = cfg.chunk_frames
    assert Tp % C == 0, (Tp, C)
    num_chunks = Tp // C
    # [chunks, n_mels, 100, 1] NHWC
    x = mel.reshape(n_mels, num_chunks, C).transpose(1, 0, 2)[..., None]
    x = jax.nn.gelu(conv2d(params["conv2d1"], x, stride=2, padding=1))
    x = jax.nn.gelu(conv2d(params["conv2d2"], x, stride=2, padding=1))
    x = jax.nn.gelu(conv2d(params["conv2d3"], x, stride=2, padding=1))
    # [chunks, freq, t, ch] -> [chunks, t, ch*freq]
    b, f, t, c = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(b, t, c * f)
    x = linear(params["conv_out"], x)                    # [chunks, 13, d]
    pos = jnp.asarray(sinusoid_positions(cfg.max_source_positions,
                                         cfg.d_model)[:t], x.dtype)
    x = x + pos[None]

    # gather valid tokens (static): full chunks contribute 13 each, the
    # final partial chunk contributes out_length(remainder)
    tpc = cfg.tokens_per_chunk
    total_valid = out_length(n_frames)
    flat = x.reshape(num_chunks * t, cfg.d_model)
    idx = []
    for ch in range(num_chunks):
        start_frame = ch * C
        n_valid = max(0, min(n_frames - start_frame, C))
        idx.extend(ch * t + j for j in range(out_length(n_valid) if n_valid else 0))
    assert len(idx) == total_valid, (len(idx), total_valid)
    h = flat[jnp.asarray(np.asarray(idx, np.int32))]     # [valid, d]

    # block-windowed attention mask (reference: encoder.rs:439-460)
    window = tpc * (cfg.n_window_infer // C)
    blocks = np.minimum(np.arange(total_valid) // window,
                        (total_valid - 1) // window)
    mask = np.where(blocks[:, None] == blocks[None, :], 0.0, NEG_INF)
    mask = jnp.asarray(mask, jnp.float32)

    h = h[None]
    for lp in params["layers"]:
        h = _encoder_layer(lp, cfg, h, mask)
    h = layer_norm(params["ln_post"], h[0])
    h = jax.nn.gelu(linear(params["proj1"], h))
    return linear(params["proj2"], h)                    # [valid, output_dim]


# --------------------------------------------------------------- pipeline ---

@dataclasses.dataclass
class Qwen3ASR:
    """transcribe() facade (reference: model.rs:576-673)."""

    enc_params: dict
    enc_cfg: AudioEncoderConfig
    lm_params: dict
    lm_cfg: base.TransformerConfig
    tokenizer: Optional[object] = None

    def encode_audio(self, samples: jax.Array) -> jax.Array:
        mel = log_mel_spectrogram(samples, 400, 160,
                                  self.enc_cfg.num_mel_bins, 16000)
        mel = mel.T.astype(jnp.float32)                  # [n_mels, frames]
        n = mel.shape[1]
        C = self.enc_cfg.chunk_frames
        pad = (-n) % C
        mel = jnp.pad(mel, ((0, 0), (0, pad)))
        return encode(self.enc_params, self.enc_cfg, mel, n)

    def transcribe_embeds(self, audio_feats: jax.Array,
                          prompt_prefix: jax.Array, prompt_suffix: jax.Array,
                          max_tokens: int = 128, stop_tokens=()):
        """Splice audio features between prompt segments, greedy-decode."""
        from ominix_mlx_tpu.core.generate import Engine
        from ominix_mlx_tpu.nn.layers import embedding

        emb_pre = embedding(self.lm_params["embed"], prompt_prefix[None])
        emb_suf = embedding(self.lm_params["embed"], prompt_suffix[None])
        feats = audio_feats[None].astype(emb_pre.dtype)
        embeds = jnp.concatenate([emb_pre, feats, emb_suf], axis=1)
        T = embeds.shape[1]
        cache = base.init_cache(self.lm_cfg, 1, T + max_tokens + 8,
                                emb_pre.dtype)
        logits, cache = jax.jit(base.forward_embeds, static_argnames=("cfg",))(
            self.lm_params, self.lm_cfg, embeds, cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        engine = Engine(lambda p, t, c: base.forward(p, self.lm_cfg, t, c),
                        self.lm_params)
        out = []
        for _ in range(max_tokens):
            t = int(tok[0])
            if t in stop_tokens:
                break
            out.append(t)
            tok, _, cache, _ = engine._decode_jit(
                self.lm_params, cache, tok, jax.random.PRNGKey(0),
                jnp.full((1, 64), -1, jnp.int32), sampler=engine.sampler)
        return out

    def transcribe(self, samples, rate: int = 16000, language=None,
                   max_tokens: int = 256) -> str:
        """Server-contract transcription (reference transcribe /
        transcribe_with_language, model.rs:576-608). With a tokenizer the
        prompt wraps the audio in the chat format and forces the language
        when given; without one, returns space-joined token ids."""
        import numpy as np

        samples = jnp.asarray(np.asarray(samples, np.float32))
        feats = self.encode_audio(samples)[:, :self.lm_cfg.hidden_size]
        if self.tokenizer is not None:
            pre = self.tokenizer.encode("<|im_start|>user\n")
            lang = f" {language}:" if language else ":"
            suf = self.tokenizer.encode(
                f"transcribe{lang}<|im_end|>\n<|im_start|>assistant\n")
            stops = {self.tokenizer.eos_token_id} - {None}
        else:
            pre, suf, stops = [1], [2], ()
        ids = self.transcribe_embeds(
            feats, jnp.asarray(pre, jnp.int32), jnp.asarray(suf, jnp.int32),
            max_tokens=max_tokens, stop_tokens=tuple(stops))
        if self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return " ".join(map(str, ids))


def load_model(model_dir: str) -> "Qwen3ASR":
    """Load from the canonical save format: config.json with
    audio_encoder_conf + text_config, tensors under encoder.* / llm.*."""
    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              unflatten_params)

    raw = load_config(model_dir)
    ecfg = AudioEncoderConfig(**{
        k: v for k, v in raw.get("audio_encoder_conf", {}).items()
        if k in AudioEncoderConfig.__dataclass_fields__})
    lcfg = base.TransformerConfig.from_hf(raw.get("text_config", raw))
    tree = unflatten_params(load_safetensors(model_dir))
    tok = None
    import os
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return Qwen3ASR(enc_params=tree["encoder"], enc_cfg=ecfg,
                    lm_params=tree["llm"], lm_cfg=lcfg, tokenizer=tok)
