"""Paraformer-large: non-autoregressive ASR (SAN-M encoder + CIF +
bidirectional decoder).

TPU-native counterpart of reference crate funasr-mlx (paraformer.rs):
  - frontend: 80-mel + LFR(7,6) + CMVN (audio/dsp.py)
  - SAN-M encoder: self-attention + FSMN depthwise-conv memory on the value
    path (paraformer.rs:442-540), 1 input-dim first layer + 49 regular
  - CIF predictor (continuous integrate-and-fire, threshold 1.0,
    paraformer.rs:778-880) — the reference fires on the HOST with Python-
    style loops; here it is ONE lax.scan with a scatter into a static
    [max_tokens] buffer, fully on-device
  - bidirectional decoder: FSMN "self-attention" + cross-attention to the
    encoder + FFN (paraformer.rs:902-1100), all tokens in one pass
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.nn.layers import conv1d, init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ParaformerConfig:
    """Defaults: Paraformer-large (reference paraformer.rs:120-160)."""
    n_mels: int = 80
    lfr_m: int = 7
    lfr_n: int = 6
    encoder_dim: int = 512
    encoder_layers: int = 50
    encoder_heads: int = 4
    encoder_ffn_dim: int = 2048
    sanm_kernel_size: int = 11
    cif_threshold: float = 1.0
    cif_tail_threshold: float = 0.45
    decoder_dim: int = 512
    decoder_layers: int = 16
    decoder_heads: int = 4
    decoder_ffn_dim: int = 2048
    vocab_size: int = 8404

    @property
    def input_dim(self):
        return self.n_mels * self.lfr_m


def sinusoid_pe(T: int, dim: int) -> np.ndarray:
    pos = np.arange(1, T + 1)[:, None]
    div = np.exp(-np.arange(0, dim, 2) * (math.log(10000.0) / dim))
    pe = np.zeros((T, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


# ------------------------------------------------------------- SAN-M --------

def sanm_attention(p: dict, x: jax.Array, heads: int) -> jax.Array:
    """Self-attention + FSMN memory on the value path
    (reference: paraformer.rs:496-540)."""
    B, T, _ = x.shape
    qkv = linear(p["linear_q_k_v"], x)
    dim = qkv.shape[-1] // 3
    hd = dim // heads
    q, k, v = jnp.split(qkv, 3, -1)
    qh = q.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(
        jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(vh.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, dim)
    K = p["fsmn_block"]["w"].shape[1]
    fsmn = conv1d(p["fsmn_block"], v, padding=K // 2, groups=dim) + v
    return linear(p["out_proj"], out) + fsmn


def encoder_layer(p: dict, x: jax.Array, heads: int,
                  residual_attn: bool) -> jax.Array:
    h = sanm_attention(p["self_attn"], layer_norm(p["norm1"], x), heads)
    x = x + h if residual_attn else h
    h = layer_norm(p["norm2"], x)
    h = linear(p["ffn_down"], jax.nn.relu(linear(p["ffn_up"], h)))
    return x + h


def encode(params: dict, cfg: ParaformerConfig, feats: jax.Array) -> jax.Array:
    """feats: [B, T, n_mels*lfr_m] (LFR+CMVN output) -> [B, T, D]."""
    T = feats.shape[1]
    x = feats * math.sqrt(512.0)
    # keep the model dtype: a float32 PE would promote the whole stack
    x = x + jnp.asarray(sinusoid_pe(T, feats.shape[-1]),
                        dtype=feats.dtype)[None]
    x = encoder_layer(params["first_layer"], x, cfg.encoder_heads,
                      residual_attn=False)
    for lp in params["layers"]:
        x = encoder_layer(lp, x, cfg.encoder_heads, residual_attn=True)
    return layer_norm(params["after_norm"], x)


# --------------------------------------------------------------- CIF --------

def cif(hidden: jax.Array, alphas: jax.Array, threshold: float = 1.0,
        tail_threshold: float = 0.45, max_tokens: int | None = None):
    """Continuous integrate-and-fire as one on-device scan.

    hidden: [B, T, D]; alphas: [B, T] -> (frames [B, max_tokens, D],
    token_counts [B]). Reference semantics: paraformer.rs:778-880.
    """
    B, T, D = hidden.shape
    if max_tokens is None:
        max_tokens = T

    def per_batch(h, a):
        def step(carry, inp):
            integrate, frame, idx, buf = carry
            h_t, a_t = inp
            completion = 1.0 - integrate
            integrate = integrate + a_t
            fire = integrate >= threshold
            integrate = jnp.where(fire, integrate - 1.0, integrate)
            cur = jnp.where(fire, completion, a_t)
            remainds = a_t - cur
            frame = frame + cur * h_t
            buf = jax.lax.cond(
                fire,
                lambda b: jax.lax.dynamic_update_slice(
                    b, frame[None], (idx, jnp.int32(0))),
                lambda b: b, buf)
            frame = jnp.where(fire, remainds * h_t, frame)
            idx = idx + fire.astype(jnp.int32)
            return (integrate, frame, idx, buf), None

        init = (jnp.float32(0.0), jnp.zeros((D,), jnp.float32),
                jnp.int32(0), jnp.zeros((max_tokens, D), jnp.float32))
        (integrate, frame, idx, buf), _ = jax.lax.scan(
            step, init, (h.astype(jnp.float32), a.astype(jnp.float32)))
        # tail
        buf = jax.lax.cond(
            integrate > tail_threshold,
            lambda b: jax.lax.dynamic_update_slice(b, frame[None],
                                                   (idx, jnp.int32(0))),
            lambda b: b, buf)
        idx = idx + (integrate > tail_threshold).astype(jnp.int32)
        return buf, idx

    frames, counts = jax.vmap(per_batch)(hidden, alphas)
    return frames, counts


def predict_alphas(p: dict, x: jax.Array) -> jax.Array:
    """conv -> relu -> linear -> sigmoid (paraformer.rs compute_alphas)."""
    K = p["conv"]["w"].shape[1]
    h = jax.nn.relu(conv1d(p["conv"], x, padding=K // 2))
    return jax.nn.sigmoid(linear(p["output_proj"], h))[..., 0]


# ----------------------------------------------------------- decoder --------

def decoder_layer(p: dict, x: jax.Array, enc: jax.Array,
                  heads: int) -> jax.Array:
    B, T, D = x.shape
    hd = D // heads
    # FSMN "self-attention" (non-causal depthwise conv memory)
    h = layer_norm(p["norm1"], x)
    K = p["self_attn_fsmn"]["w"].shape[1]
    x = x + conv1d(p["self_attn_fsmn"], h, padding=K // 2, groups=D)
    # cross attention to encoder output
    h = layer_norm(p["norm2"], x)
    q = linear(p["src_attn_q"], h).reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    kv = linear(p["src_attn_kv"], enc)
    k, v = jnp.split(kv, 2, -1)
    S = enc.shape[1]
    k = k.reshape(B, S, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, heads, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(
        jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)
    x = x + linear(p["src_attn_out"], o.transpose(0, 2, 1, 3).reshape(B, T, D))
    # FFN with inner norm (funasr decoder style)
    h = layer_norm(p["norm3"], x)
    h = jax.nn.relu(linear(p["ffn_up"], h))
    h = layer_norm(p["ffn_norm"], h)
    return x + linear(p["ffn_down"], h)


def decode(params: dict, cfg: ParaformerConfig, frames: jax.Array,
           enc: jax.Array) -> jax.Array:
    """frames: [B, N, D] CIF embeddings -> logits [B, N, vocab]."""
    x = frames
    for lp in params["dec_layers"]:
        x = decoder_layer(lp, x, enc, cfg.decoder_heads)
    x = layer_norm(params["dec_after_norm"], x)
    return linear(params["output_layer"], x)


def transcribe_logits(params: dict, cfg: ParaformerConfig,
                      feats: jax.Array):
    """LFR features -> (logits [B, N, V], token_counts [B]). One pass,
    non-autoregressive (reference: transcribe, paraformer.rs:1215)."""
    enc = encode(params, cfg, feats)
    alphas = predict_alphas(params["predictor"], enc)
    frames, counts = cif(enc, alphas, cfg.cif_threshold,
                         cfg.cif_tail_threshold)
    return decode(params, cfg, frames.astype(enc.dtype), enc), counts


# ---------------------------------------------------------------- init ------

def init_params(cfg: ParaformerConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 12 * (cfg.encoder_layers
                                          + cfg.decoder_layers) + 12))

    def norm_p(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def enc_layer(in_dim):
        d = cfg.encoder_dim
        return {
            "norm1": norm_p(in_dim), "norm2": norm_p(d),
            "self_attn": {
                "linear_q_k_v": init_linear(next(ks), in_dim, 3 * d, True, dtype),
                "out_proj": init_linear(next(ks), d, d, True, dtype),
                "fsmn_block": {"w": jax.random.normal(
                    next(ks), (d, cfg.sanm_kernel_size, 1), dtype) * 0.05},
            },
            "ffn_up": init_linear(next(ks), d, cfg.encoder_ffn_dim, True, dtype),
            "ffn_down": init_linear(next(ks), cfg.encoder_ffn_dim, d, True, dtype),
        }

    d = cfg.decoder_dim
    params = {
        "first_layer": enc_layer(cfg.input_dim),
        "layers": [enc_layer(cfg.encoder_dim)
                   for _ in range(cfg.encoder_layers - 1)],
        "after_norm": norm_p(cfg.encoder_dim),
        "predictor": {
            "conv": {"w": jax.random.normal(
                next(ks), (cfg.encoder_dim, 3, cfg.encoder_dim), dtype) * 0.05,
                "b": jnp.zeros((cfg.encoder_dim,), dtype)},
            "output_proj": init_linear(next(ks), cfg.encoder_dim, 1, True, dtype),
        },
        "dec_layers": [{
            "norm1": norm_p(d), "norm2": norm_p(d), "norm3": norm_p(d),
            "ffn_norm": norm_p(cfg.decoder_ffn_dim),
            "self_attn_fsmn": {"w": jax.random.normal(
                next(ks), (d, cfg.sanm_kernel_size, 1), dtype) * 0.05},
            "src_attn_q": init_linear(next(ks), d, d, True, dtype),
            "src_attn_kv": init_linear(next(ks), cfg.encoder_dim, 2 * d, True, dtype),
            "src_attn_out": init_linear(next(ks), d, d, True, dtype),
            "ffn_up": init_linear(next(ks), d, cfg.decoder_ffn_dim, True, dtype),
            "ffn_down": init_linear(next(ks), cfg.decoder_ffn_dim, d, True, dtype),
        } for _ in range(cfg.decoder_layers)],
        "dec_after_norm": norm_p(d),
        "output_layer": init_linear(next(ks), d, cfg.vocab_size, True, dtype),
    }
    return params


# ------------------------------------------------------ facade + loading ----

@dataclasses.dataclass
class Transcriber:
    """transcribe(samples, rate) facade (reference: paraformer.rs:1215)."""
    params: dict
    cfg: ParaformerConfig
    cmvn_means: Optional[jax.Array] = None
    cmvn_vars: Optional[jax.Array] = None
    tokens: Optional[list] = None          # id -> string table
    # optional CT-Transformer punctuation restoration (models/punctuation.py;
    # reference feature-gate: funasr-mlx/src/punctuation.rs)
    punc: object = None

    def features(self, samples: jax.Array, rate: int = 16000) -> jax.Array:
        from ominix_mlx_tpu.audio.dsp import (apply_cmvn, apply_lfr,
                                              log_mel_spectrogram)
        mel = log_mel_spectrogram(samples, 400, 160, self.cfg.n_mels, rate)
        feats = apply_lfr(mel, self.cfg.lfr_m, self.cfg.lfr_n)
        if self.cmvn_means is not None:
            feats = apply_cmvn(feats, self.cmvn_means, self.cmvn_vars)
        return feats[None]

    def transcribe_ids(self, samples: jax.Array, rate: int = 16000):
        import numpy as np
        logits, counts = jax.jit(
            transcribe_logits, static_argnames=("cfg",))(
            self.params, self.cfg, self.features(samples, rate))
        n = int(counts[0])
        ids = np.asarray(jnp.argmax(logits[0], -1))[:n]
        return [int(i) for i in ids]

    def transcribe(self, samples, rate: int = 16000) -> str:
        ids = self.transcribe_ids(jnp.asarray(samples), rate)
        if self.tokens is None:
            return " ".join(str(i) for i in ids)
        text = "".join(self.tokens[i] if i < len(self.tokens) else ""
                       for i in ids).replace("@@", "")
        if self.punc is not None:
            text = self.punc.punctuate(text)
        return text


def load_model(model_dir: str) -> Transcriber:
    """Load from the canonical save format (utils.loading.save_model) or a
    converted FunASR checkpoint (utils.convert.paraformer_rename names)."""
    import os

    from ominix_mlx_tpu.utils.convert import paraformer_rename
    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              unflatten_params)

    raw = load_config(model_dir)
    cfg = ParaformerConfig(**{k: v for k, v in raw.items()
                              if k in ParaformerConfig.__dataclass_fields__})
    flat = {paraformer_rename(k): v
            for k, v in load_safetensors(model_dir).items()}
    params = unflatten_params(flat)
    tokens = None
    tok_path = os.path.join(model_dir, "tokens.txt")
    if os.path.exists(tok_path):
        with open(tok_path, encoding="utf-8") as f:
            tokens = [ln.rstrip("\n") for ln in f]
    cm = params.pop("cmvn", {}) if isinstance(params, dict) else {}
    return Transcriber(params=params, cfg=cfg, tokens=tokens,
                       cmvn_means=cm.get("means"), cmvn_vars=cm.get("vars"))
