"""Fun-ASR-Nano / FunASR-Qwen4B: SenseVoice SAN-M encoder -> transformer
adaptor -> Qwen3 AR decoder.

TPU-native counterpart of reference crates funasr-nano-mlx (sensevoice
encoder 479 LoC + adaptor 274 + qwen 353; lib.rs:44 TaskPrompt) and
funasr-qwen4b-mlx (same shape with Qwen3-4B + chunked long-audio
transcribe, model.rs:388-459).

The SenseVoice encoder IS the Paraformer SAN-M encoder (shared weights
format); the adaptor is a small post-norm transformer that downsamples
and projects encoder frames into the LLM embedding space; decoding splices
audio embeddings into the chat prompt exactly like qwen3-asr.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.models import base, paraformer
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class AdaptorConfig:
    """2-layer transformer adaptor (funasr-nano-mlx/src/adaptor.rs)."""
    in_dim: int = 512
    hidden: int = 1024
    out_dim: int = 1024          # LLM hidden size
    layers: int = 2
    heads: int = 8
    downsample: int = 2          # frame-rate reduction by concat


def adaptor_forward(p: dict, acfg: AdaptorConfig, x: jax.Array) -> jax.Array:
    """x: [B, T, in_dim] encoder frames -> [B, T//ds, out_dim] LLM embeds."""
    B, T, D = x.shape
    ds = acfg.downsample
    T2 = T // ds
    x = x[:, :T2 * ds].reshape(B, T2, ds * D)
    x = linear(p["proj_in"], x)
    for lp in p["layers"]:
        h = layer_norm(lp["norm1"], x)
        h = paraformer.sanm_attention(lp["self_attn"], h, acfg.heads) \
            if "linear_q_k_v" in lp.get("self_attn", {}) else _mha(lp, h, acfg.heads)
        x = x + h
        h = layer_norm(lp["norm2"], x)
        x = x + linear(lp["fc2"], jax.nn.relu(linear(lp["fc1"], h)))
    return linear(p["proj_out"], x)


def _mha(lp, x, heads):
    import math
    B, T, D = x.shape
    hd = D // heads
    q = linear(lp["q"], x).reshape(B, T, heads, hd)
    k = linear(lp["k"], x).reshape(B, T, heads, hd)
    v = linear(lp["v"], x).reshape(B, T, heads, hd)
    a = jax.nn.softmax(jnp.einsum("bthd,bshd->bhts", q, k,
                                  preferred_element_type=jnp.float32)
                       / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", a.astype(v.dtype), v).reshape(B, T, D)
    return linear(lp["o"], o)


@dataclasses.dataclass
class FunASRNano:
    """transcribe facade (reference: funasr-nano lib.rs / model.rs)."""
    enc_params: dict
    enc_cfg: paraformer.ParaformerConfig
    adaptor_params: dict
    adaptor_cfg: AdaptorConfig
    lm_params: dict
    lm_cfg: TransformerConfig

    def encode(self, feats: jax.Array) -> jax.Array:
        """LFR features [B, T, mel*lfr] -> LLM embeds [B, T', D_lm]."""
        enc = paraformer.encode(self.enc_params, self.enc_cfg, feats)
        return adaptor_forward(self.adaptor_params, self.adaptor_cfg, enc)

    def transcribe_tokens(self, feats: jax.Array, prompt_prefix: List[int],
                          prompt_suffix: List[int], max_tokens: int = 128,
                          stop_tokens=()) -> List[int]:
        from ominix_mlx_tpu.core.generate import Engine
        from ominix_mlx_tpu.nn.layers import embedding

        audio = self.encode(feats)
        pre = embedding(self.lm_params["embed"],
                        jnp.asarray([prompt_prefix]))
        suf = embedding(self.lm_params["embed"],
                        jnp.asarray([prompt_suffix]))
        embeds = jnp.concatenate([pre, audio.astype(pre.dtype), suf], 1)
        T = embeds.shape[1]
        cache = base.init_cache(self.lm_cfg, 1, T + max_tokens + 8, pre.dtype)
        logits, cache = jax.jit(base.forward_embeds,
                                static_argnames=("cfg", "fresh_prefill"))(
            self.lm_params, self.lm_cfg, embeds, cache)
        engine = Engine(lambda p, t, c: base.forward(p, self.lm_cfg, t, c),
                        self.lm_params)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
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


def init_adaptor(acfg: AdaptorConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * acfg.layers + 4))
    h = acfg.hidden
    n = lambda d: {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
    return {
        "proj_in": init_linear(next(ks), acfg.in_dim * acfg.downsample, h,
                               True, dtype),
        "layers": [{
            "norm1": n(h), "norm2": n(h),
            "q": init_linear(next(ks), h, h, True, dtype),
            "k": init_linear(next(ks), h, h, True, dtype),
            "v": init_linear(next(ks), h, h, True, dtype),
            "o": init_linear(next(ks), h, h, True, dtype),
            "fc1": init_linear(next(ks), h, 2 * h, True, dtype),
            "fc2": init_linear(next(ks), 2 * h, h, True, dtype),
        } for _ in range(acfg.layers)],
        "proj_out": init_linear(next(ks), h, acfg.out_dim, True, dtype),
    }
