"""MiniCPM-SALA: 1M-context hybrid of InfLLMv2 sparse attention and
lightning (GLA) linear attention, with muP scaling and self-speculative
early-exit drafting.

TPU-native counterpart of reference crate minicpm-sala-mlx:
  - per-layer mixer_types "minicpm4" (sparse) / "lightning-attn" (GLA)
    (config.rs:21-26)
  - InfLLMv2 sparse decode -> models/sparse_attention.py
  - lightning GLA -> models/lightning.py
  - muP: embed * scale_emb, residual * scale_depth/sqrt(L), logits /
    logits_scale (config.rs:29-34,138-141; model.rs:184-300)
  - self-speculative decoding via first-N-layers draft (speculative.rs:1-40)
    -> draft_forward + core.speculative.SpeculativeEngine
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.attention import causal_mask, sdpa
from ominix_mlx_tpu.core.cache import KVCache, ModelCache
from ominix_mlx_tpu.core.rope import apply_rope, make_rope
from ominix_mlx_tpu.models import lightning as gla
from ominix_mlx_tpu.models.sparse_attention import (SparseConfig,
                                                    SparseKVCache,
                                                    sparse_decode_attention)
from ominix_mlx_tpu.nn.layers import (embedding, embedding_as_linear,
                                      init_linear, linear, rms_norm)
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


@dataclasses.dataclass(frozen=True)
class MiniCPMConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    mixer_types: tuple
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    scale_emb: float = 12.0
    scale_depth: float = 1.4
    dim_model_base: int = 256
    attn_use_rope: bool = False
    lightning_use_rope: bool = True
    qk_norm: bool = False
    use_output_gate: bool = True
    use_output_norm: bool = True
    lightning_nh: Optional[int] = None
    lightning_head_dim: Optional[int] = None
    sparse: SparseConfig = SparseConfig()
    hidden_act: str = "silu"

    @property
    def res_scale(self) -> float:
        """scale_depth / sqrt(num_layers) (reference: config.rs:138-141)."""
        return self.scale_depth / self.num_layers ** 0.5

    @property
    def logits_scale(self) -> float:
        return self.hidden_size / self.dim_model_base

    @property
    def gla_heads(self) -> int:
        return self.lightning_nh or self.num_heads

    @property
    def gla_head_dim(self) -> int:
        return self.lightning_head_dim or self.head_dim

    @staticmethod
    def from_hf(d: dict) -> "MiniCPMConfig":
        sp = d.get("sparse_config") or {}
        return MiniCPMConfig(
            vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            num_kv_heads=d["num_key_value_heads"],
            head_dim=d.get("head_dim",
                           d["hidden_size"] // d["num_attention_heads"]),
            intermediate_size=d["intermediate_size"],
            mixer_types=tuple(d["mixer_types"]),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10000.0),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            scale_emb=d.get("scale_emb", 12.0),
            scale_depth=d.get("scale_depth", 1.4),
            dim_model_base=d.get("dim_model_base", 256),
            attn_use_rope=d.get("attn_use_rope", False),
            lightning_use_rope=d.get("lightning_use_rope", True),
            qk_norm=d.get("qk_norm", False),
            use_output_gate=d.get("use_output_gate", True),
            use_output_norm=d.get("use_output_norm", True),
            lightning_nh=d.get("lightning_nh"),
            lightning_head_dim=d.get("lightning_head_dim"),
            sparse=SparseConfig(**{k: v for k, v in sp.items()
                                   if k in SparseConfig.__dataclass_fields__}),
        )


def init_cache(cfg: MiniCPMConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> ModelCache:
    layers = []
    for mt in cfg.mixer_types:
        if mt == "lightning-attn":
            layers.append(gla.GLACache.init(batch, cfg.gla_heads,
                                            cfg.gla_head_dim))
        else:
            layers.append(SparseKVCache.init(
                batch, cfg.num_kv_heads, max_len, cfg.head_dim, dtype,
                kernel_size=cfg.sparse.kernel_size))
    return ModelCache(layers=layers, offset=jnp.zeros((), jnp.int32))


def _sparse_attn(lp, cfg: MiniCPMConfig, x, cache: KVCache, offset,
                 kv_limit=None):
    B, T, _ = x.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = linear(lp["q_proj"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = linear(lp["k_proj"], x).reshape(B, T, Hkv, hd).transpose(0, 2, 1, 3)
    v = linear(lp["v_proj"], x).reshape(B, T, Hkv, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm and "q_norm" in lp:
        q = rms_norm(lp["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(lp["k_norm"], k, cfg.rms_norm_eps)
    if cfg.attn_use_rope:
        rope = make_rope(hd, cfg.rope_theta)
        pos = (offset[:, None] if getattr(offset, "ndim", 0) == 1
               else offset) + jnp.arange(T, dtype=jnp.int32)
        q = apply_rope(q, pos, rope)
        k = apply_rope(k, pos, rope)
    cache = cache.update(k, v, offset)
    if kv_limit is not None:
        # continuation chunk of a long prefill: attend only the STATIC
        # written prefix — O(kv_limit) per chunk, not O(capacity). Exact
        # dense even for a T==1 tail chunk (the InfLLMv2 approximation is
        # a DECODE policy; prefill must match the whole-prompt result)
        mask = causal_mask(T, kv_limit, offset)
        out = sdpa(q, cache.k[:, :, :kv_limit], cache.v[:, :, :kv_limit],
                   hd ** -0.5, mask)
    elif T == 1:
        out = sparse_decode_attention(q, cache, offset, cfg.sparse,
                                      hd ** -0.5)
    else:
        mask = causal_mask(T, cache.max_len, offset)
        out = sdpa(q, cache.k, cache.v, hd ** -0.5, mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * hd)
    return linear(lp["o_proj"], out), cache


def _lightning_attn(lp, cfg: MiniCPMConfig, x, cache: gla.GLACache, offset):
    B, T, _ = x.shape
    H, hd = cfg.gla_heads, cfg.gla_head_dim
    q = linear(lp["q_proj"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = linear(lp["k_proj"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    v = linear(lp["v_proj"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm and "q_norm" in lp:
        q = rms_norm(lp["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(lp["k_norm"], k, cfg.rms_norm_eps)
    if cfg.lightning_use_rope:
        rope = make_rope(hd, cfg.rope_theta)
        pos = (offset[:, None] if getattr(offset, "ndim", 0) == 1
               else offset) + jnp.arange(T, dtype=jnp.int32)
        q = apply_rope(q, pos, rope)
        k = apply_rope(k, pos, rope)
    q = q * hd ** -0.5
    slopes = gla.alibi_slopes(H)
    if T == 1:
        out, cache = gla.gla_decode_step(q, k, v, jnp.asarray(slopes), cache)
    else:
        out, cache = gla.gla_chunked(q, k, v, slopes, cache)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * hd).astype(x.dtype)
    if cfg.use_output_norm and "o_norm" in lp:
        out = rms_norm(lp["o_norm"], out, cfg.rms_norm_eps)
    if cfg.use_output_gate and "z_proj" in lp:
        out = out * jax.nn.sigmoid(linear(lp["z_proj"], x))
    return linear(lp["o_proj"], out), cache


def forward(params: dict, cfg: MiniCPMConfig, tokens: jax.Array,
            cache: ModelCache, num_layers: Optional[int] = None,
            fresh_prefill: bool = False, kv_limit: Optional[int] = None,
            skip_logits: bool = False):
    """num_layers: run only the first N layers (self-speculative draft,
    reference: speculative.rs:1-40). fresh_prefill is accepted for engine
    interface parity (sparse/GLA mixers manage their own prefill paths).
    kv_limit (static): continuation chunks of a long prefill attend only
    the first kv_limit cache slots (GLA layers chunk naturally).
    skip_logits (static): non-final chunks skip the lm_head."""
    x = embedding(params["embed"], tokens) * cfg.scale_emb
    T = tokens.shape[1]
    rs = cfg.res_scale
    n = num_layers if num_layers is not None else cfg.num_layers
    new_layers = []
    for i in range(n):
        lp = params["layers"][i]
        lc = cache.layers[i]
        h = rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        if cfg.mixer_types[i] == "lightning-attn":
            h, lc = _lightning_attn(lp, cfg, h, lc, cache.offset)
        else:
            h, lc = _sparse_attn(lp, cfg, h, lc, cache.offset,
                                 kv_limit=kv_limit)
        x = x + h * rs
        h = rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        h = linear(lp["down_proj"],
                   jax.nn.silu(linear(lp["gate_proj"], h))
                   * linear(lp["up_proj"], h))
        x = x + h * rs
        new_layers.append(lc)
    new_layers.extend(cache.layers[n:])
    x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    x = x / cfg.logits_scale
    if skip_logits:
        return x, ModelCache(layers=new_layers,
                             offset=cache.offset).advance(T)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = embedding_as_linear(params["embed"], x)
    else:
        logits = linear(params["lm_head"], x)
    return logits, ModelCache(layers=new_layers,
                              offset=cache.offset).advance(T)


def init_params(cfg: MiniCPMConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 10 * cfg.num_layers + 4))
    D = cfg.hidden_size
    layers = []
    for mt in cfg.mixer_types:
        if mt == "lightning-attn":
            H, hd = cfg.gla_heads, cfg.gla_head_dim
            lp = {
                "q_proj": init_linear(next(ks), D, H * hd, False, dtype),
                "k_proj": init_linear(next(ks), D, H * hd, False, dtype),
                "v_proj": init_linear(next(ks), D, H * hd, False, dtype),
                "o_proj": init_linear(next(ks), H * hd, D, False, dtype),
                "o_norm": jnp.ones((H * hd,), dtype),
                "z_proj": init_linear(next(ks), D, H * hd, False, dtype),
            }
        else:
            lp = {
                "q_proj": init_linear(next(ks), D, cfg.num_heads * cfg.head_dim,
                                      False, dtype),
                "k_proj": init_linear(next(ks), D,
                                      cfg.num_kv_heads * cfg.head_dim, False, dtype),
                "v_proj": init_linear(next(ks), D,
                                      cfg.num_kv_heads * cfg.head_dim, False, dtype),
                "o_proj": init_linear(next(ks), cfg.num_heads * cfg.head_dim,
                                      D, False, dtype),
            }
        lp["input_layernorm"] = jnp.ones((D,), dtype)
        lp["post_attention_layernorm"] = jnp.ones((D,), dtype)
        lp["gate_proj"] = init_linear(next(ks), D, cfg.intermediate_size,
                                      False, dtype)
        lp["up_proj"] = init_linear(next(ks), D, cfg.intermediate_size,
                                    False, dtype)
        lp["down_proj"] = init_linear(next(ks), cfg.intermediate_size, D,
                                      False, dtype)
        layers.append(lp)
    return {
        "embed": jax.random.normal(next(ks), (cfg.vocab_size, D), dtype) * 0.02,
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
    }


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = MiniCPMConfig.from_hf(raw)
    flat = load_safetensors(model_dir)
    qcfg = raw.get("quantization")
    from ominix_mlx_tpu.models import base

    layers = []
    for i, mt in enumerate(cfg.mixer_types):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
        }
        pref = f"{p}.self_attn"
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            lp[n] = base._linear_params(flat, f"{pref}.{n}", qcfg)
        for opt in ("q_norm", "k_norm"):
            if f"{pref}.{opt}.weight" in flat:
                lp[opt] = flat[f"{pref}.{opt}.weight"]
        if mt == "lightning-attn":
            if f"{pref}.o_norm.weight" in flat:
                lp["o_norm"] = flat[f"{pref}.o_norm.weight"]
            if f"{pref}.z_proj.weight" in flat:
                lp["z_proj"] = base._linear_params(flat, f"{pref}.z_proj", qcfg)
        for n in ("gate_proj", "up_proj", "down_proj"):
            lp[n] = base._linear_params(flat, f"{p}.mlp.{n}", qcfg)
        layers.append(lp)
    params = {
        "embed": base._maybe_quantized(flat, "model.embed_tokens", qcfg),
        "layers": layers,
        "norm": flat["model.norm.weight"],
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", qcfg)
    return params, cfg
