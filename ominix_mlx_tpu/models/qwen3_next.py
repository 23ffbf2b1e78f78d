"""Qwen3-Next / Qwen3.5 hybrid: GatedDeltaNet linear-attention layers
interleaved with gated full-attention layers, MoE MLP with shared expert.

TPU-native counterpart of reference crate qwen3.5-35B-mlx:
  - GatedAttention (output-gated GQA, attention.rs:24)
  - GatedDeltaNet linear attention (deltanet.rs:31-135) -> models/deltanet.py
  - hybrid RecurrentState/KV cache (cache.rs:9-36)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.cache import KVCache, ModelCache
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.models.deltanet import DeltaNetConfig, RecurrentCache
from ominix_mlx_tpu.models.moe import MoEConfig
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    cfg = TransformerConfig.from_hf(d)
    dn = DeltaNetConfig(
        num_v_heads=d["linear_num_value_heads"],
        num_k_heads=d["linear_num_key_heads"],
        head_k_dim=d["linear_key_head_dim"],
        head_v_dim=d["linear_value_head_dim"],
        conv_kernel=d.get("linear_conv_kernel_dim", 4),
        rms_norm_eps=d.get("rms_norm_eps", 1e-6))
    moe = MoEConfig(
        num_experts=d.get("num_experts", 512),
        top_k=d.get("num_experts_per_tok", 10),
        norm_topk_prob=d.get("norm_topk_prob", True),
        routing="softmax",
        moe_intermediate_size=d.get("moe_intermediate_size",
                                    d["intermediate_size"]),
        hidden_act=d.get("hidden_act", "silu"))
    layer_types = tuple(d.get("layer_types") or [
        "linear_attention" if (i + 1) % d.get("full_attention_interval", 4)
        else "full_attention" for i in range(cfg.num_layers)])
    return dataclasses.replace(
        cfg, deltanet=dn, moe=moe, use_qk_norm=True, layer_types=layer_types,
        partial_rotary_factor=d.get("partial_rotary_factor", 0.25))


def _split_fused_q(qw, num_heads: int, head_dim: int):
    """HF q_proj packs per-head [query(hd), gate(hd)]; split into two."""
    D = qw.shape[1]
    w = qw.reshape(num_heads, 2 * head_dim, D)
    return (w[:, :head_dim].reshape(-1, D),
            w[:, head_dim:].reshape(-1, D))


def params_from_flat(flat: dict, cfg: TransformerConfig, d: dict,
                     qcfg=None) -> dict:
    # Qwen3Next RMSNorms are zero-centered: out = norm(x) * (1 + w). Fold the
    # +1 into the stored weights at load (the gated deltanet norm is NOT
    # zero-centered and is read directly).
    def n1(name):
        return flat[name] + 1.0

    params = {
        "embed": base._maybe_quantized(flat, "model.embed_tokens", qcfg),
        "norm": n1("model.norm.weight"),
        "layers": [],
    }
    layer_types = cfg.layer_types
    E = cfg.moe.num_experts
    mlp_only = set(d.get("mlp_only_layers", []))
    step = d.get("decoder_sparse_step", 1)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": n1(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm":
                n1(f"{p}.post_attention_layernorm.weight"),
        }
        if layer_types[i] == "linear_attention":
            la = {
                "in_proj_qkvz": base._linear_params(
                    flat, f"{p}.linear_attn.in_proj_qkvz", qcfg),
                "in_proj_ba": base._linear_params(
                    flat, f"{p}.linear_attn.in_proj_ba", qcfg),
                "conv1d": {"w": flat[f"{p}.linear_attn.conv1d.weight"]},
                "dt_bias": flat[f"{p}.linear_attn.dt_bias"],
                "A_log": flat[f"{p}.linear_attn.A_log"],
                "norm": flat[f"{p}.linear_attn.norm.weight"],
                "out_proj": base._linear_params(
                    flat, f"{p}.linear_attn.out_proj", qcfg),
            }
            lp["linear_attn"] = la
        else:
            qw, gw = _split_fused_q(flat[f"{p}.self_attn.q_proj.weight"],
                                    cfg.num_heads, cfg.hd)
            lp["q_proj"] = {"w": qw}
            lp["g_proj"] = {"w": gw}
            lp["k_proj"] = base._linear_params(flat, f"{p}.self_attn.k_proj", qcfg)
            lp["v_proj"] = base._linear_params(flat, f"{p}.self_attn.v_proj", qcfg)
            lp["o_proj"] = base._linear_params(flat, f"{p}.self_attn.o_proj", qcfg)
            lp["q_norm"] = n1(f"{p}.self_attn.q_norm.weight")
            lp["k_norm"] = n1(f"{p}.self_attn.k_norm.weight")
        if f"{p}.mlp.gate.weight" in flat and not (
                i in mlp_only or (step > 0 and (i + 1) % step)):
            experts = {
                name: jnp.stack([flat[f"{p}.mlp.experts.{e}.{name}.weight"]
                                 for e in range(E)])
                for name in ("gate_proj", "up_proj", "down_proj")}
            lp["moe"] = {
                "gate": {"w": flat[f"{p}.mlp.gate.weight"]},
                "experts": experts,
                "shared_expert": {
                    n: {"w": flat[f"{p}.mlp.shared_expert.{n}.weight"]}
                    for n in ("gate_proj", "up_proj", "down_proj")},
                "shared_expert_gate": {
                    "w": flat[f"{p}.mlp.shared_expert_gate.weight"]},
            }
        else:
            for n in ("gate_proj", "up_proj", "down_proj"):
                lp[n] = base._linear_params(flat, f"{p}.mlp.{n}", qcfg)
        params["layers"].append(lp)
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", qcfg)
    return params


def init_cache(cfg: TransformerConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> ModelCache:
    """Hybrid cache: RecurrentCache for linear layers, KVCache for full
    (reference: qwen3.5-35B cache.rs:9-36). Standard (cfg, batch, max_len,
    dtype) signature — the server/engine contract; the layer plan rides
    cfg.layer_types."""
    layers = []
    for lt in cfg.layer_types:
        if lt == "linear_attention":
            layers.append(RecurrentCache.init(batch, cfg.deltanet, dtype))
        else:
            layers.append(KVCache.init(batch, cfg.num_kv_heads, max_len,
                                       cfg.hd, dtype))
    return ModelCache(layers=layers, offset=jnp.zeros((), jnp.int32))


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return params_from_flat(flat, cfg, raw, raw.get("quantization")), cfg


forward = base.forward
