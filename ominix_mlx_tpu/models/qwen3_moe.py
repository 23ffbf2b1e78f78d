"""Qwen3-MoE (and Qwen2-MoE-style shared-expert variants).

TPU-native counterpart of reference crate qwen3-mlx's qwen3_moe module
(qwen3-mlx/src/qwen3_moe.rs): QK-norm GQA attention + SwitchGLU MoE with
top-k softmax routing and norm_topk_prob (:460), stacked expert weights
(:304), optional dense layers (mlp_only_layers / decoder_sparse_step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.models.moe import MoEConfig, init_moe_params
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    cfg = TransformerConfig.from_hf(d)
    moe = MoEConfig(
        num_experts=d.get("num_experts", d.get("num_local_experts", 8)),
        top_k=d.get("num_experts_per_tok", 2),
        norm_topk_prob=d.get("norm_topk_prob", False),
        routing="softmax",
        moe_intermediate_size=d.get("moe_intermediate_size",
                                    d["intermediate_size"]),
        hidden_act=d.get("hidden_act", "silu"),
    )
    return base.dataclasses.replace(cfg, moe=moe)


def moe_layer_indices(d: dict) -> list:
    """Which layers are sparse (qwen3_moe.rs config semantics)."""
    n = d["num_hidden_layers"]
    step = d.get("decoder_sparse_step", 1)
    mlp_only = set(d.get("mlp_only_layers", []))
    return [i for i in range(n)
            if step > 0 and (i + 1) % step == 0 and i not in mlp_only]


def params_from_flat(flat: dict, cfg: TransformerConfig, d: dict,
                     qcfg=None) -> dict:
    params = {
        "embed": base._maybe_quantized(flat, "model.embed_tokens", qcfg),
        "norm": flat["model.norm.weight"],
        "layers": [],
    }
    moe_layers = set(moe_layer_indices(d))
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
            "q_proj": base._linear_params(flat, f"{p}.self_attn.q_proj", qcfg),
            "k_proj": base._linear_params(flat, f"{p}.self_attn.k_proj", qcfg),
            "v_proj": base._linear_params(flat, f"{p}.self_attn.v_proj", qcfg),
            "o_proj": base._linear_params(flat, f"{p}.self_attn.o_proj", qcfg),
        }
        if cfg.use_qk_norm:
            lp["q_norm"] = flat[f"{p}.self_attn.q_norm.weight"]
            lp["k_norm"] = flat[f"{p}.self_attn.k_norm.weight"]
        if i in moe_layers:
            E = cfg.moe.num_experts
            experts = {}
            for name in ("gate_proj", "up_proj", "down_proj"):
                experts[name] = jnp.stack([
                    flat[f"{p}.mlp.experts.{e}.{name}.weight"]
                    for e in range(E)])
            lp["moe"] = {
                "gate": {"w": flat[f"{p}.mlp.gate.weight"]},
                "experts": experts,
            }
            if f"{p}.mlp.shared_expert.gate_proj.weight" in flat:
                lp["moe"]["shared_expert"] = {
                    n: {"w": flat[f"{p}.mlp.shared_expert.{n}.weight"]}
                    for n in ("gate_proj", "up_proj", "down_proj")}
                lp["moe"]["shared_expert_gate"] = {
                    "w": flat[f"{p}.mlp.shared_expert_gate.weight"]}
        else:
            for n in ("gate_proj", "up_proj", "down_proj"):
                lp[n] = base._linear_params(flat, f"{p}.mlp.{n}", qcfg)
        params["layers"].append(lp)
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", qcfg)
    return params


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return params_from_flat(flat, cfg, raw, raw.get("quantization")), cfg


def init_params(cfg: TransformerConfig, key, dtype=jnp.bfloat16) -> dict:
    params = base.init_params(cfg, key, dtype)
    for lp in params["layers"]:
        for n in ("gate_proj", "up_proj", "down_proj"):
            lp.pop(n)
        lp["moe"] = init_moe_params(key, cfg.hidden_size, cfg.moe, dtype)
    return params


forward = base.forward
init_cache = base.init_cache
