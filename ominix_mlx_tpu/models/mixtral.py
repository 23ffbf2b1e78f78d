"""Mixtral 8x7B/8x22B — classic top-2 softmax MoE.

TPU-native counterpart of reference crate mixtral-mlx (model.rs):
``MixtralSparseMoeBlock`` top-2 softmax routing renormalized over the
selected experts (model.rs:282-298), SwitchGLU experts (:233).
HF weight names use block_sparse_moe.experts.{e}.w1/w2/w3.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.models.moe import MoEConfig
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    cfg = TransformerConfig.from_hf(d)
    moe = MoEConfig(
        num_experts=d.get("num_local_experts", 8),
        top_k=d.get("num_experts_per_tok", 2),
        norm_topk_prob=True,        # HF divides by the top-k sum
        routing="softmax",
        moe_intermediate_size=d["intermediate_size"],
        hidden_act=d.get("hidden_act", "silu"),
    )
    return dataclasses.replace(cfg, moe=moe)


# HF name -> (our name) for expert sub-weights
_W = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}


def params_from_flat(flat: dict, cfg: TransformerConfig, qcfg=None) -> dict:
    params = {
        "embed": flat["model.embed_tokens.weight"],
        "norm": flat["model.norm.weight"],
        "layers": [],
    }
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
            "moe": {
                "gate": {"w": flat[f"{p}.block_sparse_moe.gate.weight"]},
                "experts": {
                    ours: jnp.stack([
                        flat[f"{p}.block_sparse_moe.experts.{e}.{hf}.weight"]
                        for e in range(cfg.moe.num_experts)])
                    for hf, ours in _W.items()},
            },
        }
        params["layers"].append(lp)
    if "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", qcfg)
    return params


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return params_from_flat(flat, cfg, raw.get("quantization")), cfg


forward = base.forward
init_cache = base.init_cache
