"""GLM-4-MoE (GLM-4.5/4.6 family): sigmoid router + correction bias +
node-limited group top-k + shared experts, partial interleaved RoPE.

TPU-native counterpart of reference crate glm4-moe-mlx (model.rs):
``MoEGate`` sigmoid scores + e_score_correction_bias + top-k +
norm_topk_prob (:343-402), shared + routed experts (:574-583), SwitchGLU
stacked experts (:404-530). First ``first_k_dense_replace`` layers are
dense.
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
        num_experts=d.get("n_routed_experts", 128),
        top_k=d.get("num_experts_per_tok", 8),
        norm_topk_prob=d.get("norm_topk_prob", True),
        routing="sigmoid",
        routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
        n_shared_experts=d.get("n_shared_experts", 1),
        moe_intermediate_size=d.get("moe_intermediate_size", 1408),
        hidden_act=d.get("hidden_act", "silu"),
        n_group=d.get("n_group", 1),
        topk_group=d.get("topk_group", 1),
    )
    return dataclasses.replace(
        cfg, moe=moe,
        partial_rotary_factor=d.get("partial_rotary_factor", 0.5),
        rope_traditional=False,  # glm4_moe uses standard rotate-half (HF modeling)
        use_qk_norm=d.get("use_qk_norm", False),
        attention_bias=d.get("attention_bias", False),
    )


def params_from_flat(flat: dict, cfg: TransformerConfig, d: dict,
                     qcfg=None) -> dict:
    params = {
        "embed": base._maybe_quantized(flat, "model.embed_tokens", qcfg),
        "norm": flat["model.norm.weight"],
        "layers": [],
    }
    first_dense = d.get("first_k_dense_replace", 1)
    E = cfg.moe.num_experts
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
        if i < first_dense:
            for n in ("gate_proj", "up_proj", "down_proj"):
                lp[n] = base._linear_params(flat, f"{p}.mlp.{n}", qcfg)
        else:
            experts = {
                name: jnp.stack([flat[f"{p}.mlp.experts.{e}.{name}.weight"]
                                 for e in range(E)])
                for name in ("gate_proj", "up_proj", "down_proj")}
            lp["moe"] = {
                "gate": {"w": flat[f"{p}.mlp.gate.weight"]},
                "e_score_correction_bias":
                    flat[f"{p}.mlp.gate.e_score_correction_bias"],
                "experts": experts,
                "shared_expert": {
                    n: {"w": flat[f"{p}.mlp.shared_experts.{n}.weight"]}
                    for n in ("gate_proj", "up_proj", "down_proj")},
            }
        params["layers"].append(lp)
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", qcfg)
    return params


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return params_from_flat(flat, cfg, raw, raw.get("quantization")), cfg


forward = base.forward
init_cache = base.init_cache
