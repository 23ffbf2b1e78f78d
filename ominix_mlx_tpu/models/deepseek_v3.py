"""DeepSeek-V3-style MLA + MoE decoder — the architecture family behind the
reference's glm-4.7-flash crate (glm-4.7-flash-mlx: MLA absorbed form +
sigmoid-routed MoE with shared experts, model.rs:120-262) and DeepSeek V2/V3.

Covers: optional q LoRA, first_k_dense_replace dense layers, node-limited
group routing, sigmoid+bias router (same MoE machinery as glm4_moe).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ominix_mlx_tpu.core.cache import ModelCache
from ominix_mlx_tpu.models import base, mla
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.models.mla import MLAConfig, absorb_kv_b
from ominix_mlx_tpu.models.moe import MoEConfig
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    cfg = TransformerConfig.from_hf(d)
    mcfg = MLAConfig(
        num_heads=d["num_attention_heads"],
        q_lora_rank=d.get("q_lora_rank"),
        kv_lora_rank=d.get("kv_lora_rank", 512),
        qk_nope_head_dim=d.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=d.get("qk_rope_head_dim", 64),
        v_head_dim=d.get("v_head_dim", 128),
        rope_theta=d.get("rope_theta", 10000.0),
        rope_interleave=d.get("rope_interleave", True),
        rope_scaling=d.get("rope_scaling"),
        rms_norm_eps=d.get("rms_norm_eps", 1e-6),
    )
    moe = MoEConfig(
        num_experts=d.get("n_routed_experts", 256),
        top_k=d.get("num_experts_per_tok", 8),
        norm_topk_prob=d.get("norm_topk_prob", True),
        routing="sigmoid",
        routed_scaling_factor=d.get("routed_scaling_factor", 2.5),
        n_shared_experts=d.get("n_shared_experts", 1),
        moe_intermediate_size=d.get("moe_intermediate_size", 2048),
        hidden_act=d.get("hidden_act", "silu"),
        n_group=d.get("n_group", 1),
        topk_group=d.get("topk_group", 1),
    )
    return dataclasses.replace(cfg, mla=mcfg, moe=moe)


def params_from_flat(flat: dict, cfg: TransformerConfig, d: dict,
                     qcfg=None) -> dict:
    mcfg: MLAConfig = cfg.mla
    params = {
        "embed": base._maybe_quantized(flat, "model.embed_tokens", qcfg),
        "norm": flat["model.norm.weight"],
        "layers": [],
    }
    first_dense = d.get("first_k_dense_replace", 0)
    E = cfg.moe.num_experts
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
            "kv_a_proj_with_mqa":
                base._linear_params(flat, f"{p}.self_attn.kv_a_proj_with_mqa",
                                    qcfg),
            "kv_a_layernorm": flat[f"{p}.self_attn.kv_a_layernorm.weight"],
            "o_proj": base._linear_params(flat, f"{p}.self_attn.o_proj", qcfg),
        }
        if mcfg.q_lora_rank is None:
            lp["q_proj"] = base._linear_params(flat, f"{p}.self_attn.q_proj",
                                               qcfg)
        else:
            lp["q_a_proj"] = base._linear_params(flat, f"{p}.self_attn.q_a_proj",
                                                 qcfg)
            lp["q_a_layernorm"] = flat[f"{p}.self_attn.q_a_layernorm.weight"]
            lp["q_b_proj"] = base._linear_params(flat, f"{p}.self_attn.q_b_proj",
                                                 qcfg)
        w_uk, w_uv = absorb_kv_b(flat[f"{p}.self_attn.kv_b_proj.weight"], mcfg)
        lp["w_uk"], lp["w_uv"] = w_uk, w_uv
        if i < first_dense or f"{p}.mlp.gate_proj.weight" in flat:
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


def init_cache(cfg: TransformerConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> ModelCache:
    """Latent caches: 576 floats/token/layer instead of H*2*head_dim
    (reference: glm-4.7-flash-mlx lib.rs:7-20)."""
    return ModelCache(
        layers=[mla.init_cache_layer(batch, cfg.mla, max_len, dtype)
                for _ in range(cfg.num_layers)],
        offset=jnp.zeros((), jnp.int32))


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return params_from_flat(flat, cfg, raw, raw.get("quantization")), cfg


forward = base.forward
