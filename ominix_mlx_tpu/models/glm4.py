"""GLM-4 dense (9B) — partial RoPE transformer.

TPU-native counterpart of reference crate glm4-mlx (model.rs): standard GQA
decoder with **partial RoPE** (rotary over head_dim/2, model.rs:116-133),
attention bias on q/k/v, and post-attention structure identical to the base
decoder. HF glm4 checkpoints also carry fused gate_up_proj weights.
"""

from __future__ import annotations

import dataclasses

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    cfg = TransformerConfig.from_hf(d)
    return dataclasses.replace(
        cfg,
        partial_rotary_factor=d.get("partial_rotary_factor", 0.5),
        attention_bias=d.get("attention_bias", True),
        rope_traditional=True,   # GLM rotary is interleaved-pair
    )


def params_from_flat(flat: dict, cfg: TransformerConfig, qcfg=None) -> dict:
    params = {
        "embed": base._maybe_quantized(flat, "model.embed_tokens", qcfg),
        "norm": flat["model.norm.weight"],
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
            "post_self_attn_layernorm":
                flat[f"{p}.post_self_attn_layernorm.weight"],
            "post_mlp_layernorm": flat[f"{p}.post_mlp_layernorm.weight"],
            "q_proj": base._linear_params(flat, f"{p}.self_attn.q_proj", qcfg),
            "k_proj": base._linear_params(flat, f"{p}.self_attn.k_proj", qcfg),
            "v_proj": base._linear_params(flat, f"{p}.self_attn.v_proj", qcfg),
            "o_proj": base._linear_params(flat, f"{p}.self_attn.o_proj", qcfg),
        }
        if f"{p}.mlp.gate_up_proj.weight" in flat:
            lp["gate_up_proj"] = base._linear_params(
                flat, f"{p}.mlp.gate_up_proj", qcfg)
        else:
            lp["gate_proj"] = base._linear_params(flat, f"{p}.mlp.gate_proj", qcfg)
            lp["up_proj"] = base._linear_params(flat, f"{p}.mlp.up_proj", qcfg)
        lp["down_proj"] = base._linear_params(flat, f"{p}.mlp.down_proj", qcfg)
        params["layers"].append(lp)
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", qcfg)
    return params


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return params_from_flat(flat, cfg, raw.get("quantization")), cfg


forward = base.forward
init_cache = base.init_cache
