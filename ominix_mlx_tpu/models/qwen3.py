"""Qwen3 dense (and Qwen2, via config) — flagship LLM family.

TPU-native counterpart of reference crate qwen3-mlx (model.rs): GQA attention
with QK-RMSNorm (qwen3-mlx/src/model.rs:69-146), SwiGLU MLP (:232), tied or
separate lm_head (:478-486), safetensors/quantized loading (:521-620).
The architecture lives in models/base.py; this module pins the config
mapping and the public ``load_model`` API.
"""

from __future__ import annotations

import jax.numpy as jnp

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig, forward, init_cache
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    return TransformerConfig.from_hf(d)


def load_model(model_dir: str):
    """Load a Qwen3/Qwen2 checkpoint dir -> (params, config).

    Handles both HF fp checkpoints and mlx-community quantized checkpoints
    (reference: load_model / load_model_quantized, qwen3-mlx/src/model.rs:521,620).
    """
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    qcfg = raw.get("quantization")
    params = base.params_from_flat(flat, cfg, qcfg)
    return params, cfg


init_params = base.init_params
