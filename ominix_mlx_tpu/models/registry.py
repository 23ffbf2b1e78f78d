"""Unified model loading: one ``load_model(dir)`` for every family.

The reference exposes per-crate ``load_model`` functions (qwen3-mlx,
glm4-mlx, ...); here a single registry dispatches on HF ``model_type``
(config.json), the way the server's model manager needs it.
"""

from __future__ import annotations

import importlib

from ominix_mlx_tpu.utils.loading import load_config

# model_type -> module path (lazy imports keep startup light)
MODEL_TYPES = {
    "qwen3": "ominix_mlx_tpu.models.qwen3",
    "qwen2": "ominix_mlx_tpu.models.qwen3",
    "mistral": "ominix_mlx_tpu.models.mistral",
    "glm4": "ominix_mlx_tpu.models.glm4",
    "glm": "ominix_mlx_tpu.models.glm4",
    "mixtral": "ominix_mlx_tpu.models.mixtral",
    "qwen3_moe": "ominix_mlx_tpu.models.qwen3_moe",
    "qwen2_moe": "ominix_mlx_tpu.models.qwen3_moe",
    "glm4_moe": "ominix_mlx_tpu.models.glm4_moe",
    "deepseek_v3": "ominix_mlx_tpu.models.deepseek_v3",
    "deepseek_v2": "ominix_mlx_tpu.models.deepseek_v3",
    "glm_47_flash": "ominix_mlx_tpu.models.deepseek_v3",
    "qwen3_next": "ominix_mlx_tpu.models.qwen3_next",
    "minicpm_sala": "ominix_mlx_tpu.models.minicpm_sala",
    "minicpm4": "ominix_mlx_tpu.models.minicpm_sala",
}


def get_module(model_type: str):
    if model_type not in MODEL_TYPES:
        raise ValueError(f"unsupported model_type {model_type!r}; "
                         f"known: {sorted(MODEL_TYPES)}")
    return importlib.import_module(MODEL_TYPES[model_type])


def load_model(model_dir: str):
    """-> (module, params, config). module exposes forward/init_cache."""
    raw = load_config(model_dir)
    mod = get_module(raw["model_type"])
    params, cfg = mod.load_model(model_dir)
    return mod, params, cfg
