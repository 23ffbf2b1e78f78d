"""Mistral 7B — plain GQA + RoPE transformer with optional sliding window.

TPU-native counterpart of reference crate mistral-mlx (model.rs:945 LoC):
the architecture is exactly the base decoder; sliding-window masking comes
from the shared mask builder (reference: mlx-rs-core/src/utils.rs:160-170).
"""

from __future__ import annotations

import dataclasses

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.utils.loading import load_config, load_safetensors


def config_from_hf(d: dict) -> TransformerConfig:
    cfg = TransformerConfig.from_hf(d)
    if d.get("sliding_window"):
        cfg = dataclasses.replace(cfg, sliding_window=d["sliding_window"])
    return cfg


def load_model(model_dir: str):
    raw = load_config(model_dir)
    cfg = config_from_hf(raw)
    flat = load_safetensors(model_dir)
    return base.params_from_flat(flat, cfg, raw.get("quantization")), cfg


forward = base.forward
init_cache = base.init_cache
init_params = base.init_params
