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


# non-LLM families: model_type -> (module path, capability). Their
# load_model() returns a capability object directly (transcribe /
# synthesize / generate / VoiceCloner), matching the server contracts
# (reference README.md:360-366, 472-490).
PIPELINE_TYPES = {
    "paraformer": ("ominix_mlx_tpu.models.paraformer", "transcribe"),
    "funasr_nano": ("ominix_mlx_tpu.models.funasr_nano", "transcribe"),
    "funasr_qwen4b": ("ominix_mlx_tpu.models.funasr_nano", "transcribe"),
    "qwen3_asr": ("ominix_mlx_tpu.models.qwen3_asr", "transcribe"),
    "qwen3_tts": ("ominix_mlx_tpu.models.qwen3_tts", "speak"),
    "gpt_sovits": ("ominix_mlx_tpu.models.gpt_sovits", "clone"),
    "step_audio2": ("ominix_mlx_tpu.models.step_audio2", "speech2speech"),
    "flux_klein": ("ominix_mlx_tpu.models.flux_klein", "image"),
    "qwen_image": ("ominix_mlx_tpu.models.qwen_image", "image"),
    "zimage": ("ominix_mlx_tpu.models.zimage", "image"),
    "deepseek_ocr2": ("ominix_mlx_tpu.models.deepseek_ocr2", "ocr"),
    "deepseek_vl_v2": ("ominix_mlx_tpu.models.deepseek_ocr2", "ocr"),
    "moxin_vlm": ("ominix_mlx_tpu.models.moxin_vlm", "vlm"),
    "prismatic": ("ominix_mlx_tpu.models.moxin_vlm", "vlm"),
}


def capability(model_type: str) -> str:
    if model_type in MODEL_TYPES:
        return "chat"
    if model_type in PIPELINE_TYPES:
        return PIPELINE_TYPES[model_type][1]
    return "unknown"


def get_module(model_type: str):
    if model_type in MODEL_TYPES:
        return importlib.import_module(MODEL_TYPES[model_type])
    if model_type in PIPELINE_TYPES:
        return importlib.import_module(PIPELINE_TYPES[model_type][0])
    raise ValueError(f"unsupported model_type {model_type!r}; known: "
                     f"{sorted(MODEL_TYPES) + sorted(PIPELINE_TYPES)}")


def load_model(model_dir: str):
    """LLM families -> (module, params, config); module exposes
    forward/init_cache (the chat-server contract)."""
    raw = load_config(model_dir)
    mt = raw["model_type"]
    if mt not in MODEL_TYPES:
        raise ValueError(f"{mt!r} is not a chat model; use load_pipeline")
    mod = get_module(mt)
    params, cfg = mod.load_model(model_dir)
    return mod, params, cfg


def load_pipeline(model_dir: str):
    """Any family -> (capability, object). Chat models come wrapped so one
    call loads anything the server can serve (reference: the unified
    'one server, all modalities' contract, README.md:360-366)."""
    raw = load_config(model_dir)
    mt = raw["model_type"]
    if mt in MODEL_TYPES:
        return "chat", load_model(model_dir)
    mod = get_module(mt)
    return PIPELINE_TYPES[mt][1], mod.load_model(model_dir)
