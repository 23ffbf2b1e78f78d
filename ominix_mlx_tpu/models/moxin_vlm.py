"""Moxin-7B VLM: dual vision towers (DINOv2 + SigLIP) -> channel-concat ->
fused-GELU-MLP projector -> Mistral-7B decoder.

TPU-native counterpart of reference crate moxin-vlm-mlx (lib.rs:9-10,
282-331; vision.rs; projector.rs): per-tower ImageNet/SigLIP normalization
(lib.rs:424+), patch features channel-concatenated, 3-layer GELU projector,
image tokens spliced before the text prompt, Mistral decoder via
base.forward_embeds. Selective quantization: the LLM may be quantized while
the vision stack stays bf16 (lib.rs:366-383) — here that is just which
subtree you pass through quantize_params.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import base, vit
from ominix_mlx_tpu.nn.layers import embedding, init_linear, linear

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
SIGLIP_MEAN = np.asarray([0.5, 0.5, 0.5], np.float32)
SIGLIP_STD = np.asarray([0.5, 0.5, 0.5], np.float32)


def preprocess(image01: jax.Array):
    """image01: [B, H, W, 3] in [0,1] -> per-tower normalized inputs."""
    dino = (image01 - IMAGENET_MEAN) / IMAGENET_STD
    sig = (image01 - SIGLIP_MEAN) / SIGLIP_STD
    return dino, sig


def project(p: dict, x: jax.Array) -> jax.Array:
    """Prismatic fused-gelu-mlp projector (projector.rs:34-40)."""
    h = jax.nn.gelu(linear(p["fc1"], x))
    h = jax.nn.gelu(linear(p["fc2"], h))
    return linear(p["fc3"], h)


@dataclasses.dataclass
class MoxinVLM:
    dino_params: dict
    dino_cfg: vit.ViTConfig
    siglip_params: dict
    siglip_cfg: vit.ViTConfig
    projector: dict
    lm_params: dict
    lm_cfg: base.TransformerConfig
    tokenizer: Optional[object] = None

    def encode_image(self, image01: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [0,1] -> LLM-space patch embeddings [B, N, D]."""
        dino_in, sig_in = preprocess(image01)
        fd = vit.encode(self.dino_params, self.dino_cfg, dino_in)
        fs = vit.encode(self.siglip_params, self.siglip_cfg, sig_in)
        fused = jnp.concatenate([fd, fs], axis=-1)    # channel concat
        return project(self.projector, fused)

    def generate(self, image01: jax.Array, prompt_tokens: List[int],
                 max_tokens: int = 64, stop_tokens=()):
        patches = self.encode_image(image01)
        emb_txt = embedding(self.lm_params["embed"],
                            jnp.asarray([prompt_tokens]))
        embeds = jnp.concatenate([patches.astype(emb_txt.dtype), emb_txt], 1)
        T = embeds.shape[1]
        cache = base.init_cache(self.lm_cfg, 1, T + max_tokens + 8,
                                emb_txt.dtype)
        logits, cache = jax.jit(
            base.forward_embeds, static_argnames=("cfg",))(
            self.lm_params, self.lm_cfg, embeds, cache)
        from ominix_mlx_tpu.core.generate import Engine
        engine = Engine(lambda p, t, c: base.forward(p, self.lm_cfg, t, c),
                        self.lm_params)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        out = []
        for _ in range(max_tokens):
            t = int(tok[0])
            if t in stop_tokens:
                break
            out.append(t)
            tok, _, cache, _ = engine._decode_jit(
                self.lm_params, cache, tok, jax.random.PRNGKey(0),
                jnp.full((1, 64), -1, jnp.int32), sampler=engine.sampler)
        return out

    # ------------------------------------------------- server/CLI facade ----

    def chat(self, prompt: str, image01=None, max_tokens: int = 256) -> str:
        """Image-chat contract for /v1/chat/completions content arrays:
        Prismatic "Pure" prompt format "In: {}\nOut:" (reference
        examples/generate.rs:85), image patches spliced before the text."""
        text = f"In: {prompt}\nOut:"
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(text)
            stops = tuple({self.tokenizer.eos_token_id} - {None})
        else:
            ids = [1] + [ord(c) % self.lm_cfg.vocab_size for c in text][:32]
            stops = ()
        if image01 is None:
            image01 = jnp.zeros(
                (1, self.dino_cfg.image_size, self.dino_cfg.image_size, 3),
                jnp.float32)
        elif hasattr(image01, "ndim") and image01.ndim == 3:
            image01 = image01[None]
        size = self.dino_cfg.image_size
        if image01.shape[1] != size or image01.shape[2] != size:
            image01 = jax.image.resize(
                jnp.asarray(image01, jnp.float32),
                (image01.shape[0], size, size, 3), "bilinear")
        out = self.generate(jnp.asarray(image01, jnp.float32), ids,
                            max_tokens=max_tokens, stop_tokens=stops)
        return (self.tokenizer.decode(out) if self.tokenizer
                else " ".join(map(str, out)))


def init_tiny(key) -> MoxinVLM:
    """Random tiny assembly (tests)."""
    dcfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                         num_layers=1, num_heads=2, mlp_dim=48,
                         has_cls_token=True, num_registers=2, layer_scale=True)
    scfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=24,
                         num_layers=1, num_heads=2, mlp_dim=32,
                         has_cls_token=False)
    lm_cfg = base.TransformerConfig(
        vocab_size=64, hidden_size=48, num_layers=1, num_heads=2,
        num_kv_heads=1, head_dim=24, intermediate_size=64,
        tie_word_embeddings=True)
    ks = jax.random.split(key, 5)
    proj = {
        "fc1": init_linear(ks[0], 32 + 24, 64, True, jnp.float32),
        "fc2": init_linear(ks[1], 64, 64, True, jnp.float32),
        "fc3": init_linear(ks[2], 64, 48, True, jnp.float32),
    }
    return MoxinVLM(
        dino_params=vit.init_params(dcfg, ks[3]), dino_cfg=dcfg,
        siglip_params=vit.init_params(scfg, ks[4]), siglip_cfg=scfg,
        projector=proj,
        lm_params=base.init_params(lm_cfg, ks[0], jnp.float32),
        lm_cfg=lm_cfg)


def load_model(model_dir: str) -> MoxinVLM:
    """Load Moxin-7B VLM from a converted checkpoint dir: HF-named tower
    tensors under dino./siglip. prefixes (params_from_hf_dinov2/siglip),
    projector.fc1-3, and the Mistral LLM under llm. (reference:
    moxin-vlm-mlx/src/lib.rs:282-383; vision stays bf16, LLM may be
    quantized)."""
    from ominix_mlx_tpu.utils.loading import load_config, load_safetensors

    raw = load_config(model_dir)
    flat = load_safetensors(model_dir)

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in flat.items()
                if k.startswith(prefix)}

    dcfg = vit.DINOV2_LARGE
    scfg = vit.SIGLIP_SO400M
    lm_cfg = base.TransformerConfig.from_hf(raw.get("text_config", raw))
    proj_flat = sub("projector.")
    projector = {
        name: {"w": proj_flat[f"{name}.weight"],
               **({"b": proj_flat[f"{name}.bias"]}
                  if f"{name}.bias" in proj_flat else {})}
        for name in ("fc1", "fc2", "fc3")}
    import os
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return MoxinVLM(
        dino_params=vit.params_from_hf_dinov2(sub("dino."), dcfg),
        dino_cfg=dcfg,
        siglip_params=vit.params_from_hf_siglip(sub("siglip."), scfg),
        siglip_cfg=scfg,
        projector=projector,
        lm_params=base.params_from_flat(sub("llm."), lm_cfg),
        lm_cfg=lm_cfg, tokenizer=tok)
