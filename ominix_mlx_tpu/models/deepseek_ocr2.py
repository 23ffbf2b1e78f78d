"""DeepSeek-OCR-2: vision encoder -> projector -> MoE decoder with image
token splicing.

TPU-native counterpart of reference crate deepseek-ocr2-mlx: vision encoder
(vision.rs, 611 LoC — ViT-class, models/vit.py), Qwen2-style text side,
MoE decoder with routed + shared experts (lib.rs:165-206,304), and
``prepare_inputs`` image-token splicing (lib.rs:522). The reference's
pdfium-based PDF ingestion (pdf.rs) is gated: pages are accepted as
pre-rasterized [H, W, 3] arrays here (pdfium is not in this image).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.models import base, vit
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.nn.layers import embedding, init_linear, linear


@dataclasses.dataclass
class DeepSeekOCR2:
    vision_params: dict
    vision_cfg: vit.ViTConfig
    projector: dict                   # 2-layer MLP vision->LLM dims
    lm_params: dict                   # MoE decoder (qwen3_moe-style params)
    lm_cfg: TransformerConfig

    def encode_page(self, image01: jax.Array) -> jax.Array:
        feats = vit.encode(self.vision_params, self.vision_cfg,
                           image01 * 2.0 - 1.0)
        h = jax.nn.gelu(linear(self.projector["fc1"], feats))
        return linear(self.projector["fc2"], h)

    def prepare_inputs(self, image01: jax.Array, prompt_tokens: List[int],
                       image_token_pos: int) -> jax.Array:
        """Splice image embeddings at ``image_token_pos`` in the prompt
        (reference: prepare_inputs, lib.rs:522)."""
        patches = self.encode_page(image01)
        emb = embedding(self.lm_params["embed"], jnp.asarray([prompt_tokens]))
        return jnp.concatenate([
            emb[:, :image_token_pos],
            patches.astype(emb.dtype),
            emb[:, image_token_pos:]], axis=1)

    def ocr_tokens(self, image01: jax.Array, prompt_tokens: List[int],
                   image_token_pos: int = 0, max_tokens: int = 128,
                   stop_tokens=()) -> List[int]:
        from ominix_mlx_tpu.core.generate import Engine

        embeds = self.prepare_inputs(image01, prompt_tokens, image_token_pos)
        T = embeds.shape[1]
        cache = base.init_cache(self.lm_cfg, 1, T + max_tokens + 8,
                                embeds.dtype)
        logits, cache = jax.jit(base.forward_embeds,
                                static_argnames=("cfg",))(
            self.lm_params, self.lm_cfg, embeds, cache)
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
