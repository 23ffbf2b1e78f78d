"""DeepSeek-OCR-2: SAM ViT-B vision encoder -> projector -> MoE decoder
with image token splicing.

TPU-native counterpart of reference crate deepseek-ocr2-mlx: the crate's
specific SAM-style windowed-attention encoder (vision.rs, 611 LoC ->
models/sam_vit.py; a generic ViT is still accepted for small tests),
Qwen2-style text side, MoE decoder with routed + shared experts
(lib.rs:165-206,304), ``prepare_inputs`` image-token splicing (lib.rs:522),
and PDF ingestion via utils/pdf.py (reference pdf.rs:1-259).
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
        from ominix_mlx_tpu.models import sam_vit
        if isinstance(self.vision_cfg, sam_vit.SamViTConfig):
            f = sam_vit.encode(self.vision_params, self.vision_cfg,
                               image01 * 2.0 - 1.0)
            feats = f.reshape(f.shape[0], -1, f.shape[-1])  # [B, hw, C]
        else:
            feats = vit.encode(self.vision_params, self.vision_cfg,
                               image01 * 2.0 - 1.0)
        h = jax.nn.gelu(linear(self.projector["fc1"], feats))
        return linear(self.projector["fc2"], h)

    def ocr_pdf_tokens(self, pdf_bytes: bytes, prompt_tokens: List[int],
                       image_token_pos: int = 0, max_tokens: int = 128,
                       stop_tokens=(), dpi: int = 200) -> List[List[int]]:
        """OCR every page of a PDF (reference: pdf.rs + lib.rs pipeline)."""
        import numpy as np

        from ominix_mlx_tpu.utils import pdf as pdf_mod
        size = getattr(self.vision_cfg, "img_size",
                       getattr(self.vision_cfg, "image_size", 1024))
        outs = []
        for page in pdf_mod.render_pdf_pages(pdf_bytes, dpi):
            img = jax.image.resize(
                jnp.asarray(page.image, jnp.float32) / 255.0,
                (size, size, 3), "bilinear")[None]
            outs.append(self.ocr_tokens(img, prompt_tokens, image_token_pos,
                                        max_tokens, stop_tokens))
        return outs

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
