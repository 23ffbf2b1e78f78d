"""DeepSeek-OCR-2: SAM ViT-B -> Qwen2 visual-causal-flow compressor ->
projector -> MoE decoder with image-token splicing.

TPU-native counterpart of reference crate deepseek-ocr2-mlx:
  - SAM-style windowed-attention encoder (vision.rs, 611 LoC ->
    models/sam_vit.py; a generic ViT is still accepted for small tests)
  - Qwen2 decoder-as-encoder "visual causal flow" (qwen2_encoder.rs:1-8):
    SAM features + learnable query tokens, image tokens bidirectional,
    queries causal -> compressed [B, n_query, 896] features
  - single-linear projector 896 -> 1280 (lib.rs:967-971)
  - DeepSeek-V2-style MoE decoder: first-k-dense, softmax greedy top-6 of
    64 routed + 2 shared experts (lib.rs:165-206)
  - prompt format "<|User|>: {} ... <|Assistant|>:" with IMAGE_TOKEN_ID
    blocks spliced by embedding overwrite (tokenize_prompt lib.rs:791-869,
    prepare_inputs :522)
  - PDF ingestion via utils/pdf.py (reference pdf.rs:1-259)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import base, vit
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.models.moe import MoEConfig
from ominix_mlx_tpu.nn.layers import embedding, linear, rms_norm

IMAGE_TOKEN_ID = 128815           # lib.rs:787
BOS_TOKEN_ID = 0
EOS_TOKEN_ID = 1


# ------------------------------------------------- visual causal flow -------

def visual_flow_config(hidden: int = 896, layers: int = 24) -> TransformerConfig:
    """24-layer Qwen2 compressor (qwen2_encoder.rs:303-334: 896 dim,
    14 q / 2 kv heads, 4864 ffn, theta 1e6)."""
    return TransformerConfig(
        vocab_size=1, hidden_size=hidden, num_layers=layers,
        num_heads=14 if hidden == 896 else max(2, hidden // 64),
        num_kv_heads=2, intermediate_size=4864 if hidden == 896 else 2 * hidden,
        head_dim=64 if hidden == 896 else None,
        rope_theta=1_000_000.0, rms_norm_eps=1e-6, tie_word_embeddings=True)


def visual_flow_mask(n_image: int, n_query: int) -> jax.Array:
    """[T, T] additive mask: image tokens bidirectional among themselves,
    query tokens attend to all images + causally to prior queries
    (qwen2_encoder.rs build_visual_causal_mask)."""
    T = n_image + n_query
    m = np.full((T, T), -1e9, np.float32)
    m[:n_image, :n_image] = 0.0
    m[n_image:, :n_image] = 0.0
    qq = np.triu(np.full((n_query, n_query), -1e9, np.float32), 1)
    m[n_image:, n_image:] = qq
    return jnp.asarray(m)


def visual_flow_encode(params: dict, cfg: TransformerConfig,
                       feats: jax.Array) -> jax.Array:
    """SAM features [B, h, w, C] or [B, N, C] -> query features
    [B, n_query, C] (qwen2_encoder.rs forward_vision)."""
    from ominix_mlx_tpu.core.cache import KVCache

    if feats.ndim == 4:
        feats = feats.reshape(feats.shape[0], -1, feats.shape[-1])
    B, n_image, C = feats.shape
    # query bank keyed by image grid size (144 for 768px, 256 for 1024px)
    qname = "query_768" if n_image <= 144 else "query_1024"
    q = params[qname].astype(feats.dtype)
    n_query = q.shape[0]
    x = jnp.concatenate([feats, jnp.broadcast_to(q[None], (B, n_query, C))], 1)
    T = n_image + n_query
    mask = visual_flow_mask(n_image, n_query)
    rope = cfg.rope()
    zero = jnp.zeros((), jnp.int32)
    for lp in params["layers"]:
        lc = KVCache.init(B, cfg.num_kv_heads, T, cfg.hd, x.dtype)
        x, _ = base.decoder_layer(lp, cfg, x, lc, zero, mask, rope)
    x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return x[:, n_image:]


# --------------------------------------------------------------- prompts ----

def tokenize_prompt(tokenizer, prompt: str, n_image_tokens: int,
                    image_tag: str = "<image>"):
    """Conversation format + image-token block (tokenize_prompt,
    lib.rs:791-869). Returns token ids with ``n_image_tokens`` + 1
    IMAGE_TOKEN_ID slots (global view + separator) at the ``<image>``
    position (prepended if absent)."""
    if image_tag not in prompt:
        prompt = image_tag + prompt
    formatted = f"<|User|>: {prompt}\n\n<|Assistant|>:"
    pre, _, post = formatted.partition(image_tag)
    ids = [BOS_TOKEN_ID] + tokenizer.encode(pre, add_special_tokens=False) \
        if hasattr(tokenizer, "encode") else [BOS_TOKEN_ID]
    img_block = [IMAGE_TOKEN_ID] * (n_image_tokens + 1)   # + view separator
    tail = tokenizer.encode(post, add_special_tokens=False) \
        if hasattr(tokenizer, "encode") else []
    return ids + img_block + tail


# --------------------------------------------------------------- decoder ----

def config_from_hf(d: dict) -> TransformerConfig:
    """OCR2 decoder config (lib.rs:59-130 defaults: 1280 dim, 12 layers,
    10 heads MHA, 64 experts top-6 + 2 shared, first_k_dense=1)."""
    cfg = TransformerConfig(
        vocab_size=d.get("vocab_size", 129280),
        hidden_size=d.get("hidden_size", 1280),
        num_layers=d.get("num_hidden_layers", 12),
        num_heads=d.get("num_attention_heads", 10),
        num_kv_heads=d.get("num_key_value_heads", 10),
        intermediate_size=d.get("intermediate_size", 6848),
        rms_norm_eps=d.get("rms_norm_eps", 1e-6),
        rope_theta=d.get("rope_theta", 10000.0),
        tie_word_embeddings=d.get("tie_word_embeddings", False))
    moe = MoEConfig(
        num_experts=d.get("n_routed_experts", 64),
        top_k=d.get("num_experts_per_tok", 6),
        norm_topk_prob=d.get("norm_topk_prob", False),
        routing="softmax",
        routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
        n_shared_experts=d.get("n_shared_experts", 2),
        moe_intermediate_size=d.get("moe_intermediate_size", 896))
    return dataclasses.replace(cfg, moe=moe)


def lm_params_from_flat(flat: dict, cfg: TransformerConfig,
                        first_k_dense: int = 1) -> dict:
    """model.layers.{i} names (deepseek-v2 style; lib.rs:982-1070)."""
    E = cfg.moe.num_experts
    params = {
        "embed": flat["model.embed_tokens.weight"],
        "norm": flat["model.norm.weight"],
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
        }
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            lp[n] = base._linear_params(flat, f"{p}.self_attn.{n}", None)
        if i < first_k_dense or f"{p}.mlp.gate_proj.weight" in flat:
            for n in ("gate_proj", "up_proj", "down_proj"):
                lp[n] = base._linear_params(flat, f"{p}.mlp.{n}", None)
        else:
            lp["moe"] = {
                "gate": {"w": flat[f"{p}.mlp.gate.weight"]},
                "experts": {
                    n: jnp.stack([flat[f"{p}.mlp.experts.{e}.{n}.weight"]
                                  for e in range(E)])
                    for n in ("gate_proj", "up_proj", "down_proj")},
                "shared_expert": {
                    n: {"w": flat[f"{p}.mlp.shared_experts.{n}.weight"]}
                    for n in ("gate_proj", "up_proj", "down_proj")},
            }
        params["layers"].append(lp)
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = base._linear_params(flat, "lm_head", None)
    return params


def flow_params_from_flat(flat: dict,
                          prefix: str = "model.qwen2_model") -> dict:
    """{prefix}.model.model.layers.{i} / .norm + {prefix}.query_{768,1024}
    (qwen2_encoder.rs:290-392)."""
    mp = f"{prefix}.model.model"
    layers = []
    i = 0
    while f"{mp}.layers.{i}.input_layernorm.weight" in flat:
        p = f"{mp}.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
        }
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            lp[n] = base._linear_params(flat, f"{p}.self_attn.{n}", None)
        for n in ("gate_proj", "up_proj", "down_proj"):
            lp[n] = base._linear_params(flat, f"{p}.mlp.{n}", None)
        layers.append(lp)
        i += 1
    return {
        "layers": layers,
        "norm": flat[f"{mp}.norm.weight"],
        "query_768": flat[f"{prefix}.query_768.weight"],
        "query_1024": flat[f"{prefix}.query_1024.weight"],
    }


# ----------------------------------------------------------------- model ----

@dataclasses.dataclass
class DeepSeekOCR2:
    vision_params: dict
    vision_cfg: object                # SamViTConfig or vit.ViTConfig
    projector: dict                   # {"w","b"} linear OR legacy fc1/fc2 MLP
    lm_params: dict                   # MoE decoder (base-style params)
    lm_cfg: TransformerConfig
    flow_params: Optional[dict] = None
    flow_cfg: Optional[TransformerConfig] = None
    view_separator: Optional[jax.Array] = None   # [D_lm] (lib.rs:974)
    tokenizer: Optional[object] = None

    def encode_page(self, image01: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [0,1] -> LLM-space image embeddings [B, N, D]."""
        from ominix_mlx_tpu.models import sam_vit
        if isinstance(self.vision_cfg, sam_vit.SamViTConfig):
            f = sam_vit.encode(self.vision_params, self.vision_cfg,
                               image01 * 2.0 - 1.0)
        else:
            f = vit.encode(self.vision_params, self.vision_cfg,
                           image01 * 2.0 - 1.0)
        if self.flow_params is not None:
            f = visual_flow_encode(self.flow_params, self.flow_cfg, f)
        if f.ndim == 4:
            f = f.reshape(f.shape[0], -1, f.shape[-1])
        if "fc1" in self.projector:       # legacy 2-layer MLP projector
            h = jax.nn.gelu(linear(self.projector["fc1"], f))
            return linear(self.projector["fc2"], h)
        return linear(self.projector, f)

    @property
    def n_image_tokens(self) -> int:
        size = getattr(self.vision_cfg, "img_size",
                       getattr(self.vision_cfg, "image_size", 1024))
        return (size // 16 // 4) ** 2     # patch 16, flow downsample 4

    def ocr_pdf_tokens(self, pdf_bytes: bytes, prompt_tokens: List[int],
                       image_token_pos: int = 0, max_tokens: int = 128,
                       stop_tokens=(), dpi: int = 200) -> List[List[int]]:
        """OCR every page of a PDF (reference: pdf.rs + lib.rs pipeline)."""
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
                       image_token_pos: int = 0) -> jax.Array:
        """Splice image embeddings into the prompt (reference:
        prepare_inputs, lib.rs:522). If the prompt contains IMAGE_TOKEN_ID
        slots they are OVERWRITTEN in place (+ trailing view separator);
        otherwise embeddings are inserted at ``image_token_pos``."""
        patches = self.encode_page(image01)
        emb = embedding(self.lm_params["embed"], jnp.asarray([prompt_tokens]))
        tok = np.asarray(prompt_tokens)
        slots = np.nonzero(tok == IMAGE_TOKEN_ID)[0]
        if slots.size:
            n = patches.shape[1]
            fill = patches[0]
            if self.view_separator is not None and slots.size >= n + 1:
                fill = jnp.concatenate(
                    [fill, self.view_separator[None].astype(fill.dtype)], 0)
            k = min(slots.size, fill.shape[0])
            return emb.at[0, slots[:k]].set(fill[:k].astype(emb.dtype))
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

    # ------------------------------------------------- server/CLI facade ----

    def ocr(self, image01, prompt: str = "Free OCR.",
            max_tokens: int = 512) -> str:
        """[H, W, 3] float image (or [B, ...]) -> text (the server's OCR
        contract; reference README OCR surface)."""
        if hasattr(image01, "ndim") and image01.ndim == 3:
            image01 = image01[None]
        size = getattr(self.vision_cfg, "img_size",
                       getattr(self.vision_cfg, "image_size", 1024))
        if image01.shape[1] != size or image01.shape[2] != size:
            image01 = jax.image.resize(
                jnp.asarray(image01, jnp.float32),
                (image01.shape[0], size, size, 3), "bilinear")
        ids = tokenize_prompt(self.tokenizer, prompt, self.n_image_tokens) \
            if self.tokenizer else [BOS_TOKEN_ID] \
            + [IMAGE_TOKEN_ID] * (self.n_image_tokens + 1)
        out = self.ocr_tokens(jnp.asarray(image01, jnp.float32), ids,
                              max_tokens=max_tokens,
                              stop_tokens=(EOS_TOKEN_ID,))
        return (self.tokenizer.decode(out) if self.tokenizer
                else " ".join(map(str, out)))

    def ocr_pdf(self, pdf_bytes: bytes, prompt: str = "Free OCR.",
                max_tokens: int = 512, dpi: int = 200) -> List[str]:
        ids = tokenize_prompt(self.tokenizer, prompt, self.n_image_tokens) \
            if self.tokenizer else [BOS_TOKEN_ID] \
            + [IMAGE_TOKEN_ID] * (self.n_image_tokens + 1)
        pages = self.ocr_pdf_tokens(pdf_bytes, ids, max_tokens=max_tokens,
                                    stop_tokens=(EOS_TOKEN_ID,), dpi=dpi)
        return [(self.tokenizer.decode(p) if self.tokenizer
                 else " ".join(map(str, p))) for p in pages]


def load_model(model_dir: str) -> DeepSeekOCR2:
    """HF checkpoint layout (lib.rs:946-1070): model.sam_model.*,
    model.qwen2_model.*, model.projector.layers.*, model.view_seperator,
    model.embed_tokens/layers/norm + config.json."""
    import os

    from ominix_mlx_tpu.models import sam_vit
    from ominix_mlx_tpu.utils.loading import load_config, load_safetensors

    raw = load_config(model_dir)
    flat = load_safetensors(model_dir)
    cfg = config_from_hf(raw)
    sam_cfg = sam_vit.SamViTConfig(adapter_chans=896)
    vision_params = sam_vit.params_from_flat(flat, sam_cfg,
                                             prefix="model.sam_model")
    flow_params = flow_params_from_flat(flat)
    flow_cfg = visual_flow_config()
    projector = {"w": flat["model.projector.layers.weight"]}
    if "model.projector.layers.bias" in flat:
        projector["b"] = flat["model.projector.layers.bias"]
    lm_params = lm_params_from_flat(
        flat, cfg, raw.get("first_k_dense_replace", 1))
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return DeepSeekOCR2(
        vision_params=vision_params, vision_cfg=sam_cfg,
        projector=projector, lm_params=lm_params, lm_cfg=cfg,
        flow_params=flow_params, flow_cfg=flow_cfg,
        view_separator=flat.get("model.view_seperator"), tokenizer=tok)
