"""Qwen-Image 20B: MMDiT (dual-stream joint-attention) flow-matching DiT.

TPU-native counterpart of reference crate qwen-image-mlx:
  - QwenTransformerBlock: per-stream AdaLayerNormZero (6 params) + SHARED
    joint attention + per-stream gelu FFN (src/transformer/block.rs:20-120)
  - joint attention with QK-RMSNorm and 3-axis rope
    (src/transformer/attention.rs)
  - FlowMatchEulerScheduler sigmas with shift (pipeline.rs:17-82)
    -> dit.common.shifted_linear_schedule / denoise
  - AdaLayerNormContinuous final layer (norm.rs:69)
  - 3D-causal-conv VAE -> models/dit/vae3d.py
Text conditioning comes from a Qwen2.5-VL encoder (the LLM stack here).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models.dit.common import (apply_rope_interleaved,
                                              compute_axis_rope, denoise,
                                              shifted_linear_schedule,
                                              timestep_embedding)
from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    """Qwen-Image 20B-class defaults (transformer.rs:20-60)."""
    dim: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    num_layers: int = 60
    in_channels: int = 64            # 16 VAE ch x 2x2 patch
    txt_dim: int = 3584              # Qwen2.5-VL hidden
    axes_dim: tuple = (16, 56, 56)
    rope_theta: float = 10000.0
    patch_size: int = 2


def _ada_zero(p, temb):
    """AdaLayerNormZero: silu -> linear -> 6 chunks (norm.rs:17-67)."""
    mods = linear(p, jax.nn.silu(temb))
    return jnp.split(mods, 6, -1)


def joint_attention(p: dict, cfg: QwenImageConfig, img, txt, icos, isin,
                    tcos, tsin, txt_mask=None):
    B, Si, _ = img.shape
    St = txt.shape[1]
    H, hd = cfg.num_heads, cfg.head_dim

    def heads(x, S):
        return x.reshape(B, S, H, hd)

    iq = rms_norm(p["norm_q"], heads(linear(p["to_q"], img), Si))
    ik = rms_norm(p["norm_k"], heads(linear(p["to_k"], img), Si))
    iv = heads(linear(p["to_v"], img), Si)
    tq = rms_norm(p["norm_added_q"], heads(linear(p["add_q_proj"], txt), St))
    tk = rms_norm(p["norm_added_k"], heads(linear(p["add_k_proj"], txt), St))
    tv = heads(linear(p["add_v_proj"], txt), St)

    iq = apply_rope_interleaved(iq, icos, isin)
    ik = apply_rope_interleaved(ik, icos, isin)
    tq = apply_rope_interleaved(tq, tcos, tsin)
    tk = apply_rope_interleaved(tk, tcos, tsin)

    q = jnp.concatenate([tq, iq], 1)
    k = jnp.concatenate([tk, ik], 1)
    v = jnp.concatenate([tv, iv], 1)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if txt_mask is not None:
        # padded txt keys are unreachable (reference build_attention_mask,
        # pipeline.rs:236: additive padding mask over the txt segment)
        keymask = jnp.concatenate(
            [txt_mask.astype(jnp.float32),
             jnp.ones((B, Si), jnp.float32)], 1)          # [B, St+Si]
        scores = scores + (keymask[:, None, None, :] - 1.0) * 1e9
    attn = jax.nn.softmax(scores, -1)
    o = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
    o = o.reshape(B, St + Si, H * hd)
    txt_o = linear(p["to_add_out"], o[:, :St])
    img_o = linear(p["to_out"], o[:, St:])
    return img_o, txt_o


def block(p: dict, cfg: QwenImageConfig, img, txt, temb, icos, isin, tcos,
          tsin, txt_mask=None):
    na = {"w": None, "b": None}
    i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2 = _ada_zero(p["img_mod"], temb)
    t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2 = _ada_zero(p["txt_mod"], temb)
    im = layer_norm(na, img) * (1 + i_sc1[:, None]) + i_s1[:, None]
    tm = layer_norm(na, txt) * (1 + t_sc1[:, None]) + t_s1[:, None]
    io, to = joint_attention(p["attn"], cfg, im, tm, icos, isin, tcos, tsin,
                             txt_mask)
    img = img + i_g1[:, None] * io
    txt = txt + t_g1[:, None] * to
    im = layer_norm(na, img) * (1 + i_sc2[:, None]) + i_s2[:, None]
    tm = layer_norm(na, txt) * (1 + t_sc2[:, None]) + t_s2[:, None]
    img = img + i_g2[:, None] * linear(
        p["ff_out"], jax.nn.gelu(linear(p["ff_in"], im), approximate=True))
    txt = txt + t_g2[:, None] * linear(
        p["ff_ctx_out"], jax.nn.gelu(linear(p["ff_ctx_in"], tm),
                                     approximate=True))
    return img, txt


def forward(params: dict, cfg: QwenImageConfig, img, txt, t, icos, isin,
            tcos, tsin, txt_mask=None):
    """img: [B, S_img, in_ch]; txt: [B, S_txt, txt_dim]; t: [B] -> velocity.
    txt_mask: optional [B, S_txt] 1/0 validity (padded prompts)."""
    temb = timestep_embedding(t * 1000.0, 256).astype(img.dtype)
    temb = linear(params["t_mlp2"], jax.nn.silu(linear(params["t_mlp1"], temb)))
    x = linear(params["img_in"], img)
    c = linear(params["txt_in"], rms_norm(params["txt_norm"], txt))
    for bp in params["blocks"]:
        x, c = block(bp, cfg, x, c, temb, icos, isin, tcos, tsin, txt_mask)
    # AdaLayerNormContinuous final (norm.rs:69)
    sc, sh = jnp.split(linear(params["norm_out"], jax.nn.silu(temb)), 2, -1)
    na = {"w": None, "b": None}
    x = layer_norm(na, x) * (1 + sc[:, None]) + sh[:, None]
    return linear(params["proj_out"], x)


def init_params(cfg: QwenImageConfig, key, dtype=jnp.bfloat16) -> dict:
    ks = iter(jax.random.split(key, 24 * cfg.num_layers + 16))
    d, hd = cfg.dim, cfg.head_dim
    ff = 4 * d

    def blk():
        return {
            "img_mod": init_linear(next(ks), d, 6 * d, True, dtype),
            "txt_mod": init_linear(next(ks), d, 6 * d, True, dtype),
            "attn": {
                "to_q": init_linear(next(ks), d, d, True, dtype),
                "to_k": init_linear(next(ks), d, d, True, dtype),
                "to_v": init_linear(next(ks), d, d, True, dtype),
                "add_q_proj": init_linear(next(ks), d, d, True, dtype),
                "add_k_proj": init_linear(next(ks), d, d, True, dtype),
                "add_v_proj": init_linear(next(ks), d, d, True, dtype),
                "to_out": init_linear(next(ks), d, d, True, dtype),
                "to_add_out": init_linear(next(ks), d, d, True, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
                "norm_added_q": jnp.ones((hd,), dtype),
                "norm_added_k": jnp.ones((hd,), dtype),
            },
            "ff_in": init_linear(next(ks), d, ff, True, dtype),
            "ff_out": init_linear(next(ks), ff, d, True, dtype),
            "ff_ctx_in": init_linear(next(ks), d, ff, True, dtype),
            "ff_ctx_out": init_linear(next(ks), ff, d, True, dtype),
        }

    return {
        "t_mlp1": init_linear(next(ks), 256, d, True, dtype),
        "t_mlp2": init_linear(next(ks), d, d, True, dtype),
        "img_in": init_linear(next(ks), cfg.in_channels, d, True, dtype),
        "txt_norm": jnp.ones((cfg.txt_dim,), dtype),
        "txt_in": init_linear(next(ks), cfg.txt_dim, d, True, dtype),
        "blocks": [blk() for _ in range(cfg.num_layers)],
        "norm_out": init_linear(next(ks), d, 2 * d, True, dtype),
        "proj_out": init_linear(next(ks), d, cfg.in_channels, True, dtype),
    }


_RUN_CACHE: dict = {}


def _rope_tables(cfg, B, ph, pw, St):
    yy, xx = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
    img_ids = np.stack([np.zeros_like(yy), yy, xx], -1).reshape(1, -1, 3)
    txt_ids = np.zeros((1, St, 3))
    txt_ids[:, :, 0] = np.arange(St) + 1
    icos, isin = compute_axis_rope(
        jnp.asarray(np.broadcast_to(img_ids, (B, ph * pw, 3)), jnp.float32),
        cfg.axes_dim, cfg.rope_theta)
    tcos, tsin = compute_axis_rope(
        jnp.asarray(np.broadcast_to(txt_ids, (B, St, 3)), jnp.float32),
        cfg.axes_dim, cfg.rope_theta)
    return icos, isin, tcos, tsin


def generate_latents(params: dict, cfg: QwenImageConfig, txt: jax.Array,
                     ph: int, pw: int, num_steps: int = 20,
                     shift: float = 3.0, key=None, txt_mask=None,
                     neg_txt=None, neg_mask=None,
                     cfg_scale: float = 1.0) -> jax.Array:
    """Text embeddings -> denoised packed latents [B, ph*pw, in_ch]
    (pipeline.rs:105; scheduler :17-82).

    With ``neg_txt`` and ``cfg_scale`` > 1 runs classifier-free guidance
    (pipeline.rs:164 generate_cfg) — cond/uncond ride ONE doubled-batch
    forward per step (one MXU pass, not two kernel sweeps)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    B, St = txt.shape[0], txt.shape[1]
    use_cfg = neg_txt is not None and cfg_scale != 1.0
    if txt_mask is None:
        txt_mask = jnp.ones((B, St), jnp.float32)
    if use_cfg:
        assert neg_txt.shape == txt.shape, "pad neg prompt to cond length"
        if neg_mask is None:
            neg_mask = jnp.ones((B, St), jnp.float32)
        txt = jnp.concatenate([txt, neg_txt], 0)
        txt_mask = jnp.concatenate([txt_mask, neg_mask], 0)
    Bf = txt.shape[0]
    icos, isin, tcos, tsin = _rope_tables(cfg, Bf, ph, pw, St)
    z = jax.random.normal(key, (B, ph * pw, cfg.in_channels), jnp.float32)
    ts = shifted_linear_schedule(num_steps, shift)

    # params as jit operands + memoized jit (see flux_klein.py)
    ck = (repr(cfg), B, ph, pw, num_steps, shift, St, str(txt.dtype),
          use_cfg, cfg_scale)
    run = _RUN_CACHE.get(ck)
    if run is None:
        @jax.jit
        def run(params, z, txt, txt_mask):
            def v_fn(zz, t):
                zin = jnp.concatenate([zz, zz], 0) if use_cfg else zz
                v = forward(params, cfg, zin.astype(txt.dtype), txt,
                            jnp.full((Bf,), t), icos, isin, tcos, tsin,
                            txt_mask)
                if use_cfg:
                    v_c, v_u = v[:B], v[B:]
                    v = v_u + cfg_scale * (v_c - v_u)
                return v
            return denoise(v_fn, z, ts)
        _RUN_CACHE[ck] = run

    return run(params, z, txt, txt_mask)


# ---------------------------------------------------- text conditioning -----

# Qwen2.5-VL text stack used as the prompt encoder (reference
# text_encoder.rs:1-4, 28-44: 28 layers, 3584 hidden, GQA 28q/4kv, qkv bias)
def default_text_config():
    from ominix_mlx_tpu.models import base
    return base.TransformerConfig(
        vocab_size=152064, hidden_size=3584, num_layers=28, num_heads=28,
        num_kv_heads=4, intermediate_size=18944, head_dim=128,
        rope_theta=1_000_000.0, rms_norm_eps=1e-6, attention_bias=True,
        tie_word_embeddings=True)


# reference: examples/generate_qwen_image.rs:407 — the VL chat template whose
# 34-token prefix is dropped from the hidden states (constants.rs:17-25)
PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects "
    "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n")
PROMPT_DROP_TOKENS = 34
MAX_TEXT_TOKENS = 77


def encode_prompt(text_params: dict, text_cfg, tokenizer, prompt: str,
                  max_tokens: int = MAX_TEXT_TOKENS):
    """prompt -> (embeddings [1, max_tokens, D], mask [1, max_tokens]).

    Runs the VL encoder over the templated prompt, drops the template
    prefix, and PADS to a fixed length so every prompt hits one compiled
    geometry (pipeline.rs encode path + constants.rs:17-25)."""
    from ominix_mlx_tpu.models import base

    ids = tokenizer.encode(PROMPT_TEMPLATE.format(prompt))
    ids = ids[:PROMPT_DROP_TOKENS + max_tokens]
    hidden = base.encode_hidden(text_params, text_cfg,
                                jnp.asarray([ids], jnp.int32))
    hidden = hidden[:, PROMPT_DROP_TOKENS:]
    n = hidden.shape[1]
    mask = jnp.ones((1, max_tokens), jnp.float32).at[:, n:].set(0.0)
    pad = jnp.zeros((1, max_tokens - n, hidden.shape[-1]), hidden.dtype)
    return jnp.concatenate([hidden, pad], 1), mask


# --------------------------------------------------------------- loading ----

def config_from_hf(d: dict) -> QwenImageConfig:
    """diffusers transformer/config.json -> QwenImageConfig."""
    return QwenImageConfig(
        dim=d.get("num_attention_heads", 24) * d.get("attention_head_dim", 128),
        num_heads=d.get("num_attention_heads", 24),
        head_dim=d.get("attention_head_dim", 128),
        num_layers=d.get("num_layers", 60),
        in_channels=d.get("in_channels", 64),
        txt_dim=d.get("joint_attention_dim", 3584),
        axes_dim=tuple(d.get("axes_dims_rope", (16, 56, 56))))


def params_from_flat(flat: dict, cfg: QwenImageConfig) -> dict:
    """diffusers QwenImageTransformer2DModel names -> param tree.

    Name map (reference TransformerWeightMapper, weights.rs:49-92 — we map
    the ORIGINAL diffusers names): transformer_blocks.{i}.{img_mod.1,
    txt_mod.1, attn.{to_q,to_k,to_v,add_{q,k,v}_proj,to_out.0,to_add_out,
    norm_q,norm_k,norm_added_q,norm_added_k}, img_mlp.net.{0.proj,2},
    txt_mlp.net.{0.proj,2}}; top-level img_in/txt_in/txt_norm/
    time_text_embed.timestep_embedder.linear_{1,2}/norm_out.linear/proj_out.
    """
    def lin(prefix):
        p = {"w": flat[f"{prefix}.weight"]}
        if f"{prefix}.bias" in flat:
            p["b"] = flat[f"{prefix}.bias"]
        return p

    blocks = []
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        blocks.append({
            "img_mod": lin(f"{b}.img_mod.1"),
            "txt_mod": lin(f"{b}.txt_mod.1"),
            "attn": {
                "to_q": lin(f"{b}.attn.to_q"),
                "to_k": lin(f"{b}.attn.to_k"),
                "to_v": lin(f"{b}.attn.to_v"),
                "add_q_proj": lin(f"{b}.attn.add_q_proj"),
                "add_k_proj": lin(f"{b}.attn.add_k_proj"),
                "add_v_proj": lin(f"{b}.attn.add_v_proj"),
                "to_out": lin(f"{b}.attn.to_out.0"),
                "to_add_out": lin(f"{b}.attn.to_add_out"),
                "norm_q": flat[f"{b}.attn.norm_q.weight"],
                "norm_k": flat[f"{b}.attn.norm_k.weight"],
                "norm_added_q": flat[f"{b}.attn.norm_added_q.weight"],
                "norm_added_k": flat[f"{b}.attn.norm_added_k.weight"],
            },
            "ff_in": lin(f"{b}.img_mlp.net.0.proj"),
            "ff_out": lin(f"{b}.img_mlp.net.2"),
            "ff_ctx_in": lin(f"{b}.txt_mlp.net.0.proj"),
            "ff_ctx_out": lin(f"{b}.txt_mlp.net.2"),
        })
    return {
        "t_mlp1": lin("time_text_embed.timestep_embedder.linear_1"),
        "t_mlp2": lin("time_text_embed.timestep_embedder.linear_2"),
        "img_in": lin("img_in"),
        "txt_norm": flat["txt_norm.weight"],
        "txt_in": lin("txt_in"),
        "blocks": blocks,
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }


def flat_from_params(params: dict) -> dict:
    """Inverse of ``params_from_flat`` (canonical save / tests)."""
    flat = {}

    def put(prefix, p):
        flat[f"{prefix}.weight"] = p["w"]
        if p.get("b") is not None:
            flat[f"{prefix}.bias"] = p["b"]

    put("time_text_embed.timestep_embedder.linear_1", params["t_mlp1"])
    put("time_text_embed.timestep_embedder.linear_2", params["t_mlp2"])
    put("img_in", params["img_in"])
    flat["txt_norm.weight"] = params["txt_norm"]
    put("txt_in", params["txt_in"])
    put("norm_out.linear", params["norm_out"])
    put("proj_out", params["proj_out"])
    for i, bp in enumerate(params["blocks"]):
        b = f"transformer_blocks.{i}"
        put(f"{b}.img_mod.1", bp["img_mod"])
        put(f"{b}.txt_mod.1", bp["txt_mod"])
        a = bp["attn"]
        put(f"{b}.attn.to_q", a["to_q"])
        put(f"{b}.attn.to_k", a["to_k"])
        put(f"{b}.attn.to_v", a["to_v"])
        put(f"{b}.attn.add_q_proj", a["add_q_proj"])
        put(f"{b}.attn.add_k_proj", a["add_k_proj"])
        put(f"{b}.attn.add_v_proj", a["add_v_proj"])
        put(f"{b}.attn.to_out.0", a["to_out"])
        put(f"{b}.attn.to_add_out", a["to_add_out"])
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            flat[f"{b}.attn.{nm}.weight"] = a[nm]
        put(f"{b}.img_mlp.net.0.proj", bp["ff_in"])
        put(f"{b}.img_mlp.net.2", bp["ff_out"])
        put(f"{b}.txt_mlp.net.0.proj", bp["ff_ctx_in"])
        put(f"{b}.txt_mlp.net.2", bp["ff_ctx_out"])
    return flat


# ------------------------------------------------------------- pipeline -----

@dataclasses.dataclass
class ImageGenerator:
    """generate(prompt) -> [H, W, 3] in [0,1] — the server's image
    contract (reference pipeline.rs:105 generate / :164 generate_cfg)."""
    params: dict
    cfg: QwenImageConfig
    vae_params: dict
    vae_cfg: object
    text_params: dict = None
    text_cfg: object = None
    tokenizer: object = None

    def encode(self, prompt: str):
        assert self.text_params is not None, "text encoder not loaded"
        return encode_prompt(self.text_params, self.text_cfg,
                             self.tokenizer, prompt)

    def generate(self, prompt: str, height: int = 1024, width: int = 1024,
                 num_steps: int = 20, seed: int = 0,
                 negative_prompt: str = None,
                 cfg_scale: float = 1.0) -> jax.Array:
        from ominix_mlx_tpu.models.dit import vae3d
        from ominix_mlx_tpu.models.flux_klein import unpack_latent

        txt, mask = self.encode(prompt)
        txt = txt.astype(jnp.bfloat16)
        neg, nmask = (None, None)
        if negative_prompt is not None and cfg_scale != 1.0:
            neg, nmask = self.encode(negative_prompt)
            neg = neg.astype(jnp.bfloat16)
        vf = 8 * self.cfg.patch_size          # VAE 8x + 2x2 patchify
        ph, pw = height // vf, width // vf
        z = generate_latents(self.params, self.cfg, txt, ph, pw,
                             num_steps=num_steps,
                             key=jax.random.PRNGKey(seed), txt_mask=mask,
                             neg_txt=neg, neg_mask=nmask,
                             cfg_scale=cfg_scale)
        lat = unpack_latent(z, ph, pw, self.cfg.in_channels // 4,
                            self.cfg.patch_size)
        return vae3d.decode_image(self.vae_params, self.vae_cfg,
                                  lat.astype(jnp.float32))[0]


def load_model(model_dir: str) -> ImageGenerator:
    """Canonical single-dir save: flat names prefixed transformer./vae./
    text_encoder. + config.json {model_type: qwen_image, transformer_config,
    vae_config, text_config} (same convention as flux_klein.load_model;
    reference loads diffusers subdirs, weights.rs:163-196 — utils/convert.py
    collapses those into this layout)."""
    import os

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.models.dit import vae3d
    from ominix_mlx_tpu.utils.loading import load_config, load_safetensors

    raw = load_config(model_dir)
    cfg = config_from_hf(raw.get("transformer_config", {}))
    vcfg = vae3d.VAE3DConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in raw.get("vae_config", {}).items()
        if k in vae3d.VAE3DConfig.__dataclass_fields__})
    flat = load_safetensors(model_dir)
    t_flat = {k[len("transformer."):]: v for k, v in flat.items()
              if k.startswith("transformer.")}
    v_flat = {k[len("vae."):]: v for k, v in flat.items()
              if k.startswith("vae.")}
    e_flat = {k[len("text_encoder."):]: v for k, v in flat.items()
              if k.startswith("text_encoder.")}
    text_cfg = (base.TransformerConfig.from_hf(raw["text_config"])
                if "text_config" in raw else default_text_config())
    from ominix_mlx_tpu.utils.loading import unflatten_params
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return ImageGenerator(
        params=params_from_flat(t_flat, cfg), cfg=cfg,
        vae_params=unflatten_params(v_flat), vae_cfg=vcfg,
        text_params=(base.params_from_flat(e_flat, text_cfg)
                     if e_flat else None),
        text_cfg=text_cfg, tokenizer=tok)
