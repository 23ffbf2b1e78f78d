"""FLUX.2-klein: 4-step distilled flow-matching DiT (5 double + 20 single
stream blocks, 4-axis RoPE, shared adaLN modulation).

TPU-native counterpart of reference crate flux-klein-mlx:
  - SharedModulation adaLN (klein_model.rs:217-255)
  - KleinDoubleBlock: separate q/k/v per stream, QK-RMSNorm, joint attention
    over concat [txt, img] K/V, SwiGLU MLP (klein_model.rs:280-545)
  - KleinSingleBlock: fused [q,k,v,mlp_gate,mlp_up] projection, parallel
    attention+MLP, fused output (klein_model.rs:547-684)
  - 4-axis RoPE [32,32,32,32], theta 2000 (klein_model.rs:786-797)
  - SNR-shifted 4-step schedule + Euler loop (examples/generate_klein.rs)
  - 2x2 latent patchify over the 32-channel FLUX.2 VAE

TPU design: the full denoise loop (all steps) is one jitted lax.scan; RoPE
tables are computed once; batch=1 1024px -> img_seq 4096 tokens, pure
MXU-bound.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models.dit import vae as vae_mod
from ominix_mlx_tpu.models.dit.common import (apply_rope_interleaved,
                                              compute_axis_rope, denoise,
                                              flux_schedule, modulate,
                                              timestep_embedding)
from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class FluxKleinConfig:
    """Defaults: klein_model.rs:183-196."""
    in_channels: int = 128          # 32 VAE ch x 2x2 patch
    hidden_size: int = 3072
    txt_embed_dim: int = 7680
    num_heads: int = 24
    depth: int = 5
    depth_single: int = 20
    head_dim: int = 128
    mlp_hidden: int = 9216
    axes_dim: tuple = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    patch_size: int = 2


# ------------------------------------------------------------- init ---------

def _mod_p(key, hidden, n, dtype):
    return init_linear(key, hidden, n * hidden, False, dtype)


def init_params(cfg: FluxKleinConfig, key, dtype=jnp.bfloat16) -> dict:
    ks = iter(jax.random.split(key, 40 + 20 * (cfg.depth + cfg.depth_single)))
    h, hd = cfg.hidden_size, cfg.head_dim
    norm_la = lambda: {"w": None, "b": None}  # LayerNorm without affine

    def double_block():
        return {
            "img_norm1": norm_la(), "img_norm2": norm_la(),
            "txt_norm1": norm_la(), "txt_norm2": norm_la(),
            "img_to_q": init_linear(next(ks), h, h, False, dtype),
            "img_to_k": init_linear(next(ks), h, h, False, dtype),
            "img_to_v": init_linear(next(ks), h, h, False, dtype),
            "img_norm_q": jnp.ones((hd,), dtype),
            "img_norm_k": jnp.ones((hd,), dtype),
            "img_to_out": init_linear(next(ks), h, h, False, dtype),
            "txt_to_q": init_linear(next(ks), h, h, False, dtype),
            "txt_to_k": init_linear(next(ks), h, h, False, dtype),
            "txt_to_v": init_linear(next(ks), h, h, False, dtype),
            "txt_norm_q": jnp.ones((hd,), dtype),
            "txt_norm_k": jnp.ones((hd,), dtype),
            "txt_to_out": init_linear(next(ks), h, h, False, dtype),
            "img_mlp_in": init_linear(next(ks), h, 2 * cfg.mlp_hidden, False, dtype),
            "img_mlp_out": init_linear(next(ks), cfg.mlp_hidden, h, False, dtype),
            "txt_mlp_in": init_linear(next(ks), h, 2 * cfg.mlp_hidden, False, dtype),
            "txt_mlp_out": init_linear(next(ks), cfg.mlp_hidden, h, False, dtype),
        }

    def single_block():
        return {
            "norm": norm_la(),
            "to_qkv_mlp": init_linear(next(ks), h,
                                      3 * h + 2 * cfg.mlp_hidden, False, dtype),
            "norm_q": jnp.ones((hd,), dtype),
            "norm_k": jnp.ones((hd,), dtype),
            "to_out": init_linear(next(ks), h + cfg.mlp_hidden, h, False, dtype),
        }

    return {
        "x_embedder": init_linear(next(ks), cfg.in_channels, h, False, dtype),
        "context_embedder": init_linear(next(ks), cfg.txt_embed_dim, h, False, dtype),
        "txt_norm": jnp.ones((h,), dtype),
        "time_embed_1": init_linear(next(ks), 256, h, False, dtype),
        "time_embed_2": init_linear(next(ks), h, h, False, dtype),
        "double_mod_img": _mod_p(next(ks), h, 6, dtype),
        "double_mod_txt": _mod_p(next(ks), h, 6, dtype),
        "single_mod": _mod_p(next(ks), h, 3, dtype),
        "double_blocks": [double_block() for _ in range(cfg.depth)],
        "single_blocks": [single_block() for _ in range(cfg.depth_single)],
        "final_norm": jnp.ones((h,), dtype),
        "norm_out": init_linear(next(ks), h, 2 * h, False, dtype),
        "proj_out": init_linear(next(ks), h, cfg.in_channels, False, dtype),
    }


# ---------------------------------------------------------- forward ---------

def _heads(x, B, S, H, hd):
    return x.reshape(B, S, H, hd)


def _attend(q, k, v, hd):
    """q: [B,S_q,H,hd]; k/v: [B,S_kv,H,hd] -> [B,S_q,H*hd]."""
    B, Sq = q.shape[0], q.shape[1]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, -1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(B, Sq, -1)


def double_block(bp: dict, cfg: FluxKleinConfig, img, txt, img_mod, txt_mod,
                 cos, sin):
    B, Si, _ = img.shape
    St = txt.shape[1]
    H, hd = cfg.num_heads, cfg.head_dim
    im = modulate(layer_norm(bp["img_norm1"], img), img_mod[0], img_mod[1])
    tm = modulate(layer_norm(bp["txt_norm1"], txt), txt_mod[0], txt_mod[1])

    iq = rms_norm(bp["img_norm_q"], _heads(linear(bp["img_to_q"], im), B, Si, H, hd))
    ik = rms_norm(bp["img_norm_k"], _heads(linear(bp["img_to_k"], im), B, Si, H, hd))
    iv = _heads(linear(bp["img_to_v"], im), B, Si, H, hd)
    tq = rms_norm(bp["txt_norm_q"], _heads(linear(bp["txt_to_q"], tm), B, St, H, hd))
    tk = rms_norm(bp["txt_norm_k"], _heads(linear(bp["txt_to_k"], tm), B, St, H, hd))
    tv = _heads(linear(bp["txt_to_v"], tm), B, St, H, hd)

    tcos, tsin = cos[:, :St], sin[:, :St]
    icos, isin = cos[:, St:], sin[:, St:]
    iq = apply_rope_interleaved(iq, icos, isin)
    ik = apply_rope_interleaved(ik, icos, isin)
    tq = apply_rope_interleaved(tq, tcos, tsin)
    tk = apply_rope_interleaved(tk, tcos, tsin)

    K = jnp.concatenate([tk, ik], axis=1)
    V = jnp.concatenate([tv, iv], axis=1)
    img = img + img_mod[2][:, None] * linear(bp["img_to_out"], _attend(iq, K, V, hd))
    txt = txt + txt_mod[2][:, None] * linear(bp["txt_to_out"], _attend(tq, K, V, hd))

    im2 = modulate(layer_norm(bp["img_norm2"], img), img_mod[3], img_mod[4])
    tm2 = modulate(layer_norm(bp["txt_norm2"], txt), txt_mod[3], txt_mod[4])
    # mlp_in packs [up, gate]: out = silu(gate) * up (klein_model.rs:511-522)
    iu, ig = jnp.split(linear(bp["img_mlp_in"], im2), 2, -1)
    tu, tg = jnp.split(linear(bp["txt_mlp_in"], tm2), 2, -1)
    img = img + img_mod[5][:, None] * linear(bp["img_mlp_out"], jax.nn.silu(ig) * iu)
    txt = txt + txt_mod[5][:, None] * linear(bp["txt_mlp_out"], jax.nn.silu(tg) * tu)
    return img, txt


def single_block(bp: dict, cfg: FluxKleinConfig, x, mod, cos, sin):
    B, S, h = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    xm = modulate(layer_norm(bp["norm"], x), mod[0], mod[1])
    proj = linear(bp["to_qkv_mlp"], xm)
    q, k, v, mg, mu = jnp.split(
        proj, [h, 2 * h, 3 * h, 3 * h + cfg.mlp_hidden], -1)
    q = apply_rope_interleaved(rms_norm(bp["norm_q"], _heads(q, B, S, H, hd)), cos, sin)
    k = apply_rope_interleaved(rms_norm(bp["norm_k"], _heads(k, B, S, H, hd)), cos, sin)
    attn = _attend(q, k, _heads(v, B, S, H, hd), hd)
    mlp = jax.nn.silu(mg) * mu
    out = linear(bp["to_out"], jnp.concatenate([attn, mlp], -1))
    return x + mod[2][:, None] * out


def forward(params: dict, cfg: FluxKleinConfig, img: jax.Array,
            txt: jax.Array, t: jax.Array, cos: jax.Array,
            sin: jax.Array) -> jax.Array:
    """img: [B, S_img, in_ch] packed latents; txt: [B, S_txt, txt_dim];
    t: [B] (x1000 scale); -> velocity [B, S_img, in_ch].
    (reference: forward_with_rope, klein_model.rs:799-858)."""
    St = txt.shape[1]
    x = linear(params["x_embedder"], img)
    c = rms_norm(params["txt_norm"], linear(params["context_embedder"], txt))
    vec = linear(params["time_embed_2"], jax.nn.silu(
        linear(params["time_embed_1"],
               timestep_embedding(t, 256).astype(x.dtype))))

    def mods(p, n):
        return jnp.split(linear(p, jax.nn.silu(vec)), n, -1)

    img_mod = mods(params["double_mod_img"], 6)
    txt_mod = mods(params["double_mod_txt"], 6)
    smod = mods(params["single_mod"], 3)

    for bp in params["double_blocks"]:
        x, c = double_block(bp, cfg, x, c, img_mod, txt_mod, cos, sin)
    z = jnp.concatenate([c, x], axis=1)
    for bp in params["single_blocks"]:
        z = single_block(bp, cfg, z, smod, cos, sin)
    x = z[:, St:]

    ada = linear(params["norm_out"], jax.nn.silu(vec))
    scale, shift = jnp.split(ada, 2, -1)
    x = modulate(rms_norm(params["final_norm"], x), shift, scale)
    return linear(params["proj_out"], x)


# ----------------------------------------------------------- pipeline -------

def make_ids(batch: int, ph: int, pw: int, txt_len: int):
    """4-axis position ids (reference: generate_klein.rs:519-556)."""
    yy, xx = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
    img_ids = np.stack([np.zeros_like(yy), yy, xx, np.zeros_like(yy)],
                       -1).reshape(1, ph * pw, 4)
    txt_ids = np.zeros((1, txt_len, 4))
    txt_ids[:, :, 3] = np.arange(txt_len)
    img_ids = np.broadcast_to(img_ids, (batch, ph * pw, 4))
    txt_ids = np.broadcast_to(txt_ids, (batch, txt_len, 4))
    return jnp.asarray(txt_ids, jnp.float32), jnp.asarray(img_ids, jnp.float32)


def pack_latent(z: jax.Array, patch: int = 2) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), C*p*p] (generate_klein.rs:461-466
    inverse order: channel-major within patch)."""
    B, H, W, C = z.shape
    ph, pw = H // patch, W // patch
    z = z.reshape(B, ph, patch, pw, patch, C)
    z = z.transpose(0, 1, 3, 5, 2, 4)       # [B, ph, pw, C, p, p]
    return z.reshape(B, ph * pw, C * patch * patch)


def unpack_latent(z: jax.Array, ph: int, pw: int, c: int,
                  patch: int = 2) -> jax.Array:
    B = z.shape[0]
    z = z.reshape(B, ph, pw, c, patch, patch)
    z = z.transpose(0, 1, 4, 2, 5, 3)       # [B, ph, p, pw, p, C]
    return z.reshape(B, ph * patch, pw * patch, c)


_RUN_CACHE: dict = {}


def generate_image(params: dict, cfg: FluxKleinConfig, vae_params: dict,
                   vae_cfg, txt_embed: jax.Array, height: int = 1024,
                   width: int = 1024, num_steps: int = 4,
                   key=None) -> jax.Array:
    """txt_embed: [B, S_txt, txt_dim] (Qwen3 encoder output) -> image
    [B, H, W, 3] in [0, 1]. The full denoise loop is one jitted scan."""
    if key is None:
        key = jax.random.PRNGKey(0)
    B = txt_embed.shape[0]
    vae_factor = 2 ** (len(vae_cfg.ch_mult) - 1)   # 8 for the 4-level VAE
    lh, lw = height // vae_factor, width // vae_factor
    ph, pw = lh // cfg.patch_size, lw // cfg.patch_size
    seq = ph * pw
    txt_ids, img_ids = make_ids(B, ph, pw, txt_embed.shape[1])
    cos, sin = compute_axis_rope(jnp.concatenate([txt_ids, img_ids], 1),
                                 cfg.axes_dim, cfg.rope_theta)
    z = jax.random.normal(key, (B, seq, cfg.in_channels), jnp.float32)
    ts = flux_schedule(seq, num_steps)

    # params ride as jit OPERANDS (closure capture would bake weights in as
    # constants) and the jitted fn is MEMOIZED per config+geometry: a fresh
    # closure per call would re-trace the 4B-param graph every image
    ck = (repr(cfg), repr(vae_cfg), B, ph, pw, num_steps,
          txt_embed.shape[1], str(txt_embed.dtype))
    run = _RUN_CACHE.get(ck)
    if run is None:
        @jax.jit
        def run(params, vae_params, z, txt_embed, cos, sin):
            def v_fn(z, t):
                return forward(params, cfg, z.astype(txt_embed.dtype),
                               txt_embed, jnp.full((B,), t * 1000.0),
                               cos, sin)
            z = denoise(v_fn, z, ts)
            lat = unpack_latent(z, ph, pw, cfg.in_channels // 4,
                                cfg.patch_size)
            img = vae_mod.decode(vae_params, vae_cfg,
                                 lat.astype(jnp.float32))
            return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
        _RUN_CACHE[ck] = run

    return run(params, vae_params, z, txt_embed, cos, sin)


# --------------------------------------------------------- server adapter ---

@dataclasses.dataclass
class ImageGenerator:
    """generate(prompt) -> [H, W, 3] float image in [0,1] (the reference's
    examples/generate_klein.rs pipeline as a server-callable object)."""
    params: dict
    cfg: FluxKleinConfig
    vae_params: dict
    vae_cfg: object
    text_params: Optional[dict] = None
    text_cfg: Optional[object] = None
    tokenizer: Optional[object] = None
    txt_proj: Optional[dict] = None     # optional text-dim projection

    def encode_prompt(self, prompt: str) -> jax.Array:
        from ominix_mlx_tpu.models import base
        from ominix_mlx_tpu.nn.layers import linear
        assert self.text_params is not None, "text encoder not loaded"
        ids = (self.tokenizer.encode(prompt) if self.tokenizer
               else [ord(c) % 256 for c in prompt])
        emb = base.encode_hidden(self.text_params, self.text_cfg,
                                 jnp.asarray([ids], jnp.int32))
        if self.txt_proj is not None:
            emb = linear(self.txt_proj, emb)
        return emb

    def generate(self, prompt: str, height: int = 1024, width: int = 1024,
                 num_steps: int = 4, seed: int = 0) -> jax.Array:
        txt = self.encode_prompt(prompt).astype(jnp.bfloat16)
        img = generate_image(self.params, self.cfg, self.vae_params,
                             self.vae_cfg, txt, height, width, num_steps,
                             key=jax.random.PRNGKey(seed))
        return img[0]


def load_model(model_dir: str) -> ImageGenerator:
    """Canonical save format: transformer.* / vae.* / text_encoder.*."""
    import os

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.models.dit import vae as vae_mod2
    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              unflatten_params)

    raw = load_config(model_dir)
    cfg = FluxKleinConfig(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in raw.get("transformer_config",
                                                 {}).items()
                             if k in FluxKleinConfig.__dataclass_fields__})
    vcfg = vae_mod2.VAEConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in raw.get("vae_config", {}).items()
        if k in vae_mod2.VAEConfig.__dataclass_fields__})
    tree = unflatten_params(load_safetensors(model_dir))
    text_cfg = (base.TransformerConfig.from_hf(raw["text_config"])
                if "text_config" in raw else None)
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return ImageGenerator(
        params=tree["transformer"], cfg=cfg, vae_params=tree["vae"],
        vae_cfg=vcfg, text_params=tree.get("text_encoder"),
        text_cfg=text_cfg, tokenizer=tok, txt_proj=tree.get("txt_proj"))
