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
                    tcos, tsin):
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
    attn = jax.nn.softmax(
        jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
    o = o.reshape(B, St + Si, H * hd)
    txt_o = linear(p["to_add_out"], o[:, :St])
    img_o = linear(p["to_out"], o[:, St:])
    return img_o, txt_o


def block(p: dict, cfg: QwenImageConfig, img, txt, temb, icos, isin, tcos,
          tsin):
    na = {"w": None, "b": None}
    i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2 = _ada_zero(p["img_mod"], temb)
    t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2 = _ada_zero(p["txt_mod"], temb)
    im = layer_norm(na, img) * (1 + i_sc1[:, None]) + i_s1[:, None]
    tm = layer_norm(na, txt) * (1 + t_sc1[:, None]) + t_s1[:, None]
    io, to = joint_attention(p["attn"], cfg, im, tm, icos, isin, tcos, tsin)
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
            tcos, tsin):
    """img: [B, S_img, in_ch]; txt: [B, S_txt, txt_dim]; t: [B] -> velocity."""
    temb = timestep_embedding(t * 1000.0, 256).astype(img.dtype)
    temb = linear(params["t_mlp2"], jax.nn.silu(linear(params["t_mlp1"], temb)))
    x = linear(params["img_in"], img)
    c = linear(params["txt_in"], rms_norm(params["txt_norm"], txt))
    for bp in params["blocks"]:
        x, c = block(bp, cfg, x, c, temb, icos, isin, tcos, tsin)
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


def generate_latents(params: dict, cfg: QwenImageConfig, txt: jax.Array,
                     ph: int, pw: int, num_steps: int = 20,
                     shift: float = 3.0, key=None) -> jax.Array:
    """Text embeddings -> denoised packed latents [B, ph*pw, in_ch]
    (pipeline.rs:105; scheduler :17-82)."""
    from ominix_mlx_tpu.models.flux_klein import make_ids

    if key is None:
        key = jax.random.PRNGKey(0)
    B = txt.shape[0]
    yy, xx = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
    img_ids = np.stack([np.zeros_like(yy), yy, xx], -1).reshape(1, -1, 3)
    txt_ids = np.zeros((1, txt.shape[1], 3))
    txt_ids[:, :, 0] = np.arange(txt.shape[1]) + 1
    icos, isin = compute_axis_rope(
        jnp.asarray(np.broadcast_to(img_ids, (B, ph * pw, 3)), jnp.float32),
        cfg.axes_dim, cfg.rope_theta)
    tcos, tsin = compute_axis_rope(
        jnp.asarray(np.broadcast_to(txt_ids, (B, txt.shape[1], 3)),
                    jnp.float32), cfg.axes_dim, cfg.rope_theta)
    z = jax.random.normal(key, (B, ph * pw, cfg.in_channels), jnp.float32)
    ts = shifted_linear_schedule(num_steps, shift)

    # params as jit operands + memoized jit (see flux_klein.py)
    ck = (repr(cfg), B, ph, pw, num_steps, shift, txt.shape[1],
          str(txt.dtype))
    run = _RUN_CACHE.get(ck)
    if run is None:
        @jax.jit
        def run(params, z, txt):
            def v_fn(zz, t):
                return forward(params, cfg, zz.astype(txt.dtype), txt,
                               jnp.full((B,), t), icos, isin, tcos, tsin)
            return denoise(v_fn, z, ts)
        _RUN_CACHE[ck] = run

    return run(params, z, txt)
