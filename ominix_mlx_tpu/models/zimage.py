"""Z-Image (turbo): Lumina-style single-stream DiT with noise/context
refiners, 3-axis RoPE, 9-step turbo flow matching.

TPU-native counterpart of reference crate zimage-mlx (zimage_model.rs):
  - 3-axis RoPE over (t, h, w) coordinate grids, theta 256, axes [32,48,48],
    even/odd split rotation (zimage_model.rs:103-244)
  - sandwich-norm blocks: x + tanh(gate) * norm2(attn(norm1(x)*(1+scale)))
    with 4-way adaLN from a 256-d time embedding (:462-585)
  - noise refiner (modulated) on image tokens, context refiner
    (unmodulated) on caption tokens, then joint blocks on the concat (:760+)
  - reuses the FLUX.2 VAE (reference: zimage-mlx/src/lib.rs:75)
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models.dit import vae as vae_mod
from ominix_mlx_tpu.models.dit.common import (denoise,
                                              shifted_linear_schedule,
                                              timestep_embedding)
from ominix_mlx_tpu.nn.layers import init_linear, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class ZImageConfig:
    """Defaults: Z-Image Turbo (zimage_model.rs:60-77)."""
    dim: int = 3840
    n_heads: int = 30
    n_layers: int = 30
    n_refiner_layers: int = 2
    in_channels: int = 16
    cap_feat_dim: int = 2560
    axes_dims: tuple = (32, 48, 48)
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    norm_eps: float = 1e-5
    patch_size: int = 2
    t_embed_dim: int = 256

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def mlp_hidden(self):
        return int(self.dim / 3.0 * 8.0)

    @property
    def patch_channels(self):
        return self.in_channels * self.patch_size ** 2


# --------------------------------------------------------------- rope -------

def coordinate_grid(size, start=(0, 0, 0)) -> np.ndarray:
    """[d0*d1*d2, 3] coordinates (zimage_model.rs:103-124)."""
    d0, d1, d2 = size
    g = np.stack(np.meshgrid(np.arange(d0) + start[0],
                             np.arange(d1) + start[1],
                             np.arange(d2) + start[2], indexing="ij"), -1)
    return g.reshape(-1, 3).astype(np.float32)


def rope_3axis(positions: jax.Array, axes_dims, theta: float):
    """positions [B, S, 3] -> (cos, sin) [B, S, 1, sum(dims)/2]
    (no duplication; even/odd split rotation)."""
    outs = []
    for axis, dim in enumerate(axes_dims):
        half = dim // 2
        inv = jnp.asarray(np.exp(-math.log(theta) * np.arange(half) / half),
                          jnp.float32)
        ang = positions[..., axis].astype(jnp.float32)[..., None, None] \
            * inv[None, None, None, :]                    # [B, S, 1, half]
        outs.append(ang)
    args = jnp.concatenate(outs, -1)
    return jnp.cos(args), jnp.sin(args)


def apply_rope_3axis(x: jax.Array, cos: jax.Array, sin: jax.Array):
    """x: [B, S, H, D]; even/odd split (zimage_model.rs:208-242)."""
    shape = x.shape
    xp = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    o0 = x1 * cos - x2 * sin
    o1 = x1 * sin + x2 * cos
    return jnp.stack([o0, o1], -1).reshape(shape).astype(x.dtype)


# ------------------------------------------------------------- blocks -------

def attention(p: dict, cfg: ZImageConfig, x, cos, sin):
    B, S, _ = x.shape
    H, hd = cfg.n_heads, cfg.head_dim
    q = linear(p["wq"], x).reshape(B, S, H, hd)
    k = linear(p["wk"], x).reshape(B, S, H, hd)
    v = linear(p["wv"], x).reshape(B, S, H, hd)
    q = rms_norm(p["q_norm"], q, cfg.norm_eps)
    k = rms_norm(p["k_norm"], k, cfg.norm_eps)
    q = apply_rope_3axis(q, cos, sin)
    k = apply_rope_3axis(k, cos, sin)
    attn = jax.nn.softmax(
        jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
    return linear(p["wo"], o.reshape(B, S, H * hd))


def ffn(p: dict, x):
    return linear(p["w2"], jax.nn.silu(linear(p["w1"], x)) * linear(p["w3"], x))


def block(p: dict, cfg: ZImageConfig, x, cos, sin, temb=None):
    """Sandwich-norm block with optional 4-way adaLN
    (zimage_model.rs:522-585)."""
    if temb is not None:
        mods = jnp.split(linear(p["ada_ln"], temb), 4, -1)
        s_msa, g_msa, s_mlp, g_mlp = [m[:, None] for m in mods]
        h = rms_norm(p["attention_norm1"], x, cfg.norm_eps) * (1 + s_msa)
        a = attention(p["attention"], cfg, h, cos, sin)
        x = x + jnp.tanh(g_msa) * rms_norm(p["attention_norm2"], a, cfg.norm_eps)
        h = rms_norm(p["ffn_norm1"], x, cfg.norm_eps) * (1 + s_mlp)
        f = ffn(p["feed_forward"], h)
        return x + jnp.tanh(g_mlp) * rms_norm(p["ffn_norm2"], f, cfg.norm_eps)
    h = rms_norm(p["attention_norm1"], x, cfg.norm_eps)
    x = x + rms_norm(p["attention_norm2"],
                     attention(p["attention"], cfg, h, cos, sin), cfg.norm_eps)
    h = rms_norm(p["ffn_norm1"], x, cfg.norm_eps)
    return x + rms_norm(p["ffn_norm2"], ffn(p["feed_forward"], h), cfg.norm_eps)


def forward(params: dict, cfg: ZImageConfig, x: jax.Array, t: jax.Array,
            cap: jax.Array, x_pos: jax.Array, cap_pos: jax.Array):
    """x: [B, S_img, patch_ch]; cap: [B, S_cap, cap_feat_dim]; t: [B].
    Returns velocity [B, S_img, patch_ch] (zimage_model.rs:760-825)."""
    Sx = x.shape[1]
    temb = timestep_embedding(t * cfg.t_scale, cfg.t_embed_dim).astype(x.dtype)
    temb = linear(params["t_mlp2"], jax.nn.silu(linear(params["t_mlp1"], temb)))
    x = linear(params["x_embedder"], x)
    cap = linear(params["cap_linear"],
                 rms_norm(params["cap_norm"], cap, cfg.norm_eps))
    xcos, xsin = rope_3axis(x_pos, cfg.axes_dims, cfg.rope_theta)
    ccos, csin = rope_3axis(cap_pos, cfg.axes_dims, cfg.rope_theta)
    for bp in params["noise_refiner"]:
        x = block(bp, cfg, x, xcos, xsin, temb)
    for bp in params["context_refiner"]:
        cap = block(bp, cfg, cap, ccos, csin)
    u = jnp.concatenate([x, cap], 1)
    ucos = jnp.concatenate([xcos, ccos], 1)
    usin = jnp.concatenate([xsin, csin], 1)
    for bp in params["layers"]:
        u = block(bp, cfg, u, ucos, usin, temb)
    img = u[:, :Sx]
    # final adaLN layer
    sc, sh = jnp.split(linear(params["final_ada"], jax.nn.silu(temb)), 2, -1)
    img = rms_norm(params["final_norm"], img, cfg.norm_eps) \
        * (1 + sc[:, None]) + sh[:, None]
    return linear(params["final_linear"], img)


# ---------------------------------------------------------------- init ------

def init_params(cfg: ZImageConfig, key, dtype=jnp.bfloat16) -> dict:
    ks = iter(jax.random.split(key, 30 * (cfg.n_layers
                                          + 2 * cfg.n_refiner_layers) + 20))
    d, hd = cfg.dim, cfg.head_dim

    def blk(mod: bool):
        p = {
            "attention": {
                "wq": init_linear(next(ks), d, d, False, dtype),
                "wk": init_linear(next(ks), d, d, False, dtype),
                "wv": init_linear(next(ks), d, d, False, dtype),
                "wo": init_linear(next(ks), d, d, False, dtype),
                "q_norm": jnp.ones((hd,), dtype),
                "k_norm": jnp.ones((hd,), dtype),
            },
            "feed_forward": {
                "w1": init_linear(next(ks), d, cfg.mlp_hidden, False, dtype),
                "w2": init_linear(next(ks), cfg.mlp_hidden, d, False, dtype),
                "w3": init_linear(next(ks), d, cfg.mlp_hidden, False, dtype),
            },
            "attention_norm1": jnp.ones((d,), dtype),
            "attention_norm2": jnp.ones((d,), dtype),
            "ffn_norm1": jnp.ones((d,), dtype),
            "ffn_norm2": jnp.ones((d,), dtype),
        }
        if mod:
            p["ada_ln"] = init_linear(next(ks), cfg.t_embed_dim, 4 * d, True, dtype)
        return p

    return {
        "t_mlp1": init_linear(next(ks), cfg.t_embed_dim, 1024, True, dtype),
        "t_mlp2": init_linear(next(ks), 1024, cfg.t_embed_dim, True, dtype),
        "x_embedder": init_linear(next(ks), cfg.patch_channels, d, True, dtype),
        "cap_norm": jnp.ones((cfg.cap_feat_dim,), dtype),
        "cap_linear": init_linear(next(ks), cfg.cap_feat_dim, d, True, dtype),
        "noise_refiner": [blk(True) for _ in range(cfg.n_refiner_layers)],
        "context_refiner": [blk(False) for _ in range(cfg.n_refiner_layers)],
        "layers": [blk(True) for _ in range(cfg.n_layers)],
        "final_ada": init_linear(next(ks), cfg.t_embed_dim, 2 * d, True, dtype),
        "final_norm": jnp.ones((d,), dtype),
        "final_linear": init_linear(next(ks), d, cfg.patch_channels, True, dtype),
    }


# ------------------------------------------------------------- pipeline -----

_RUN_CACHE: dict = {}


def generate_image(params: dict, cfg: ZImageConfig, vae_params: dict,
                   vae_cfg, cap_feats: jax.Array, height: int = 1024,
                   width: int = 1024, num_steps: int = 9, shift: float = 3.0,
                   key=None) -> jax.Array:
    """9-step turbo flow matching + FLUX VAE decode (reference:
    examples/generate_zimage.rs:7-8,64+). Returns [B, H, W, 3] in [0,1]."""
    from ominix_mlx_tpu.models.flux_klein import pack_latent, unpack_latent

    if key is None:
        key = jax.random.PRNGKey(0)
    B = cap_feats.shape[0]
    vf = 2 ** (len(vae_cfg.ch_mult) - 1)
    lh, lw = height // vf, width // vf
    ph, pw = lh // cfg.patch_size, lw // cfg.patch_size
    x_pos = jnp.asarray(np.broadcast_to(
        coordinate_grid((1, ph, pw)), (B, ph * pw, 3)))
    S_cap = cap_feats.shape[1]
    cap_pos = jnp.asarray(np.broadcast_to(
        coordinate_grid((S_cap, 1, 1), start=(1, 0, 0)), (B, S_cap, 3)))
    z = jax.random.normal(key, (B, ph * pw, cfg.patch_channels), jnp.float32)
    ts = shifted_linear_schedule(num_steps, shift)

    # params as jit operands + memoized jit (see flux_klein.py)
    ck = (repr(cfg), repr(vae_cfg), B, ph, pw, num_steps,
          cap_feats.shape[1], str(cap_feats.dtype))
    run = _RUN_CACHE.get(ck)
    if run is None:
        @jax.jit
        def run(params, vae_params, z, cap_feats):
            def v_fn(zz, t):
                return forward(params, cfg, zz.astype(cap_feats.dtype),
                               jnp.full((B,), t), cap_feats, x_pos, cap_pos)
            z = denoise(v_fn, z, ts)
            lat = unpack_latent(z, ph, pw, cfg.in_channels, cfg.patch_size)
            img = vae_mod.decode(vae_params, vae_cfg,
                                 lat.astype(jnp.float32))
            return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
        _RUN_CACHE[ck] = run

    return run(params, vae_params, z, cap_feats)
