"""3D-causal-conv VAE (Qwen-Image / video-capable latents).

TPU-native counterpart of reference qwen-image-mlx/src/vae/ (conv3d.rs:
QwenImageCausalConv3D pads only the temporal PAST; blocks/resample/
attention mirror the 2D VAE with 3D kernels). For single images T=1; the
same decoder streams video latents causally.

Layout: [B, T, H, W, C] channels-last (TPU conv native).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.models.dit.vae import group_norm, swish


@dataclasses.dataclass(frozen=True)
class VAE3DConfig:
    ch: int = 96
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    out_ch: int = 3
    temporal_upsample: Sequence[bool] = (False, True, True, False)


def causal_conv3d(p: dict, x: jax.Array, stride=(1, 1, 1)) -> jax.Array:
    """x: [B, T, H, W, C]; p["w"]: [C_out, kT, kH, kW, C_in].

    Temporal padding is causal (past only); spatial is symmetric
    (reference: conv3d.rs apply causal padding)."""
    w = p["w"]
    kt, kh, kw = w.shape[1], w.shape[2], w.shape[3]
    x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                    (kw // 2, kw // 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NTHWC", "OTHWI", "NTHWC"),
        preferred_element_type=x.dtype)
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def group_norm3d(p: dict, x: jax.Array, groups: int = 32) -> jax.Array:
    B, T, H, W, C = x.shape
    y = group_norm(p, x.reshape(B * T, H, W, C), groups)
    return y.reshape(B, T, H, W, C)


def res_block3d(p: dict, x: jax.Array) -> jax.Array:
    h = causal_conv3d(p["conv1"], swish(group_norm3d(p["norm1"], x)))
    h = causal_conv3d(p["conv2"], swish(group_norm3d(p["norm2"], h)))
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x)
    return x + h


def upsample3d(p: dict, x: jax.Array, temporal: bool) -> jax.Array:
    """Nearest-neighbor spatial (and optional temporal) x2 + conv."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if temporal:
        x = jnp.repeat(x, 2, axis=1)
    return causal_conv3d(p["conv"], x)


# Qwen-Image VAE latent statistics (reference: vae.rs:20-28 LATENTS_MEAN /
# LATENTS_STD); the diffusion runs in normalized latent space and the
# decoder expects denormalized latents.
LATENTS_MEAN = (-0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653,
                -0.1517, 1.5508, 0.4134, -0.0715, 0.5517, -0.3632,
                -0.1922, -0.9497, 0.2503, -0.2921)
LATENTS_STD = (2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052,
               2.0743, 3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253,
               2.8251, 1.916)


def denormalize_latent(z: jax.Array) -> jax.Array:
    """Normalized diffusion latent -> decoder space (vae.rs:257), channel
    axis LAST ([..., C], stats sliced to C for reduced test configs)."""
    c = z.shape[-1]
    return z * jnp.asarray(LATENTS_STD[:c], z.dtype) \
        + jnp.asarray(LATENTS_MEAN[:c], z.dtype)


def decode(params: dict, cfg: VAE3DConfig, z: jax.Array) -> jax.Array:
    """z: [B, T, h, w, z_ch] -> video/image [B, T', 8h, 8w, 3]."""
    z = z.astype(params["conv_in"]["w"].dtype)
    if "post_quant_conv" in params:        # 1x1x1 latent conv (vae.rs:264)
        z = causal_conv3d(params["post_quant_conv"], z)
    h = causal_conv3d(params["conv_in"], z)
    h = res_block3d(params["mid"]["block_1"], h)
    h = res_block3d(params["mid"]["block_2"], h)
    for i in reversed(range(len(cfg.ch_mult))):
        for blk in params["up"][i]["block"]:
            h = res_block3d(blk, h)
        if i != 0:
            h = upsample3d(params["up"][i]["upsample"], h,
                           cfg.temporal_upsample[i])
    h = swish(group_norm3d(params["norm_out"], h))
    return causal_conv3d(params["conv_out"], h)


def decode_image(params: dict, cfg: VAE3DConfig, z: jax.Array) -> jax.Array:
    """Single-image path: NORMALIZED latent [B, h, w, 16] -> [B, H, W, 3]
    in [0, 1] (reference decode path vae.rs:264-283 with T=1)."""
    img = decode(params, cfg, denormalize_latent(z)[:, None])[:, 0]
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


def init_decoder(cfg: VAE3DConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 300))

    def c(cin, cout, k=(3, 3, 3)):
        scale = 1.0 / math.sqrt(cin * k[0] * k[1] * k[2])
        return {"w": jax.random.uniform(next(ks), (cout, *k, cin), dtype,
                                        -scale, scale),
                "b": jnp.zeros((cout,), dtype)}

    def n(c_):
        return {"w": jnp.ones((c_,), dtype), "b": jnp.zeros((c_,), dtype)}

    def rb(cin, cout):
        p = {"norm1": n(cin), "conv1": c(cin, cout),
             "norm2": n(cout), "conv2": c(cout, cout)}
        if cin != cout:
            p["shortcut"] = c(cin, cout, (1, 1, 1))
        return p

    block_in = cfg.ch * cfg.ch_mult[-1]
    params = {
        "post_quant_conv": c(cfg.z_channels, cfg.z_channels, (1, 1, 1)),
        "conv_in": c(cfg.z_channels, block_in),
        "mid": {"block_1": rb(block_in, block_in),
                "block_2": rb(block_in, block_in)},
        "up": [],
    }
    for i in reversed(range(len(cfg.ch_mult))):
        out_ch = cfg.ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(rb(block_in, out_ch))
            block_in = out_ch
        lvl = {"block": blocks}
        if i != 0:
            lvl["upsample"] = {"conv": c(block_in, block_in)}
        params["up"].insert(0, lvl)
    params["norm_out"] = n(block_in)
    params["conv_out"] = c(block_in, cfg.out_ch)
    return params
