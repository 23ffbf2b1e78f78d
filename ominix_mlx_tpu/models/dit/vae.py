"""SD-style 2D VAE (encoder/decoder) used by FLUX.2-klein and Z-Image.

TPU-native counterpart of flux-klein-mlx/src/autoencoder.rs (654 LoC):
GroupNorm(32)+swish ResnetBlocks, single-head mid attention, nearest-neighbor
upsampling, ch_mult pyramid, scale/shift latent factors. Z-Image reuses the
same module (reference: zimage-mlx/src/lib.rs:75 reuses flux-klein's VAE).

Layout: NHWC throughout (TPU conv-native).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv2d, init_linear


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Defaults: FLUX.2 (autoencoder.rs:64-75)."""
    resolution: int = 1024
    in_channels: int = 3
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 32
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159


def group_norm(params: dict, x: jax.Array, groups: int = 32,
               eps: float = 1e-6) -> jax.Array:
    """x: [B, H, W, C] channels-last group norm."""
    B, H, W, C = x.shape
    groups = math.gcd(groups, C)
    xg = x.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(B, H, W, C).astype(x.dtype)
    return x * params["w"] + params["b"]


def _conv_p(key, cin, cout, k=3, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * k * k)
    return {"w": jax.random.uniform(key, (cout, k, k, cin), dtype, -s, s),
            "b": jnp.zeros((cout,), dtype)}


def _norm_p(c, dtype=jnp.float32):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def swish(x):
    return jax.nn.silu(x)


def resnet_block(p: dict, x: jax.Array) -> jax.Array:
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)), padding=1)
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)), padding=1)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def init_resnet_block(key, cin, cout, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _norm_p(cin, dtype), "conv1": _conv_p(k1, cin, cout, 3, dtype),
         "norm2": _norm_p(cout, dtype), "conv2": _conv_p(k2, cout, cout, 3, dtype)}
    if cin != cout:
        p["nin_shortcut"] = _conv_p(k3, cin, cout, 1, dtype)
    return p


def attn_block(p: dict, x: jax.Array) -> jax.Array:
    """Single-head spatial self-attention (autoencoder.rs:166-235)."""
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x)
    q = conv2d(p["q"], h).reshape(B, H * W, C)
    k = conv2d(p["k"], h).reshape(B, H * W, C)
    v = conv2d(p["v"], h).reshape(B, H * W, C)
    attn = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(C), -1)
    o = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v).reshape(B, H, W, C)
    return x + conv2d(p["proj_out"], o)


def init_attn_block(key, c, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    return {"norm": _norm_p(c, dtype),
            "q": _conv_p(ks[0], c, c, 1, dtype), "k": _conv_p(ks[1], c, c, 1, dtype),
            "v": _conv_p(ks[2], c, c, 1, dtype),
            "proj_out": _conv_p(ks[3], c, c, 1, dtype)}


def upsample(p: dict, x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p["conv"], x, padding=1)


def downsample(p: dict, x: jax.Array) -> jax.Array:
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding=0)


# ----------------------------------------------------------- decoder --------

def init_decoder(cfg: VAEConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 200))
    nres = len(cfg.ch_mult)
    block_in = cfg.ch * cfg.ch_mult[-1]
    p = {
        "conv_in": _conv_p(next(ks), cfg.z_channels, block_in, 3, dtype),
        "mid": {
            "block_1": init_resnet_block(next(ks), block_in, block_in, dtype),
            "attn_1": init_attn_block(next(ks), block_in, dtype),
            "block_2": init_resnet_block(next(ks), block_in, block_in, dtype),
        },
        "up": [],
    }
    for i in reversed(range(nres)):
        out_ch = cfg.ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(init_resnet_block(next(ks), block_in, out_ch, dtype))
            block_in = out_ch
        lvl = {"block": blocks}
        if i != 0:
            lvl["upsample"] = {"conv": _conv_p(next(ks), block_in, block_in, 3, dtype)}
        p["up"].insert(0, lvl)
    p["norm_out"] = _norm_p(block_in, dtype)
    p["conv_out"] = _conv_p(next(ks), block_in, cfg.out_ch, 3, dtype)
    return p


def decode(p: dict, cfg: VAEConfig, z: jax.Array) -> jax.Array:
    """z: [B, h, w, z_channels] -> image [B, 8h, 8w, 3] in [-1, 1]."""
    # run in the VAE's own dtype (convs require matching operand dtypes)
    z = z.astype(p["conv_in"]["w"].dtype)
    z = z / cfg.scale_factor + cfg.shift_factor
    h = conv2d(p["conv_in"], z, padding=1)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i in reversed(range(len(cfg.ch_mult))):
        for blk in p["up"][i]["block"]:
            h = resnet_block(blk, h)
        if i != 0:
            h = upsample(p["up"][i]["upsample"], h)
    h = swish(group_norm(p["norm_out"], h))
    return conv2d(p["conv_out"], h, padding=1)


# ----------------------------------------------------------- encoder --------

def init_encoder(cfg: VAEConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 200))
    p = {"conv_in": _conv_p(next(ks), cfg.in_channels, cfg.ch, 3, dtype),
         "down": []}
    block_in = cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        out_ch = cfg.ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(init_resnet_block(next(ks), block_in, out_ch, dtype))
            block_in = out_ch
        lvl = {"block": blocks}
        if i != len(cfg.ch_mult) - 1:
            lvl["downsample"] = {"conv": _conv_p(next(ks), block_in, block_in, 3, dtype)}
        p["down"].append(lvl)
    p["mid"] = {
        "block_1": init_resnet_block(next(ks), block_in, block_in, dtype),
        "attn_1": init_attn_block(next(ks), block_in, dtype),
        "block_2": init_resnet_block(next(ks), block_in, block_in, dtype),
    }
    p["norm_out"] = _norm_p(block_in, dtype)
    p["conv_out"] = _conv_p(next(ks), block_in, 2 * cfg.z_channels, 3, dtype)
    return p


def encode(p: dict, cfg: VAEConfig, x: jax.Array,
           key=None) -> jax.Array:
    """image [B, H, W, 3] in [-1,1] -> latent [B, H/8, W/8, z] (mode if no key)."""
    h = conv2d(p["conv_in"], x, padding=1)
    for i in range(len(cfg.ch_mult)):
        for blk in p["down"][i]["block"]:
            h = resnet_block(blk, h)
        if "downsample" in p["down"][i]:
            h = downsample(p["down"][i]["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = swish(group_norm(p["norm_out"], h))
    moments = conv2d(p["conv_out"], h, padding=1)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is not None:
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
            jax.random.normal(key, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scale_factor
