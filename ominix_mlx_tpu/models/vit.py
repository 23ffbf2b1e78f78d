"""Generic ViT encoder covering the VLM vision towers.

TPU-native counterpart of reference moxin-vlm-mlx/src/vision.rs (557 LoC):
one parametric ViT with config switches for
  - DINOv2 ViT-L/14: CLS + 4 register tokens, LayerScale (vision.rs:40-50)
  - SigLIP ViT-SO400M/14: no CLS, no registers (vision.rs:57-66)
Patch embedding is a stride-P conv (NHWC), pre-norm blocks, GELU MLP.
Returns patch tokens (CLS/registers stripped) for the projector.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv2d, init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    has_cls_token: bool = True
    num_registers: int = 0
    layer_scale: bool = False
    eps: float = 1e-6

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


DINOV2_LARGE = ViTConfig(has_cls_token=True, num_registers=4,
                         layer_scale=True)
SIGLIP_SO400M = ViTConfig(hidden_size=1152, num_layers=27, num_heads=16,
                          mlp_dim=4304, has_cls_token=False, num_registers=0)


def vit_block(p: dict, cfg: ViTConfig, x: jax.Array) -> jax.Array:
    B, T, D = x.shape
    H = cfg.num_heads
    hd = D // H
    h = layer_norm(p["norm1"], x, cfg.eps)
    q = linear(p["q"], h).reshape(B, T, H, hd)
    k = linear(p["k"], h).reshape(B, T, H, hd)
    v = linear(p["v"], h).reshape(B, T, H, hd)
    attn = jax.nn.softmax(
        jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v).reshape(B, T, D)
    o = linear(p["proj"], o)
    if "ls1" in p:
        o = o * p["ls1"]
    x = x + o
    h = layer_norm(p["norm2"], x, cfg.eps)
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h)))
    if "ls2" in p:
        h = h * p["ls2"]
    return x + h


def encode(params: dict, cfg: ViTConfig, images: jax.Array) -> jax.Array:
    """images: [B, H, W, 3] (normalized) -> patch tokens [B, N, D]."""
    x = conv2d(params["patch_embed"], images, stride=cfg.patch_size)
    B, gh, gw, D = x.shape
    x = x.reshape(B, gh * gw, D)
    pos = params["pos_embed"]
    if pos.shape[1] == x.shape[1]:
        x = x + pos                           # pos before CLS (SigLIP)
        prefix = []
        if cfg.has_cls_token:
            prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, D)))
    else:
        prefix = []
        if cfg.has_cls_token:
            prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, D)))
            x = jnp.concatenate(prefix + [x], 1) + pos
            prefix = []
    if prefix:
        x = jnp.concatenate(prefix + [x], 1)
    if cfg.num_registers:
        regs = jnp.broadcast_to(params["register_tokens"],
                                (B, cfg.num_registers, D))
        x = jnp.concatenate([x[:, :1], regs, x[:, 1:]] if cfg.has_cls_token
                            else [regs, x], 1)
    for p in params["blocks"]:
        x = vit_block(p, cfg, x)
    x = layer_norm(params["norm"], x, cfg.eps)
    skip = (1 if cfg.has_cls_token else 0) + cfg.num_registers
    return x[:, skip:]


def init_params(cfg: ViTConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_layers + 8))
    D = cfg.hidden_size
    n = lambda: {"w": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}

    def blk():
        p = {
            "norm1": n(), "norm2": n(),
            "q": init_linear(next(ks), D, D, True, dtype),
            "k": init_linear(next(ks), D, D, True, dtype),
            "v": init_linear(next(ks), D, D, True, dtype),
            "proj": init_linear(next(ks), D, D, True, dtype),
            "fc1": init_linear(next(ks), D, cfg.mlp_dim, True, dtype),
            "fc2": init_linear(next(ks), cfg.mlp_dim, D, True, dtype),
        }
        if cfg.layer_scale:
            p["ls1"] = jnp.full((D,), 1e-5, dtype)
            p["ls2"] = jnp.full((D,), 1e-5, dtype)
        return p

    P = cfg.patch_size
    npos = cfg.num_patches + (1 if cfg.has_cls_token else 0)
    params = {
        "patch_embed": {
            "w": jax.random.normal(next(ks), (D, P, P, 3), dtype) * 0.02,
            "b": jnp.zeros((D,), dtype)},
        "pos_embed": jax.random.normal(next(ks), (1, npos, D), dtype) * 0.02,
        "blocks": [blk() for _ in range(cfg.num_layers)],
        "norm": n(),
    }
    if cfg.has_cls_token:
        params["cls_token"] = jnp.zeros((1, 1, D), dtype)
    if cfg.num_registers:
        params["register_tokens"] = jnp.zeros((1, cfg.num_registers, D), dtype)
    return params
