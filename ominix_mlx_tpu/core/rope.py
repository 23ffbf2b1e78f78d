"""Rotary position embeddings.

TPU-native equivalent of the reference's ``initialize_rope`` (reference:
mlx-rs-core/src/utils.rs:52-97) and ``mlx_fast_rope`` (mlx-rs/src/fast.rs:15).
Supports:
  - default RoPE with configurable ``theta``
  - linear scaling from HF ``rope_scaling = {type: linear, factor}``
  - partial rotary dims (GLM4 ``rotary_factor`` -> rope over head_dim/2,
    reference: glm4-mlx/src/model.rs:116-133)
  - "traditional" (interleaved-pair) vs HF half-split conventions

Under jit, positions are traced values; frequencies are computed inline (they
are tiny) and XLA constant-folds/fuses them into the surrounding elementwise
ops, so no host-side cache table is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    dims: int                      # number of rotated dims (<= head_dim)
    theta: float = 10000.0
    scale: float = 1.0             # linear scaling: position * 1/factor
    traditional: bool = False      # True: interleaved pairs; False: half-split


def make_rope(head_dim: int, theta: float = 10000.0,
              rope_scaling: Optional[dict] = None,
              partial_rotary_factor: float = 1.0,
              traditional: bool = False) -> RopeConfig:
    """Mirror of reference ``initialize_rope`` config resolution
    (mlx-rs-core/src/utils.rs:52-97)."""
    dims = int(head_dim * partial_rotary_factor)
    scale = 1.0
    if rope_scaling:
        rtype = rope_scaling.get("type") or rope_scaling.get("rope_type")
        if rtype == "linear":
            scale = 1.0 / float(rope_scaling["factor"])
        elif rtype in (None, "default"):
            pass
        # yarn / llama3 etc. can be added per-model as needed
    return RopeConfig(dims=dims, theta=theta, scale=scale, traditional=traditional)


def _angles(positions: jax.Array, dims: int, theta: float, scale: float):
    # positions: [...] int; returns cos/sin of shape [..., dims//2]
    half = dims // 2
    freqs = jnp.exp(
        -jnp.arange(0, half, dtype=jnp.float32) * (jnp.log(theta) / half)
    )  # [half]
    ang = positions.astype(jnp.float32)[..., None] * scale * freqs  # [..., half]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, positions: jax.Array, cfg: RopeConfig) -> jax.Array:
    """Apply RoPE.

    x: [..., T, head_dim]; positions: [T] or [..., T] absolute positions.
    Only the first ``cfg.dims`` dims are rotated (partial RoPE passthrough).
    """
    dims = cfg.dims
    orig_dtype = x.dtype
    rot, rest = x[..., :dims], x[..., dims:]
    cos, sin = _angles(positions, dims, cfg.theta, cfg.scale)  # [..., T, half]
    # broadcast cos/sin over the leading dims of x. positions [T] prepends
    # all missing axes; positions [B, T] (per-sequence offsets, continuous
    # batching) keeps B on axis 0 and broadcasts over the head axes between
    if positions.ndim == 2 and rot.ndim >= 3:
        while cos.ndim < rot.ndim:
            cos = cos[:, None]
            sin = sin[:, None]
    else:
        while cos.ndim < rot.ndim:
            cos = cos[None]
            sin = sin[None]
    rot = rot.astype(jnp.float32)
    if cfg.traditional:
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    else:
        half = dims // 2
        x1 = rot[..., :half]
        x2 = rot[..., half:]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.concatenate([r1, r2], axis=-1)
    out = out.astype(orig_dtype)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest.astype(orig_dtype)], axis=-1)
    return out
