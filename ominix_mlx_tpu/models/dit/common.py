"""Shared DiT toolkit: timestep embedding, adaLN modulate, N-axis RoPE,
flow-matching schedules/steps.

TPU-native counterparts of the reference's diffusion machinery:
  - sinusoidal timestep embedding + adaLN ``(1 + scale) * norm(x) + shift``
    (the reference's fused_modulate Metal kernel,
    mlx-rs-core/src/metal_kernels.rs:263 — on TPU XLA fuses this chain)
  - multi-axis RoPE over position-id grids (flux-klein klein_model.rs:53-124,
    zimage 3-axis variant zimage_model.rs:103-244, qwen-image QwenEmbedRope)
  - FLUX empirical-mu SNR-shifted schedule (flux.c-derived constants,
    flux-klein examples/generate_klein.rs:558-601)
  - FlowMatchEulerScheduler with shift (qwen-image pipeline.rs:17-82)

The whole denoise loop is jittable: schedules are precomputed arrays and the
Euler step is ``z += dt * v`` inside lax.scan.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(t: jax.Array, dim: int, theta: float = 10000.0,
                       time_factor: float = 1.0) -> jax.Array:
    """t: [B] (continuous) -> [B, dim] sinusoidal embedding."""
    t = t.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(theta) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation: (1 + scale) * x + shift (broadcast over seq)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def compute_axis_rope(ids: jax.Array, axes_dim: Sequence[int],
                      theta: float) -> tuple:
    """ids: [B, S, n_axes] position grid -> (cos, sin) [B, S, sum(axes_dim)]
    with each angle duplicated for interleaved complex pairs
    (reference: compute_rope_freqs, klein_model.rs:53-118)."""
    B, S, _ = ids.shape
    coss, sins = [], []
    for axis, dim in enumerate(axes_dim):
        half = dim // 2
        inv = 1.0 / (theta ** (2.0 * np.arange(half) / dim))
        ang = ids[..., axis].astype(jnp.float32)[..., None] * jnp.asarray(
            inv, jnp.float32)                                  # [B, S, half]
        cos = jnp.stack([jnp.cos(ang), jnp.cos(ang)], -1).reshape(B, S, dim)
        sin = jnp.stack([jnp.sin(ang), jnp.sin(ang)], -1).reshape(B, S, dim)
        coss.append(cos)
        sins.append(sin)
    return jnp.concatenate(coss, -1), jnp.concatenate(sins, -1)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array,
                           sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [B, S, D] duplicated-pair layout.
    out[2i] = x[2i] cos - x[2i+1] sin; out[2i+1] = x[2i+1] cos + x[2i] sin
    (reference: apply_rope, klein_model.rs:124-168)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c0 = c[..., 0::2]
    s0 = s[..., 0::2]
    r0 = x0 * c0 - x1 * s0
    r1 = x1 * c0 + x0 * s0
    return jnp.stack([r0, r1], -1).reshape(x.shape).astype(dtype)


# -------------------------------------------------------- schedules ---------

def flux_empirical_mu(image_seq_len: int, num_steps: int) -> float:
    """flux.c empirical mu (reference: generate_klein.rs:558-575)."""
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return a2 * image_seq_len + b2
    m200 = a2 * image_seq_len + b2
    m10 = a1 * image_seq_len + b1
    a = (m200 - m10) / 190.0
    b = m200 - 200.0 * a
    return a * num_steps + b


def snr_shift(t: np.ndarray, mu: float, sigma: float = 1.0) -> np.ndarray:
    """Generalized time SNR shift (reference: generate_klein.rs:577-586)."""
    t = np.clip(t, 1e-9, 1.0)
    return np.where(
        t >= 1.0, 1.0,
        math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma))


def flux_schedule(image_seq_len: int, num_steps: int) -> np.ndarray:
    """SNR-shifted timesteps [num_steps + 1], 1 -> 0
    (reference: flux_official_schedule, generate_klein.rs:589-601)."""
    mu = flux_empirical_mu(image_seq_len, num_steps)
    lin = 1.0 - np.arange(num_steps + 1) / num_steps
    return snr_shift(lin, mu).astype(np.float32)


def shifted_linear_schedule(num_steps: int, shift: float = 3.0) -> np.ndarray:
    """FlowMatchEuler sigmas with static shift: s' = shift*s/(1+(shift-1)s)
    (reference: qwen-image pipeline.rs:17-55). [num_steps + 1], 1 -> 0."""
    s = 1.0 - np.arange(num_steps + 1) / num_steps
    out = shift * s / (1.0 + (shift - 1.0) * s)
    out[-1] = 0.0
    return out.astype(np.float32)


def denoise(v_fn, z0: jax.Array, timesteps: np.ndarray) -> jax.Array:
    """Euler flow-matching loop inside lax.scan: z += (t_next - t) * v.

    v_fn(z, t_scalar) -> velocity; timesteps: [steps+1] descending.
    """
    ts = jnp.asarray(timesteps[:-1])
    dts = jnp.asarray(np.diff(timesteps))

    def step(z, td):
        t, dt = td
        v = v_fn(z, t)
        return z + dt * v.astype(z.dtype), None

    z, _ = jax.lax.scan(step, z0, (ts, dts))
    return z
