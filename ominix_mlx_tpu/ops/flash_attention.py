"""Flash attention for prefill — wraps JAX's Pallas TPU flash kernel.

TPU-native counterpart of the reference's hardware ``Causal`` SDPA fast path
(mlx-rs/src/fast.rs:121, selected by create_attention_mask
mlx-rs-core/src/utils.rs:155-185). On TPU the equivalent fused kernel is
jax.experimental.pallas.ops.tpu.flash_attention; decode (T=1) stays on the
XLA path where the einsum against the cache is already bandwidth-optimal.

GQA is handled by repeating KV heads (the kernel wants matching head
counts); at prefill sizes the extra KV read is negligible next to the
O(T^2) compute this kernel saves from never materializing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MIN_FLASH_LEN = 128          # below this the XLA path wins (kernel overhead)
_SUPPORTED = None


def supported() -> bool:
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            from jax.experimental.pallas.ops.tpu import flash_attention  # noqa
            _SUPPORTED = jax.default_backend() == "tpu"
        except ImportError:
            _SUPPORTED = False
    return _SUPPORTED


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash(q, k, v, scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    B, H, T, D = q.shape
    bs = BlockSizes.get_default(batch_size=B, num_heads=H, q_seq_len=T,
                                kv_len=T, d_model=D)
    return flash_attention(q * scale, k, v, causal=True, sm_scale=1.0,
                           block_sizes=bs)


def flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: float) -> jax.Array:
    """Causal self-attention over the fresh prompt tokens.

    q: [B, H, T, D]; k/v: [B, Hkv, T, D]. Valid only when the cache was
    empty before this call (query i attends keys 0..i)."""
    B, H, T, D = q.shape
    Hkv = k.shape[1]
    if H != Hkv:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    return _flash(q.astype(jnp.bfloat16) if q.dtype == jnp.bfloat16 else q,
                  k.astype(q.dtype), v.astype(q.dtype), scale)


def use_flash(T: int, head_dim: int) -> bool:
    return (supported() and T >= MIN_FLASH_LEN and T % 128 == 0
            and head_dim in (64, 128, 256))
