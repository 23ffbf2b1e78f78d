"""Attention: masks + scaled dot-product attention (GQA-aware).

TPU-native equivalent of the reference's mask builders and SDPA wrapper
(reference: mlx-rs-core/src/utils.rs:134-209 and mlx-rs/src/fast.rs:121).
The reference selects between an explicit mask array and a hardware "Causal"
fast path; here the equivalents are an explicit additive mask (XLA path) and
the Pallas flash-attention kernel (ops/flash_attention.py) which computes
causality inline.

All functions are shape-static and jit-safe: the *capacity* S of the KV
buffer is static, the *valid length* (offset + T) is a traced scalar, and
invalid positions are masked to -inf.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_mask(q_len: int, kv_capacity: int, offset: jax.Array,
                window: Optional[int] = None) -> jax.Array:
    """Additive mask [q_len, kv_capacity] for queries at absolute positions
    offset..offset+q_len over a KV buffer whose slot i holds absolute
    position i (valid when i <= query position).

    Mirrors reference ``create_causal_mask`` (mlx-rs-core/src/utils.rs:134-152)
    with the offset + optional sliding-window semantics.
    """
    off = offset.astype(jnp.int32)
    if off.ndim == 1:           # per-sequence offsets (continuous batching)
        q_pos = (off[:, None, None]
                 + jnp.arange(q_len, dtype=jnp.int32)[None, :, None])
        k_pos = jnp.arange(kv_capacity, dtype=jnp.int32)[None, None, :]
    else:
        q_pos = off + jnp.arange(q_len, dtype=jnp.int32)[:, None]
        k_pos = jnp.arange(kv_capacity, dtype=jnp.int32)[None, :]
    ok = k_pos <= q_pos
    if window is not None:
        ok = ok & (k_pos > q_pos - window)
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         scale: float, mask: Optional[jax.Array] = None,
         logit_softcap: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention with grouped KV heads.

    q: [B, H, T, D]; k, v: [B, Hkv, S, D]; mask: broadcastable to [B, H, T, S]
    (additive, float32). Returns [B, H, T, D].

    Equivalent of reference ``scaled_dot_product_attention``
    (mlx-rs-core/src/utils.rs:188-209). XLA fallback path — fuses well for
    decode; prefill uses the Pallas flash kernel when available.
    """
    B, H, T, D = q.shape
    Hkv = k.shape[1]
    assert H % Hkv == 0, (H, Hkv)
    G = H // Hkv
    qg = q.reshape(B, Hkv, G, T, D)
    logits = jnp.einsum("bhgtd,bhsd->bhgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap
    if mask is not None:
        m = mask
        if m.ndim == 2:
            m = m[None, None, None]
        elif m.ndim == 3:       # [B, T, S] per-sequence mask
            m = m[:, None, None]
        elif m.ndim == 4:  # [B, H, T, S] -> [B, Hkv, G, T, S]
            m = m.reshape(B, Hkv, G, *m.shape[2:]) if m.shape[1] == H else m[:, :, None]
        logits = logits + m
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bhsd->bhgtd", w, v)
    return out.reshape(B, H, T, v.shape[-1])  # v dim may differ from q (MLA)
