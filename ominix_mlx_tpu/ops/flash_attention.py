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
import os

import jax
import jax.numpy as jnp

MIN_FLASH_LEN = 128          # below this the XLA path wins (kernel overhead)
_SUPPORTED = None


def _block_sizes(Tq: int, S: int):
    """v5e-tuned tile sizes (the library default is 128 everywhere, left
    as a TODO heuristic upstream). Env-overridable for sweeps
    (benchmarks/flash_block_probe.py): OMINIX_FLASH_BQ / _BKM / _BK."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    # v5e sweep (flash_block_probe.py, round 5): bq=256 bkm=512 beats the
    # library's 128/128 by 1.46x (fresh 8k causal: 63.9 vs 93.2 ms) to
    # 1.68x (32k GQA-folded prefix chunk: 65.1 vs 109.5 ms); larger tiles
    # regress (512/1024+) and 2048-row q tiles fail to compile (VMEM).
    bq = min(int(os.environ.get("OMINIX_FLASH_BQ", "256")), Tq)
    bkm = min(int(os.environ.get("OMINIX_FLASH_BKM", "512")), S)
    while Tq % bq:
        bq //= 2
    while S % bkm:
        bkm //= 2
    bk = min(int(os.environ.get("OMINIX_FLASH_BK", str(bkm))), bkm)
    while bkm % bk:
        bk //= 2
    return BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)


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
        flash_attention)

    B, H, T, D = q.shape
    return flash_attention(q * scale, k, v, causal=True, sm_scale=1.0,
                           block_sizes=_block_sizes(T, T))


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


# --------------------- continuation chunks (long-prompt chunked prefill) ----
#
# A continuation chunk's queries (global positions pos..pos+T-1) attend the
# whole written prefix 0..pos plus the chunk itself causally. The XLA dense
# path materializes f32 [H, T, pos+T] scores — at 8k context that is >2GB
# per layer and XLA starts spilling with compressed copies (measured v5e:
# the softmax fusion degrades from 4.7ms at S=4096 to 188ms at S=8192 —
# 91% of the whole prefill). Flash never materializes scores. The stock
# kernel's causal flag is top-left aligned (q i <-> kv i), which is wrong
# for a shifted chunk, so: TWO flash calls — prefix (unmasked) + chunk
# (causal, equal lengths) — merged exactly in the LSE domain.


def _merge_partials(o1, l1, m1, o2, l2, m2):
    """Merge two softmax-normalized partial attentions over disjoint key
    sets (flash residual convention: o normalized, l = sum exp(s-m), m =
    row max; l/m broadcast along a trailing lane axis)."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    denom = a1 + a2
    w1 = (a1 / denom)[..., :1]
    w2 = (a2 / denom)[..., :1]
    return o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2


@functools.partial(jax.jit, static_argnames=("scale", "pos"))
def _flash_chunk(q, k, v, scale: float, pos: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        _flash_attention_impl)

    B, H, T, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    qs = (q * scale).astype(q.dtype)

    def call(qseg, kseg, vseg, causal):
        S = kseg.shape[2]
        Tq = qseg.shape[2]
        bs = _block_sizes(Tq, S)
        return _flash_attention_impl(
            qseg, kseg, vseg, None, None, True, causal, 1.0,
            bs.block_b, bs.block_q, bs.block_k_major, bs.block_k, False)

    # Prefix (non-causal): fold the GQA group into the QUERY axis instead
    # of repeating K/V — a materialized [B, H, pos, D] repeat is hundreds
    # of MB of pure HBM traffic per layer per chunk at 32k context, and
    # unmasked attention is invariant to the query-row order. Head h = j*G+g
    # lands at folded row g*T+t of kv head j.
    qf = qs.reshape(B, Hkv, G * T, D)
    o1, l1, m1 = call(qf, k[:, :, :pos], v[:, :, :pos], False)
    o1 = o1.reshape(B, H, T, D)
    l1 = l1.reshape(B, H, T)
    m1 = m1.reshape(B, H, T)
    # Chunk (causal, equal lengths): repeat only the chunk's K/V (small)
    kc, vc = k[:, :, pos:pos + T], v[:, :, pos:pos + T]
    if G > 1:
        kc = jnp.repeat(kc, G, axis=1)
        vc = jnp.repeat(vc, G, axis=1)
    o2, l2, m2 = call(qs, kc, vc, True)
    # impl strips the lane axis: l/m are [B, H, T] -> restore for the merge
    return _merge_partials(o1, l1[..., None], m1[..., None],
                           o2, l2[..., None], m2[..., None]).astype(q.dtype)


def flash_chunk_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                        pos: int, scale: float) -> jax.Array:
    """Attention for a continuation chunk of a long prefill.

    q: [B, H, T, D] at global positions pos..pos+T-1; k/v: [B, Hkv, pos+T, D]
    (the written cache prefix INCLUDING this chunk's keys). pos is static."""
    return _flash_chunk(q, k.astype(q.dtype), v.astype(q.dtype), scale, pos)


def use_flash_chunk(T: int, pos: int, head_dim: int) -> bool:
    return (supported() and pos > 0 and pos % 128 == 0
            and T >= MIN_FLASH_LEN and T % 128 == 0
            and head_dim in (64, 128, 256))
