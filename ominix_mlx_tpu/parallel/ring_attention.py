"""Ring attention: context/sequence-parallel exact attention over the ICI
ring.

No reference counterpart (SURVEY.md §5.7: the reference scales long context
single-device via sparse/GLA algorithms; context parallelism over chips is
the TPU-native addition). Design: the sequence is sharded over an "sp" mesh
axis; each step every device computes attention of its local queries against
the K/V block it currently holds, then rotates the block around the ring
with ``jax.lax.ppermute`` while merging partial results with the running
log-sum-exp (flash-attention-style numerically stable combine). Wall-clock
overlaps compute with the ICI transfer; memory per chip is O(T/n).

Use via shard_map:

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", causal=True),
        mesh=mesh, in_specs=P(None, None, "sp", None),
        out_specs=P(None, None, "sp", None))(q, k, v)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_attn(q, k, v, scale, mask):
    """Partial attention returning (weighted values, running max, lse-ish).

    q: [B, Hq, Tq, D]; k/v: [B, Hkv, Tk, D] with Hq a multiple of Hkv
    (GQA: query-head groups share a KV head — the repeat happens in the
    einsum indexing, never materialized). mask additive [Tq, Tk] or None.
    Returns un-normalized out [B,Hq,Tq,Dv], row max m [B,Hq,Tq], row sum s.
    """
    B, Hq, Tq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Tq, D)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask[None, None, None]
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    s = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v)
    Dv = v.shape[-1]
    return (out.reshape(B, Hq, Tq, Dv).astype(jnp.float32),
            m.reshape(B, Hq, Tq), s.reshape(B, Hq, Tq))


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, causal: bool = True,
                   scale: float | None = None,
                   window: int = 0) -> jax.Array:
    """Per-shard bodies under shard_map. q/k/v: [B, H, T_local, D].

    window > 0: sliding-window causal attention (query at global position
    p attends keys in [p-window+1, p]) — the Mistral mask under context
    parallelism. Exact: out-of-window key blocks contribute -inf rows that
    the LSE merge zeroes."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, T, D = q.shape
    Dv = v.shape[-1]
    if scale is None:
        scale = D ** -0.5
    qf = q.astype(jnp.float32)

    q_pos = idx * T + jnp.arange(T, dtype=jnp.int32)

    def step(carry, s):
        k_blk, v_blk, out, m, sm = carry
        src = (idx - s) % n                       # whose block we hold
        if causal:
            k_pos = src * T + jnp.arange(T, dtype=jnp.int32)
            keep = k_pos[None, :] <= q_pos[:, None]
            if window:
                keep &= k_pos[None, :] > q_pos[:, None] - window
            mask = jnp.where(keep, 0.0, NEG_INF)
        else:
            mask = None
        o_b, m_b, s_b = _block_attn(qf, k_blk.astype(jnp.float32),
                                    v_blk, scale, mask)
        m_new = jnp.maximum(m, m_b)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(m_b - m_new)
        out = out * c_old[..., None] + o_b * c_new[..., None]
        sm = sm * c_old + s_b * c_new
        # rotate k/v to the next neighbor (bidirectional ICI: one hop/step)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, out, m_new, sm), None

    init = (k, v,
            jnp.zeros((B, H, T, Dv), jnp.float32),
            jnp.full((B, H, T), NEG_INF, jnp.float32),
            jnp.zeros((B, H, T), jnp.float32))
    (k, v, out, m, sm), _ = jax.lax.scan(step, init,
                                         jnp.arange(n, dtype=jnp.int32))
    return (out / jnp.maximum(sm, 1e-30)[..., None]).astype(q.dtype)


def make_ring_attention(mesh, axis: str = "sp", causal: bool = True,
                        window: int = 0):
    """Convenience shard_map wrapper: full arrays in, full arrays out."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis, None)
    return shard_map(
        functools.partial(ring_attention, axis_name=axis, causal=causal,
                          window=window),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
