"""InfLLMv2 block-sparse attention (MiniCPM-SALA long-context layers).

TPU-native counterpart of reference minicpm-sala-mlx/src/attention/
sparse.rs:115-300: mean-pooled compressed keys over the "middle" region,
per-KV-head top-k block selection, then attention over
[init blocks + selected blocks + sliding window].

TPU redesign (SURVEY.md hard part (c)): the reference builds gather indices
on the CPU per (batch, head) with dynamic lengths; here everything is ONE
static-shape program:
  - compressed scores are computed over the full cache capacity and blocks
    outside the valid middle region are masked to -inf before top-k
  - the gathered K/V set has static length init + topk*ks + window; invalid
    slots (middle shorter than topk blocks, window underflow) are masked in
    the attention, so the same jitted decode graph is exact dense attention
    for short contexts and InfLLMv2 beyond — no recompiles, no lax.cond.
This replaces the reference's dense_len=8192 hard switch: for mid-length
contexts the selected blocks + window already cover nearly everything.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
from ominix_mlx_tpu.core.cache import KVCache


@dataclasses.dataclass(frozen=True)
class SparseConfig:
    """Reference: config.rs sparse fields (kernel_size=32 stride etc. per
    production config; defaults from tests/test_model.rs)."""
    kernel_size: int = 32          # compression block size (tokens)
    block_size: int = 64           # init block granularity
    init_blocks: int = 1
    window_size: int = 2048
    topk: int = 64
    dense_len: int = 8192


def compress_keys(keys: jax.Array, ks: int) -> jax.Array:
    """Mean-pool non-overlapping windows: [B,H,S,D] -> [B,H,S//ks,D]
    (reference: sparse.rs:115-138)."""
    B, H, S, D = keys.shape
    nb = S // ks
    return keys[:, :, :nb * ks].reshape(B, H, nb, ks, D).mean(axis=3)


def sparse_decode_attention(q: jax.Array, cache: KVCache, offset: jax.Array,
                            scfg: SparseConfig, scale: float) -> jax.Array:
    """q: [B, H, 1, D] single decode step over the full-history cache.

    Static gathered length = init_end + topk*ks + window_size.
    """
    B, H, _, D = q.shape
    Hkv = cache.k.shape[1]
    S = cache.max_len
    ks = scfg.kernel_size
    nb = S // ks
    total = offset + 1                       # length incl. current token
    init_end = scfg.init_blocks * scfg.block_size
    window_start = jnp.maximum(total - scfg.window_size, init_end)

    # --- score compressed middle blocks -----------------------------------
    comp = compress_keys(cache.k, ks)                       # [B,Hkv,nb,D]
    n_rep = H // Hkv
    q_score = q.reshape(B, Hkv, n_rep, 1, D)[:, :, 0]       # [B,Hkv,1,D]
    scores = jnp.einsum("bhqd,bhnd->bhqn", q_score.astype(jnp.float32),
                        comp.astype(jnp.float32))           # [B,Hkv,1,nb]
    blk_start = jnp.arange(nb, dtype=jnp.int32) * ks
    blk_valid = (blk_start >= init_end) & (blk_start + ks <= window_start)
    scores = jnp.where(blk_valid[None, None, None], scores, NEG_INF)

    topk = min(scfg.topk, nb)
    top_scores, top_idx = jax.lax.top_k(scores[:, :, 0], topk)  # [B,Hkv,topk]
    sel_valid = top_scores > NEG_INF / 2                        # [B,Hkv,topk]

    # --- build gathered index set (static length) --------------------------
    init_idx = jnp.arange(init_end, dtype=jnp.int32)
    init_idx = jnp.broadcast_to(init_idx, (B, Hkv, init_end))
    blk_tok = (top_idx[..., None] * ks
               + jnp.arange(ks, dtype=jnp.int32)).reshape(B, Hkv, topk * ks)
    # window positions: the last window_size tokens before `total`
    win_pos = total - scfg.window_size + jnp.arange(scfg.window_size,
                                                    dtype=jnp.int32)
    win_valid = win_pos >= window_start
    win_idx = jnp.broadcast_to(jnp.clip(win_pos, 0, S - 1), (B, Hkv, scfg.window_size))

    gather_idx = jnp.concatenate([init_idx, blk_tok, win_idx], -1)  # [B,Hkv,G]
    G = gather_idx.shape[-1]

    # slot validity mask
    init_valid = jnp.broadcast_to(
        jnp.arange(init_end, dtype=jnp.int32)[None, None] < total,
        (B, Hkv, init_end))
    blk_slot_valid = jnp.repeat(sel_valid, ks, axis=-1)
    win_slot_valid = jnp.broadcast_to(win_valid[None, None],
                                      (B, Hkv, scfg.window_size))
    valid = jnp.concatenate([init_valid, blk_slot_valid, win_slot_valid], -1)

    gk = jnp.take_along_axis(cache.k, gather_idx[..., None], axis=2)
    gv = jnp.take_along_axis(cache.v, gather_idx[..., None], axis=2)

    mask = jnp.where(valid, 0.0, NEG_INF)[:, :, None].astype(jnp.float32)
    return sdpa(q, gk, gv, scale=scale, mask=mask)
