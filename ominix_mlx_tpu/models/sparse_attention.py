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


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseKVCache:
    """Full-history KV cache that maintains the mean-pooled compressed keys
    INCREMENTALLY on append (reference compresses on append too,
    sparse.rs:115-138) — re-pooling the whole [B,H,S,D] history per decode
    step would be O(S) reads per layer, the very cost sparse attention
    exists to avoid. Only the block(s) touched by the appended tokens are
    re-pooled: O(kernel_size) per decode step, independent of context."""

    k: jax.Array     # [B, Hkv, S, D]
    v: jax.Array     # [B, Hkv, S, D]
    comp: jax.Array  # [B, Hkv, S // ks, D] mean-pooled keys
    kernel_size: int = dataclasses.field(metadata=dict(static=True),
                                         default=32)

    @staticmethod
    def init(batch: int, n_kv: int, max_len: int, head_dim: int,
             dtype=jnp.bfloat16, kernel_size: int = 32) -> "SparseKVCache":
        shape = (batch, n_kv, max_len, head_dim)
        nb = max_len // kernel_size
        return SparseKVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            comp=jnp.zeros((batch, n_kv, nb, head_dim), dtype),
            kernel_size=kernel_size)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update(self, k_new: jax.Array, v_new: jax.Array, offset: jax.Array):
        """Write [B,Hkv,T,D] at ``offset`` (scalar or per-row [B]); re-pool
        only the touched blocks.

        Blocks containing garbage beyond the valid length are re-pooled
        again as later tokens land in them, and the block-validity mask in
        sparse_decode_attention hides them until then."""
        ks = self.kernel_size
        B, Hkv, T, D = k_new.shape
        z = jnp.zeros((), jnp.int32)
        off = offset.astype(jnp.int32)
        nb = self.comp.shape[2]
        # static touched-block bound: T tokens starting anywhere inside a
        # block span at most ceil((T-1)/ks) + 1 blocks
        nblk = min((T + ks - 2) // ks + 1, nb)
        if off.ndim == 0:
            k = jax.lax.dynamic_update_slice(
                self.k, k_new.astype(self.k.dtype), (z, z, off, z))
            v = jax.lax.dynamic_update_slice(
                self.v, v_new.astype(self.v.dtype), (z, z, off, z))
            first = jnp.minimum(off // ks, nb - nblk)
            region = jax.lax.dynamic_slice(
                k, (z, z, first * ks, z), (B, Hkv, nblk * ks, D))
            pooled = region.reshape(B, Hkv, nblk, ks, D).mean(axis=3)
            comp = jax.lax.dynamic_update_slice(
                self.comp, pooled.astype(self.comp.dtype), (z, z, first, z))
            return SparseKVCache(k=k, v=v, comp=comp, kernel_size=ks)
        # per-row offsets (continuous-batching slots): scatter at [b, :,
        # pos[b,t], :] then re-pool each row's touched blocks via gathers
        S = self.k.shape[2]
        pos = jnp.clip(off[:, None] + jnp.arange(T, dtype=jnp.int32), 0,
                       S - 1)                                        # [B,T]
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        k = self.k.at[bidx, :, pos].set(
            jnp.transpose(k_new, (0, 2, 1, 3)).astype(self.k.dtype))
        v = self.v.at[bidx, :, pos].set(
            jnp.transpose(v_new, (0, 2, 1, 3)).astype(self.v.dtype))
        first = jnp.minimum(off // ks, nb - nblk)                    # [B]
        tok = jnp.clip(first[:, None] * ks
                       + jnp.arange(nblk * ks, dtype=jnp.int32), 0, S - 1)
        region = jnp.take_along_axis(k, tok[:, None, :, None], axis=2)
        pooled = region.reshape(B, Hkv, nblk, ks, D).mean(axis=3)
        blk = first[:, None] + jnp.arange(nblk, dtype=jnp.int32)     # [B,nblk]
        # non-adjacent advanced indices move (B, nblk) to the front
        comp = self.comp.at[bidx, :, blk].set(
            jnp.transpose(pooled, (0, 2, 1, 3)).astype(self.comp.dtype))
        return SparseKVCache(k=k, v=v, comp=comp, kernel_size=ks)


def sparse_decode_attention(q: jax.Array, cache, offset: jax.Array,
                            scfg: SparseConfig, scale: float) -> jax.Array:
    """q: [B, H, 1, D] single decode step over the full-history cache.

    cache: SparseKVCache (incrementally-maintained compressed keys) or a
    plain KVCache (compressed keys recomputed — tests/fallback only).
    Static gathered length = init_end + topk*ks + window_size.
    """
    B, H, _, D = q.shape
    Hkv = cache.k.shape[1]
    S = cache.max_len
    ks = scfg.kernel_size
    nb = S // ks
    # length incl. current token; scalar or per-row [B] (batching slots)
    total = (offset + 1).astype(jnp.int32)
    if total.ndim == 0:
        total = jnp.broadcast_to(total, (B,))
    init_end = scfg.init_blocks * scfg.block_size
    window_start = jnp.maximum(total - scfg.window_size, init_end)  # [B]

    # --- score compressed middle blocks -----------------------------------
    if isinstance(cache, SparseKVCache) and cache.kernel_size == ks:
        comp = cache.comp                                   # [B,Hkv,nb,D]
    else:
        comp = compress_keys(cache.k, ks)                   # [B,Hkv,nb,D]
    n_rep = H // Hkv
    q_score = q.reshape(B, Hkv, n_rep, 1, D)[:, :, 0]       # [B,Hkv,1,D]
    scores = jnp.einsum("bhqd,bhnd->bhqn", q_score.astype(jnp.float32),
                        comp.astype(jnp.float32))           # [B,Hkv,1,nb]
    blk_start = jnp.arange(nb, dtype=jnp.int32) * ks        # [nb]
    blk_valid = ((blk_start[None] >= init_end)
                 & (blk_start[None] + ks <= window_start[:, None]))  # [B,nb]
    scores = jnp.where(blk_valid[:, None, None], scores, NEG_INF)

    topk = min(scfg.topk, nb)
    top_scores, top_idx = jax.lax.top_k(scores[:, :, 0], topk)  # [B,Hkv,topk]
    sel_valid = top_scores > NEG_INF / 2                        # [B,Hkv,topk]

    # --- build gathered index set (static length) --------------------------
    init_idx = jnp.arange(init_end, dtype=jnp.int32)
    init_idx = jnp.broadcast_to(init_idx, (B, Hkv, init_end))
    blk_tok = (top_idx[..., None] * ks
               + jnp.arange(ks, dtype=jnp.int32)).reshape(B, Hkv, topk * ks)
    # window positions: the last window_size tokens before each row's total
    win_pos = (total[:, None] - scfg.window_size
               + jnp.arange(scfg.window_size, dtype=jnp.int32))  # [B,W]
    win_valid = win_pos >= window_start[:, None]                 # [B,W]
    win_idx = jnp.broadcast_to(jnp.clip(win_pos, 0, S - 1)[:, None],
                               (B, Hkv, scfg.window_size))

    gather_idx = jnp.concatenate([init_idx, blk_tok, win_idx], -1)  # [B,Hkv,G]
    G = gather_idx.shape[-1]

    # slot validity mask
    init_valid = jnp.broadcast_to(
        jnp.arange(init_end, dtype=jnp.int32)[None, None]
        < total[:, None, None], (B, Hkv, init_end))
    blk_slot_valid = jnp.repeat(sel_valid, ks, axis=-1)
    win_slot_valid = jnp.broadcast_to(win_valid[:, None],
                                      (B, Hkv, scfg.window_size))
    valid = jnp.concatenate([init_valid, blk_slot_valid, win_slot_valid], -1)

    gk = jnp.take_along_axis(cache.k, gather_idx[..., None], axis=2)
    gv = jnp.take_along_axis(cache.v, gather_idx[..., None], axis=2)

    mask = jnp.where(valid, 0.0, NEG_INF)[:, :, None].astype(jnp.float32)
    return sdpa(q, gk, gv, scale=scale, mask=mask)
