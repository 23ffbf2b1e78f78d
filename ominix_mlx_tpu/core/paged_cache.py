"""Paged KV cache: a shared page pool + per-sequence page tables.

Serving-scale memory management beyond the reference (its cache family is
one contiguous buffer per sequence, mlx-rs-core/src/cache.rs:7-195; vLLM's
PagedAttention is the public prior art). TPU design constraints shape this
differently from the GPU version:

  - XLA needs static shapes, so attention reads a *gathered dense view* of
    each sequence's pages ([B, n_kv, max_pages*page_size, D]) and masks by
    offset — the gather streams the same bytes decode attention reads
    anyway, so it costs no extra HBM traffic at decode (T=1).
  - The win is CAPACITY, not bandwidth: slots share one physical pool, so
    N in-flight sequences of mixed lengths consume pages for the tokens
    they actually hold instead of N x max_len reservations.
  - Page allocation is host-side (a free list over a tiny int32 table);
    the page table rides into jit as a data argument, so allocation never
    retraces anything.

Pool layout [P, page_size, n_kv, D]: the two indexed axes (page id, slot
within page) are adjacent, so pool.at[pages, within] scatters/gathers with
plain advanced indexing; n_kv stays a single axis for tensor-parallel
sharding (P(None, None, "tp", None)).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Per-layer paged cache presenting the KVCache interface (update/.k/.v)
    so models.base attention consumes it unchanged."""

    k_pool: jax.Array      # [P, page_size, n_kv, D]
    v_pool: jax.Array      # [P, page_size, n_kv, D]
    page_table: jax.Array  # [B, max_pages] int32 physical page ids

    @staticmethod
    def init(batch: int, n_kv: int, num_pages: int, page_size: int,
             head_dim: int, max_pages: int, dtype=jnp.bfloat16,
             page_table: Optional[jax.Array] = None) -> "PagedKVCache":
        shape = (num_pages, page_size, n_kv, head_dim)
        if page_table is None:
            page_table = jnp.zeros((batch, max_pages), jnp.int32)
        return PagedKVCache(
            k_pool=jnp.zeros(shape, dtype), v_pool=jnp.zeros(shape, dtype),
            page_table=page_table)

    @property
    def page_size(self) -> int:
        return self.k_pool.shape[1]

    @property
    def max_len(self) -> int:
        """Logical per-sequence capacity (the dense-view length)."""
        return self.page_table.shape[1] * self.page_size

    def _view(self, pool: jax.Array) -> jax.Array:
        B, MP = self.page_table.shape
        ps, n_kv, d = pool.shape[1:]
        v = pool[self.page_table]                  # [B, MP, ps, n_kv, D]
        v = v.reshape(B, MP * ps, n_kv, d)
        return jnp.transpose(v, (0, 2, 1, 3))      # [B, n_kv, S, D]

    @property
    def k(self) -> jax.Array:
        return self._view(self.k_pool)

    @property
    def v(self) -> jax.Array:
        return self._view(self.v_pool)

    def update(self, k_new: jax.Array, v_new: jax.Array, offset: jax.Array):
        """Write [B, n_kv, T, D] at logical position ``offset`` (scalar or
        [B]) through the page table; returns the new cache. Positions past
        the allocated pages of a row land in that row's table entries
        verbatim (the allocator must have extended the table first)."""
        B, n_kv, T, d = k_new.shape
        ps = self.page_size
        off = offset.astype(jnp.int32)
        if off.ndim == 0:
            off = jnp.broadcast_to(off, (B,))
        pos = off[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B,T]
        logical = jnp.clip(pos // ps, 0, self.page_table.shape[1] - 1)
        pages = jnp.take_along_axis(self.page_table, logical, axis=1)  # [B,T]
        within = pos % ps
        kv_vals = jnp.transpose(k_new, (0, 2, 1, 3))   # [B, T, n_kv, D]
        vv_vals = jnp.transpose(v_new, (0, 2, 1, 3))
        k_pool = self.k_pool.at[pages, within].set(
            kv_vals.astype(self.k_pool.dtype))
        v_pool = self.v_pool.at[pages, within].set(
            vv_vals.astype(self.v_pool.dtype))
        return PagedKVCache(k_pool=k_pool, v_pool=v_pool,
                            page_table=self.page_table)


class PageAllocator:
    """Host-side free-list over the physical pool. Page 0 is reserved as the
    null page (unallocated table entries point at it and gather masked-out
    garbage), so a zeroed page table is always safe."""

    def __init__(self, num_pages: int, page_size: int):
        self.page_size = page_size
        self.free: List[int] = list(range(1, num_pages))
        self.owned: dict = {}                       # slot -> [page ids]

    def pages_for(self, n_tokens: int) -> int:
        return -(-max(n_tokens, 1) // self.page_size)

    def alloc(self, slot: int, n_tokens: int) -> List[int]:
        """Ensure ``slot`` owns enough pages for n_tokens; returns the full
        page list. Raises MemoryError when the pool is exhausted."""
        have = self.owned.setdefault(slot, [])
        need = self.pages_for(n_tokens) - len(have)
        if need > len(self.free):
            raise MemoryError(
                f"paged KV pool exhausted: need {need} pages, "
                f"{len(self.free)} free")
        for _ in range(max(0, need)):
            have.append(self.free.pop())
        return have

    def release(self, slot: int):
        self.free.extend(self.owned.pop(slot, []))

    def table_row(self, slot: int, max_pages: int) -> jnp.ndarray:
        row = self.owned.get(slot, [])
        assert len(row) <= max_pages, (len(row), max_pages)
        return jnp.asarray(row + [0] * (max_pages - len(row)), jnp.int32)
