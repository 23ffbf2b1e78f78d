"""Paged KV cache: a shared page pool + per-sequence page tables.

Serving-scale memory management beyond the reference (its cache family is
one contiguous buffer per sequence, mlx-rs-core/src/cache.rs:7-195; vLLM's
PagedAttention is the public prior art). TPU design constraints shape this
differently from the GPU version:

  - XLA needs static shapes, so the fallback attention reads a *gathered
    dense view* of each sequence's pages ([B, n_kv, max_pages*page_size,
    D]) and masks by offset — XLA fuses the gather into the attention
    reads (measured: paged/dense ratio 0.98 at B=8, S=2048).
  - Decode attention runs the hand-pipelined Pallas kernel in
    ops/paged_attention.py: ONE fused pass over K and V per step vs XLA's
    separate QK/softmax/AV fusions, and it streams only the pages each
    row's table maps (XLA always reads full capacity).
  - The capacity win: slots share one physical pool, so N in-flight
    sequences of mixed lengths consume pages for the tokens they actually
    hold instead of N x max_len reservations.
  - Page allocation is host-side (a free list over a tiny int32 table);
    the page table rides into jit as a data argument, so allocation never
    retraces anything.

Pool layouts: k [n_kv, P, D, page_size] (pages stored TRANSPOSED so the
kernel's QK dot reads kT panels [D, ps] contiguously and the per-page DMA
lands on a 128-lane-aligned slice), v [n_kv, P, page_size, D] (natural —
the AV dot wants [ps, D]). n_kv leads for tensor-parallel sharding
(P("tp", None, None, None)).
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

    k_pool: jax.Array      # [n_kv, P, D, page_size] (TRANSPOSED pages: the
    #                        decode kernel's QK dot wants kT panels [D, ps])
    v_pool: jax.Array      # [n_kv, P, page_size, D] (natural: AV wants [ps, D])
    page_table: jax.Array  # [B, max_pages] int32 physical page ids
    # int8 KV mode: pools are int8 codes with per-(head, token) symmetric
    # scales — halves pool HBM (2x serving capacity) and halves the decode
    # kernel's DMA bytes. None -> dense bf16/f32 pools.
    k_scale: Optional[jax.Array] = None   # f32 [n_kv, P, page_size]
    v_scale: Optional[jax.Array] = None   # f32 [n_kv, P, page_size]

    @staticmethod
    def init(batch: int, n_kv: int, num_pages: int, page_size: int,
             head_dim: int, max_pages: int, dtype=jnp.bfloat16,
             page_table: Optional[jax.Array] = None,
             quantized: bool = False) -> "PagedKVCache":
        if page_table is None:
            page_table = jnp.zeros((batch, max_pages), jnp.int32)
        if quantized:
            return PagedKVCache(
                k_pool=jnp.zeros((n_kv, num_pages, head_dim, page_size),
                                 jnp.int8),
                v_pool=jnp.zeros((n_kv, num_pages, page_size, head_dim),
                                 jnp.int8),
                page_table=page_table,
                k_scale=jnp.zeros((n_kv, num_pages, page_size), jnp.float32),
                v_scale=jnp.zeros((n_kv, num_pages, page_size), jnp.float32))
        return PagedKVCache(
            k_pool=jnp.zeros((n_kv, num_pages, head_dim, page_size), dtype),
            v_pool=jnp.zeros((n_kv, num_pages, page_size, head_dim), dtype),
            page_table=page_table)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.v_pool.shape[2]

    @property
    def max_len(self) -> int:
        """Logical per-sequence capacity (the dense-view length)."""
        return self.page_table.shape[1] * self.page_size

    @property
    def k(self) -> jax.Array:
        B, MP = self.page_table.shape
        n_kv, _, d, ps = self.k_pool.shape
        v = self.k_pool[:, self.page_table]        # [n_kv, B, MP, D, ps]
        v = jnp.transpose(v, (1, 0, 2, 4, 3))      # [B, n_kv, MP, ps, D]
        v = v.reshape(B, n_kv, MP * ps, d)
        if self.quantized:
            s = self.k_scale[:, self.page_table]   # [n_kv, B, MP, ps]
            s = jnp.transpose(s, (1, 0, 2, 3)).reshape(B, n_kv, MP * ps)
            v = (v.astype(jnp.float32) * s[..., None]).astype(jnp.bfloat16)
        return v

    @property
    def v(self) -> jax.Array:
        B, MP = self.page_table.shape
        n_kv, _, ps, d = self.v_pool.shape
        v = self.v_pool[:, self.page_table]        # [n_kv, B, MP, ps, D]
        v = v.reshape(n_kv, B, MP * ps, d)
        v = jnp.transpose(v, (1, 0, 2, 3))         # [B, n_kv, S, D]
        if self.quantized:
            s = self.v_scale[:, self.page_table]   # [n_kv, B, MP, ps]
            s = jnp.transpose(s, (1, 0, 2, 3)).reshape(B, n_kv, MP * ps)
            v = (v.astype(jnp.float32) * s[..., None]).astype(jnp.bfloat16)
        return v

    def update(self, k_new: jax.Array, v_new: jax.Array, offset: jax.Array):
        """Write [B, n_kv, T, D] at logical position ``offset`` (scalar or
        [B]) through the page table; returns the new cache. Positions past
        the allocated pages of a row land in that row's table entries
        verbatim (the allocator must have extended the table first);
        positions past the table WIDTH (capacity) are redirected to the
        null page, matching the dense cache's drop-on-overflow (a clipped
        index would silently corrupt the row's last real page)."""
        B, n_kv, T, d = k_new.shape
        ps = self.page_size
        off = offset.astype(jnp.int32)
        if off.ndim == 0:
            off = jnp.broadcast_to(off, (B,))
        pos = off[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B,T]
        mp = self.page_table.shape[1]
        logical = jnp.clip(pos // ps, 0, mp - 1)
        pages = jnp.take_along_axis(self.page_table, logical, axis=1)  # [B,T]
        pages = jnp.where(pos // ps >= mp, 0, pages)   # OOB -> null page
        within = pos % ps
        if self.quantized:
            k_src, k_sc = quantize_kv_tokens(k_new)  # [B,n_kv,T,D]/[B,n_kv,T]
            v_src, v_sc = quantize_kv_tokens(v_new)
        else:
            k_src, v_src = k_new, v_new
        # k: scatter at [j, pages[b,t], :, within[b,t]] <- [b, t, j, :]
        # (non-adjacent advanced indices move the [B, T] dims to the front)
        k_pool = self.k_pool.at[:, pages, :, within].set(
            jnp.transpose(k_src, (0, 2, 1, 3)).astype(self.k_pool.dtype))
        # v: scatter at [j, pages[b,t], within[b,t], :] <- [j, b, t, :]
        v_pool = self.v_pool.at[:, pages, within].set(
            jnp.transpose(v_src, (1, 0, 2, 3)).astype(self.v_pool.dtype))
        if not self.quantized:
            return PagedKVCache(k_pool=k_pool, v_pool=v_pool,
                                page_table=self.page_table)
        return PagedKVCache(
            k_pool=k_pool, v_pool=v_pool, page_table=self.page_table,
            k_scale=self.k_scale.at[:, pages, within].set(
                jnp.transpose(k_sc, (1, 0, 2))),
            v_scale=self.v_scale.at[:, pages, within].set(
                jnp.transpose(v_sc, (1, 0, 2))))


def quantize_kv_tokens(x: jax.Array):
    """Per-token symmetric int8 over the trailing (head-dim) axis:
    scale = max|x| / 127. Returns (codes int8 [..., D], scales f32 [...])."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


class PageAllocator:
    """Host-side free-list over the physical pool. Page 0 is reserved as the
    null page (unallocated table entries point at it and gather masked-out
    garbage), so a zeroed page table is always safe.

    Pages are REF-COUNTED so a physical page can back several logical
    sequences at once (prefix caching: slots mapping a shared system-prompt
    page each hold a ref, and the PrefixCache holds one of its own). A page
    returns to the free list when its last ref drops."""

    def __init__(self, num_pages: int, page_size: int):
        self.page_size = page_size
        self.free: List[int] = list(range(1, num_pages))
        self.owned: dict = {}                       # slot -> [page ids]
        self.refs: dict = {}                        # page id -> refcount

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
            p = self.free.pop()
            self.refs[p] = 1
            have.append(p)
        return have

    def share(self, slot: int, pages: List[int]):
        """Map already-backed pages (a cached prefix) into ``slot``: the
        slot takes a ref on each. Must run BEFORE alloc() so the shared
        pages lead the slot's page list in token order."""
        have = self.owned.setdefault(slot, [])
        assert not have, "share() must precede alloc() on an empty slot"
        for p in pages:
            self.refs[p] = self.refs.get(p, 0) + 1
            have.append(p)

    def retain(self, page: int):
        self.refs[page] = self.refs.get(page, 0) + 1

    def drop(self, page: int):
        n = self.refs.get(page, 0) - 1
        if n <= 0:
            self.refs.pop(page, None)
            self.free.append(page)
        else:
            self.refs[page] = n

    def release(self, slot: int):
        for p in self.owned.pop(slot, []):
            self.drop(p)


class PrefixCache:
    """Exact-match prefix reuse at page granularity (the paged-pool payoff
    beyond capacity: vLLM-style automatic prefix caching, no reference
    counterpart — the reference serves one request at a time).

    Full pages of a prompt are registered under a SHA-1 hash CHAIN (each
    page's key digests its tokens plus its parent's key, so a hit implies
    the entire prefix matches). Hits map the physical pages into the new
    request's table (allocator.share) and prefill runs only on the suffix.
    Registered pages hold one cache ref; LRU entries whose pages no active
    slot maps (refs == 1) are evictable when the pool runs dry."""

    def __init__(self, page_size: int):
        import collections
        self.ps = page_size
        self.entries = collections.OrderedDict()    # digest -> page id
        self.hits = 0
        self.misses = 0
        self.hit_tokens = 0

    def _chain(self, tokens):
        import hashlib
        h = b""
        for i in range(len(tokens) // self.ps):
            chunk = tokens[i * self.ps:(i + 1) * self.ps]
            m = hashlib.sha1(h)
            m.update(b",".join(str(t).encode() for t in chunk))
            h = m.digest()
            yield h

    def chain(self, tokens) -> List[bytes]:
        """Materialized digest chain for a prompt — compute ONCE per
        request and pass to lookup/register (lookup runs on every batcher
        step while a request queues; re-hashing a 100k-token prompt per
        step would burn the serving thread's host CPU)."""
        return list(self._chain(tokens))

    def lookup(self, tokens, max_pages: int,
               digests: Optional[List[bytes]] = None) -> List[int]:
        """Longest chain of cached pages covering a prefix of ``tokens``,
        capped at ``max_pages`` (callers cap at (T-1)//ps so at least one
        real token remains for the suffix prefill)."""
        pages: List[int] = []
        for h in (digests if digests is not None else self._chain(tokens)):
            if len(pages) >= max_pages:
                break
            p = self.entries.get(h)
            if p is None:
                break
            self.entries.move_to_end(h)
            pages.append(p)
        return pages

    def record(self, n_hit_pages: int):
        """Count one ADOPTION (lookup runs repeatedly while a request waits
        in the queue, so stats are recorded once, at adoption time)."""
        if n_hit_pages:
            self.hits += 1
            self.hit_tokens += n_hit_pages * self.ps
        else:
            self.misses += 1

    def register(self, tokens, pages: List[int], alloc: PageAllocator,
                 digests: Optional[List[bytes]] = None):
        """Record ``pages`` (the slot's in-order page list) as holding the
        full pages of ``tokens``; the cache takes a ref on each new entry."""
        for h, p in zip(digests if digests is not None
                        else self._chain(tokens), pages):
            if h in self.entries:
                continue
            self.entries[h] = p
            alloc.retain(p)

    def evict(self, alloc: PageAllocator, keep=(), max_evict: int = 1) -> int:
        """Drop up to ``max_evict`` LRU entries whose page only the cache
        still refs (refs == 1) and is not in ``keep``. Returns count."""
        keep = set(keep)
        evicted = 0
        for h in list(self.entries):
            if evicted >= max_evict:
                break
            p = self.entries[h]
            if p in keep or alloc.refs.get(p, 0) != 1:
                continue
            del self.entries[h]
            alloc.drop(p)
            evicted += 1
        return evicted

    def evictable(self, alloc: PageAllocator, keep=()) -> int:
        keep = set(keep)
        return sum(1 for p in self.entries.values()
                   if p not in keep and alloc.refs.get(p, 0) == 1)
