"""KV caches: fixed-capacity, statically-shaped, donation-friendly.

TPU-native replacement for the reference cache family (reference:
mlx-rs-core/src/cache.rs:7-195). The reference grows a buffer in 256-token
steps with in-place ``index_mut`` writes ("40-100x faster cache ops",
docs/mlx-performance-deep-dive.md:419). XLA requires static shapes, so the
TPU design preallocates ``max_len`` once and writes each step with
``lax.dynamic_update_slice``; donated cache buffers make the update in-place
at runtime, giving the same zero-copy behavior with zero reallocation.

Layout: [B, n_kv_heads, max_len, head_dim] — heads on the second axis so a
(heads x seq) attention kernel tiles naturally onto the MXU, and so sharding
the head axis for tensor parallelism is a single NamedSharding spec.

Sliding-window (``max_size`` in the reference) is handled by writing modulo
the window into a window-sized buffer (RotatingKVCache).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-layer fixed-capacity KV cache.

    ``offset`` is carried by the enclosing ModelCache (one per model, all
    layers advance in lockstep for dense transformers).
    """

    k: jax.Array  # [B, n_kv, max_len, head_dim]
    v: jax.Array  # [B, n_kv, max_len, head_dim]

    @staticmethod
    def init(batch: int, n_kv: int, max_len: int, head_dim: int,
             dtype=jnp.bfloat16) -> "KVCache":
        shape = (batch, n_kv, max_len, head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update(self, k_new: jax.Array, v_new: jax.Array, offset: jax.Array):
        """Write [B, n_kv, T, D] at position ``offset``; returns new cache.

        Equivalent of reference ``KVCache::update_and_fetch``
        (mlx-rs-core/src/cache.rs:131) minus the fetch: attention kernels read
        the full buffer and mask by length, keeping shapes static.
        """
        z = jnp.zeros((), jnp.int32)
        off = offset.astype(jnp.int32)
        if off.ndim == 1:       # per-sequence offsets (continuous batching)
            def put(buf, new, o):
                return jax.lax.dynamic_update_slice(buf, new, (z, o, z))
            k = jax.vmap(put)(self.k, k_new.astype(self.k.dtype), off)
            v = jax.vmap(put)(self.v, v_new.astype(self.v.dtype), off)
            return KVCache(k=k, v=v)
        k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype),
                                         (z, z, off, z))
        v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype),
                                         (z, z, off, z))
        return KVCache(k=k, v=v)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RotatingKVCache:
    """Sliding-window cache: ring buffer of ``window`` positions.

    Equivalent of the reference's ``max_size`` sliding-window behavior
    (mlx-rs-core/src/cache.rs:7-20, utils.rs:160-170). Positions are written
    modulo the window; attention masks by absolute position distance.
    """

    k: jax.Array  # [B, n_kv, window, head_dim]
    v: jax.Array
    # absolute position of each slot, -1 if empty: [window]
    slot_pos: jax.Array

    @staticmethod
    def init(batch: int, n_kv: int, window: int, head_dim: int,
             dtype=jnp.bfloat16) -> "RotatingKVCache":
        shape = (batch, n_kv, window, head_dim)
        return RotatingKVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            slot_pos=jnp.full((window,), -1, jnp.int32))

    @property
    def window(self) -> int:
        return self.k.shape[2]

    def update(self, k_new: jax.Array, v_new: jax.Array, offset: jax.Array):
        """Write T new positions starting at absolute ``offset`` (T static)."""
        w = self.window
        if k_new.shape[2] > w:
            # slots = pos % w would contain duplicate indices, and scatter
            # write order with duplicates is unspecified in JAX — keep only
            # the last `window` positions (older ones are dead anyway)
            offset = offset + (k_new.shape[2] - w)
            k_new = k_new[:, :, -w:, :]
            v_new = v_new[:, :, -w:, :]
        T = k_new.shape[2]
        pos = offset.astype(jnp.int32) + jnp.arange(T, dtype=jnp.int32)
        slots = pos % w
        k = self.k.at[:, :, slots, :].set(k_new.astype(self.k.dtype))
        v = self.v.at[:, :, slots, :].set(v_new.astype(self.v.dtype))
        slot_pos = self.slot_pos.at[slots].set(pos)
        return RotatingKVCache(k=k, v=v, slot_pos=slot_pos)


def ingests_padding(layer_cache) -> bool:
    """True for recurrent-state layer caches (GLA / deltanet): every
    position feeds the state, so PADDED prefill buckets or chunks would
    corrupt it — prefill must run exact lengths. Positional KV caches
    (dense, rotating, paged, sparse) expose ``max_len`` and mask padding
    by offset. The single source of truth for this classification
    (generate.Engine bucketing, prefill_chunked widths, and the batcher's
    adoption/speculative gating all consult it). RotatingKVCache exposes
    ``window`` instead of ``max_len`` (it wraps — no capacity bound), but
    padding it is safe: pad slots carry FUTURE positions in slot_pos, which
    the by-position mask excludes until real tokens overwrite them."""
    if isinstance(layer_cache, RotatingKVCache):
        return False
    return not hasattr(layer_cache, "max_len")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelCache:
    """Whole-model cache: per-layer caches + one shared offset.

    Functional counterpart of the reference's ``Vec<KVCache>`` passed through
    ``Generate`` (mlx-rs-core/src/generate/mod.rs). Layer caches may be
    heterogeneous (hybrid models mix KVCache with recurrent-state caches).
    """

    layers: list
    offset: jax.Array  # scalar int32: tokens processed so far

    @staticmethod
    def init_dense(num_layers: int, batch: int, n_kv: int, max_len: int,
                   head_dim: int, dtype=jnp.bfloat16) -> "ModelCache":
        return ModelCache(
            layers=[KVCache.init(batch, n_kv, max_len, head_dim, dtype)
                    for _ in range(num_layers)],
            offset=jnp.zeros((), jnp.int32))

    def advance(self, n: int) -> "ModelCache":
        return ModelCache(layers=self.layers, offset=self.offset + n)

    def with_layers(self, layers: list) -> "ModelCache":
        return ModelCache(layers=layers, offset=self.offset)
