"""Context-parallel (sequence-parallel) prefill over an "sp" mesh axis.

The genuinely new long-context axis of the TPU build (SURVEY.md §5.7: the
reference scales long context single-device via sparse/GLA algorithms; the
multi-chip counterpart is ring attention over ICI). The whole dense-model
prefill forward runs under ``shard_map`` with the sequence axis sharded:

  - tokens [B, T] shard T over "sp"; params replicate
  - each attention layer runs ``parallel.ring_attention`` — local Q against
    the K/V block currently held, rotated around the ring with ppermute,
    merged with the running log-sum-exp
  - RoPE positions are globalized by the device's axis index
  - the returned ModelCache holds the full prompt's KV, sequence-sharded
    over "sp" (capacity == prompt length on purpose: decode continues after
    an all-gather of the KV, or stays sharded under a kv-gather decode)

Memory per chip is O(T/n) activations + O(T/n) KV, which is what makes
256k+ prompts fit at all.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ominix_mlx_tpu.core.cache import KVCache, ModelCache

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def cp_cache_specs(cache: ModelCache, axis: str = "sp") -> ModelCache:
    """Spec tree sharding every dense layer cache's sequence axis on
    ``axis`` (KV layout [B, n_kv, S, D] — core/cache.py)."""
    def layer_spec(lc):
        assert isinstance(lc, KVCache), (
            "context-parallel prefill supports dense KVCache layers; hybrid "
            f"families keep the single-device algorithmic tier ({type(lc)})")
        kv = P(None, None, axis, None)
        return KVCache(k=kv, v=kv)
    return ModelCache(layers=[layer_spec(lc) for lc in cache.layers],
                      offset=P())


def prefill_context_parallel(params: dict, cfg, tokens: jax.Array,
                             cache: ModelCache, mesh: Mesh,
                             axis: str = "sp"):
    """Sequence-parallel fresh prefill: (params, tokens [B, T], empty cache
    with capacity T) -> (last-token logits [B, 1, V], filled cache).

    T must divide by mesh.shape[axis]. The heavy forward runs with
    skip_logits=True (the [T/n, V] logits of non-final positions are never
    materialized); the last position's logits are computed outside the
    shard_map on the gathered final hidden state.
    """
    from ominix_mlx_tpu.models import base

    n = mesh.shape[axis]
    B, T = tokens.shape
    assert T % n == 0, (T, n)
    # sliding-window models ride the windowed ring mask
    # (ring_attention(window=cfg.sliding_window), exact vs the
    # single-device masked path — tests/test_ring_attention.py)
    caps = [lc.max_len for lc in cache.layers]
    assert all(c == T for c in caps), (
        f"cp prefill wants cache capacity == prompt length ({T}), got {caps}")

    pspec = jax.tree.map(lambda _: P(), params)
    cspec = cp_cache_specs(cache, axis)

    def body(p, t, c):
        hidden, c = base.forward(p, cfg, t, c, fresh_prefill=True,
                                 skip_logits=True, ring_axis=axis)
        return hidden, c

    hidden, out_cache = shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(None, axis), cspec),
        out_specs=(P(None, axis, None), cspec),
        check_vma=False)(params, tokens, cache)
    # offset advanced by the LOCAL shard length inside shard_map; the global
    # semantic offset is the full prompt length
    out_cache = ModelCache(layers=out_cache.layers,
                           offset=jnp.asarray(T, jnp.int32))
    last = hidden[:, -1:, :]
    from ominix_mlx_tpu.nn.layers import embedding_as_linear, linear
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = embedding_as_linear(params["embed"], last)
    else:
        logits = linear(params["lm_head"], last)
    if cfg.logits_scale != 1.0:
        logits = logits * cfg.logits_scale
    return logits, out_cache


def gather_cache(cache: ModelCache,
                 mesh: Optional[Mesh] = None) -> ModelCache:
    """Replicate a sequence-sharded prefill cache (e.g. to hand off to a
    single-chip or tp-sharded decode). With ``mesh``, buffers land on a
    replicated NamedSharding over the whole mesh (one all-gather per layer,
    inserted by XLA) — ready for a sharded decode without another transfer.
    Without, they gather onto device 0 (single-device handoff)."""
    from jax.sharding import NamedSharding
    dst = (NamedSharding(mesh, P()) if mesh is not None
           else jax.devices()[0])
    return jax.tree.map(
        lambda x: jax.device_put(x, dst) if isinstance(x, jax.Array) else x,
        cache)
