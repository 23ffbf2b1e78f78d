"""Continuous batching: slot-based decode with in-flight request refill.

Serving-scale machinery beyond the reference (its server decodes one
request at a time on a dedicated thread, server.rs:971-1010; its batch
example is lockstep with per-sequence finish flags,
examples/batch_generate.rs:62-84). TPU design:

  - a STATIC batch of ``slots`` sequences decodes in one jitted step;
    per-slot offsets drive the causal mask / RoPE / KV writes (the
    vector-offset paths in core.attention / core.cache / models.base)
  - a new request prefills into a fresh single-row cache (its own jit,
    bucketed lengths) and is ADOPTED into a free slot with one
    dynamic_update_slice per layer — decode never re-traces
  - finished slots free immediately and refill from the queue: no
    lockstep barrier, the defining property of continuous batching
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.cache import KVCache, ModelCache
from ominix_mlx_tpu.core.generate import bucket_length


@dataclasses.dataclass
class _Request:
    rid: object
    tokens: List[int]
    max_tokens: int
    out: List[int] = dataclasses.field(default_factory=list)
    stop: Optional[set] = None          # per-request stop ids (None -> global)
    emit: Optional[Callable] = None     # streaming sink: emit(tok) per token,
    #                                     emit(None) exactly once on finish


class ContinuousBatcher:
    """Greedy continuous-batching decoder over ``forward(params, tokens,
    cache) -> (logits, cache)`` models (base.forward-compatible)."""

    def __init__(self, forward_fn: Callable, params, cfg, init_cache_fn,
                 slots: int = 4, max_len: int = 2048,
                 stop_tokens: Tuple[int, ...] = ()):
        self.fwd = forward_fn
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.stop_tokens = set(stop_tokens)
        self.cache = init_cache_fn(cfg, slots, max_len)
        self.offsets = jnp.zeros((slots,), jnp.int32)
        self.toks = jnp.zeros((slots,), jnp.int32)
        self.active: List[Optional[_Request]] = [None] * slots
        self.queue: deque = deque()

        def decode_step(params, layers, offsets, toks, active):
            cache = ModelCache(layers=layers, offset=offsets)
            logits, cache = self.fwd(params, toks[:, None], cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            # inactive slots: hold offset (their KV write lands on the same
            # slot every step and is overwritten on adoption)
            offsets = jnp.where(active, offsets + 1, offsets)
            return cache.layers, offsets, nxt

        self._decode = jax.jit(decode_step, donate_argnums=(1,))

        def prefill(params, tokens, real_len, layers1):
            cache = ModelCache(layers=layers1, offset=jnp.zeros((), jnp.int32))
            logits, cache = self.fwd(params, tokens, cache)
            last = jax.lax.dynamic_index_in_dim(logits[0], real_len - 1, 0,
                                                keepdims=False)
            tok = jnp.argmax(last, -1).astype(jnp.int32)
            return cache.layers, tok

        self._prefill = jax.jit(prefill, donate_argnums=(3,))

        def adopt(layers, layers1, slot, offsets, toks, off_new, tok_new):
            z = jnp.zeros((), jnp.int32)
            new_layers = []
            for lc, l1 in zip(layers, layers1):
                if isinstance(lc, KVCache):
                    k = jax.lax.dynamic_update_slice(lc.k,
                                                     l1.k.astype(lc.k.dtype),
                                                     (slot, z, z, z))
                    v = jax.lax.dynamic_update_slice(lc.v,
                                                     l1.v.astype(lc.v.dtype),
                                                     (slot, z, z, z))
                    new_layers.append(KVCache(k=k, v=v))
                else:
                    new_layers.append(lc)
            offsets = offsets.at[slot].set(off_new)
            toks = toks.at[slot].set(tok_new)
            return new_layers, offsets, toks

        self._adopt = jax.jit(adopt, donate_argnums=(0,))

    # ------------------------------------------------------------ public ----

    def submit(self, rid, tokens: List[int], max_tokens: int = 128,
               stop_tokens=None, emit: Optional[Callable] = None):
        self.queue.append(_Request(
            rid, list(tokens), max_tokens,
            stop=set(stop_tokens) if stop_tokens is not None else None,
            emit=emit))

    def cancel(self, rid) -> bool:
        """Drop a queued or in-flight request (per-request cancellation,
        reference voice_clone.rs:198-206). Frees the slot immediately; the
        emit sink (if any) receives the terminating ``None``."""
        for req in list(self.queue):
            if req.rid == rid:
                self.queue.remove(req)
                if req.emit:
                    req.emit(None)
                return True
        for b, req in enumerate(self.active):
            if req is not None and req.rid == rid:
                self.active[b] = None
                if req.emit:
                    req.emit(None)
                return True
        return False

    def pending(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.active)

    def _fill_free_slots(self):
        for b in range(self.slots):
            if self.active[b] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            T = len(req.tokens)
            bucket = min(bucket_length(T), self.max_len)
            padded = jnp.zeros((1, bucket), jnp.int32).at[0, :T].set(
                jnp.asarray(req.tokens, jnp.int32))
            layers1 = jax.tree.map(
                lambda a: a[:1] * 0, self.cache.layers,
                is_leaf=lambda x: isinstance(x, jax.Array))
            layers1, tok = self._prefill(self.params, padded, jnp.int32(T),
                                         layers1)
            layers, self.offsets, self.toks = self._adopt(
                list(self.cache.layers), layers1, jnp.int32(b), self.offsets,
                self.toks, jnp.int32(T), tok)
            self.cache = ModelCache(layers=list(layers), offset=self.offsets)
            self.active[b] = req

    def step(self) -> List[Tuple[object, List[int]]]:
        """One decode step for every active slot; refills free slots first.
        Returns requests that FINISHED this step as (rid, tokens)."""
        self._fill_free_slots()
        if not any(r is not None for r in self.active):
            return []
        active_mask = jnp.asarray([r is not None for r in self.active])
        # current tokens are appended to outputs, then the step computes next
        cur = [int(t) for t in self.toks]
        finished = []
        layers, self.offsets, nxt = self._decode(
            self.params, list(self.cache.layers), self.offsets, self.toks,
            active_mask)
        self.cache = ModelCache(layers=layers, offset=self.offsets)
        for b, req in enumerate(self.active):
            if req is None:
                continue
            t = cur[b]
            stops = req.stop if req.stop is not None else self.stop_tokens
            done = (t in stops
                    or len(req.out) + 1 >= req.max_tokens
                    or int(self.offsets[b]) >= self.max_len - 1)
            if t not in stops:
                req.out.append(t)
                if req.emit:
                    req.emit(t)
            if done:
                finished.append((req.rid, req.out))
                if req.emit:
                    req.emit(None)
                self.active[b] = None
        self.toks = nxt
        return finished

    def run_all(self, requests: List[Tuple[object, List[int], int]]
                ) -> Dict[object, List[int]]:
        """Drain a request list to completion (tests / offline batch)."""
        for rid, toks, mt in requests:
            self.submit(rid, toks, mt)
        done: Dict[object, List[int]] = {}
        while self.queue or any(r is not None for r in self.active):
            for rid, out in self.step():
                done[rid] = out
        return done
