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
import numpy as np

from ominix_mlx_tpu.core.cache import KVCache, ModelCache
from ominix_mlx_tpu.core.generate import bucket_length
from ominix_mlx_tpu.core.sampling import (SamplerConfig, SamplerParams,
                                          sample_dynamic)

REP_WINDOW = 64


@dataclasses.dataclass
class _Request:
    rid: object
    tokens: List[int]
    max_tokens: int
    out: List[int] = dataclasses.field(default_factory=list)
    stop: Optional[set] = None          # per-request stop ids (None -> global)
    emit: Optional[Callable] = None     # streaming sink: emit(tok) per token,
    #                                     emit(None) exactly once on finish
    sampler: Optional[SamplerConfig] = None   # None -> greedy
    seed: int = 0
    chain: Optional[list] = None    # memoized prefix-cache digest chain


class ContinuousBatcher:
    """Greedy continuous-batching decoder over ``forward(params, tokens,
    cache) -> (logits, cache)`` models (base.forward-compatible)."""

    def __init__(self, forward_fn: Callable, params, cfg, init_cache_fn,
                 slots: int = 4, max_len: int = 2048,
                 stop_tokens: Tuple[int, ...] = (),
                 prefill_forward_fn: Optional[Callable] = None,
                 draft_forward_fn: Optional[Callable] = None,
                 draft_params=None,
                 draft_init_cache_fn: Optional[Callable] = None,
                 num_draft_tokens: int = 4,
                 chunk_forward_fn: Optional[Callable] = None,
                 chunk_hidden_forward_fn: Optional[Callable] = None,
                 prefill_chunk: int = 2048):
        """prefill_forward_fn: variant used for the (always-fresh) adoption
        prefill — e.g. base.forward with fresh_prefill=True, which rides the
        Pallas flash kernel instead of dense O(T * capacity) masked SDPA.

        chunk_forward_fn(params, tokens, cache, kv_limit): enables CHUNKED
        adoption prefill for prompts longer than ``prefill_chunk`` (the
        engine's flash-chunk path: bounded compile size and attention
        memory at any prompt length) and, in the paged batcher, the
        suffix-only prefill after a prefix-cache hit.

        draft_forward_fn/draft_params/draft_init_cache_fn turn on BATCHED
        SPECULATIVE decoding: every step drafts ``num_draft_tokens``
        greedily per slot and the target verifies all slots' drafts in one
        [slots, nd+1] forward — continuous batching and speculative decode
        compose (token-for-token equal to plain greedy; sampled requests
        must use the per-request path). draft_init_cache_fn(slots,
        max_len) -> ModelCache of dense KVCache layers for the draft."""
        self.fwd = forward_fn
        self.prefill_fwd = prefill_forward_fn or forward_fn
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.stop_tokens = set(stop_tokens)
        self.cache = init_cache_fn(cfg, slots, max_len)
        # hybrid models carry recurrent layers (RecurrentCache/GLACache):
        # padding runs through the recurrence, so adoption prefills must be
        # EXACT length (the Engine's rule, core/generate.py); and
        # speculative rounds cannot roll recurrent state back
        from ominix_mlx_tpu.core.cache import RotatingKVCache
        if any(isinstance(lc, RotatingKVCache) for lc in self.cache.layers):
            # slot_pos is shared across rows ([window], no batch dim) —
            # per-slot adoption cannot be represented; window masks over a
            # dense KVCache serve sliding-window models in the batcher
            raise ValueError(
                "continuous batching needs per-row cache state; init the "
                "batcher with dense KVCache layers (window masking) "
                "instead of RotatingKVCache")
        from ominix_mlx_tpu.core.cache import ingests_padding
        self._has_recurrent = any(ingests_padding(lc)
                                  for lc in self.cache.layers)
        if self._has_recurrent and draft_forward_fn is not None:
            raise ValueError(
                "speculative batching cannot roll back recurrent-state "
                "layers; use plain continuous batching for hybrid models")
        self.offsets = jnp.zeros((slots,), jnp.int32)
        self.toks = jnp.zeros((slots,), jnp.int32)
        self.active: List[Optional[_Request]] = [None] * slots
        self.off_host: List[int] = [0] * slots   # host mirror of offsets
        self.queue: deque = deque()
        self.chunk_fwd = chunk_forward_fn
        self.chunk_hidden_fwd = chunk_hidden_forward_fn
        self.prefill_chunk = prefill_chunk
        self._chunk_engine_inst = None
        self.spec = draft_forward_fn is not None
        self.nd = num_draft_tokens if self.spec else 0
        # per-step KV write headroom (spec rounds write nd+1 positions)
        self._reserve = self.nd + 1
        if self.spec:
            self.dfwd = draft_forward_fn
            self.dparams = draft_params
            self.d_cache = draft_init_cache_fn(slots, max_len)
            self.x_prev = jnp.zeros((slots,), jnp.int32)
            self._build_spec_jits()
        # per-slot sampling state: settings ride the jitted step as DATA
        # (one compiled program serves any greedy/sampled slot mix)
        self.sparams = SamplerParams.from_config(SamplerConfig(), slots)
        self.keys = jnp.zeros((slots, 2), jnp.uint32)
        self.recent = jnp.full((slots, REP_WINDOW), -1, jnp.int32)

        def decode_step(params, layers, offsets, toks, active, sp, keys,
                        recent):
            cache = ModelCache(layers=layers, offset=offsets)
            logits, cache = self.fwd(params, toks[:, None], cache)
            # per-row key folded with the ABSOLUTE position of the token
            # being generated (offset+1; prefill folds the prompt length):
            # deterministic under preemption/replay, no cross-step key state
            subkeys = jax.vmap(jax.random.fold_in)(keys, offsets + 1)
            nxt = sample_dynamic(logits[:, -1], subkeys, sp, recent)
            recent = jnp.roll(recent, -1, 1).at[:, -1].set(nxt)
            # inactive slots: hold offset (their KV write lands on the same
            # slot every step and is overwritten on adoption)
            offsets = jnp.where(active, offsets + 1, offsets)
            return cache.layers, offsets, nxt, recent

        self._decode = jax.jit(decode_step, donate_argnums=(1,))

        def prefill(params, tokens, real_len, layers1, sp1, key1, rec1):
            cache = ModelCache(layers=layers1, offset=jnp.zeros((), jnp.int32))
            logits, cache = self.prefill_fwd(params, tokens, cache)
            last = jax.lax.dynamic_index_in_dim(logits[0], real_len - 1, 0,
                                                keepdims=False)
            # rec1 carries generated-so-far history ([-1]-padded): fresh
            # requests pass all -1; preempted continuations pass their out
            # tail so repetition-penalty replay is exact
            tok = sample_dynamic(last[None], key1[None], sp1, rec1)[0]
            return cache.layers, tok

        self._prefill = jax.jit(prefill, donate_argnums=(3,))

        def adopt(layers, layers1, slot, offsets, toks, off_new, tok_new):
            z = jnp.zeros((), jnp.int32)

            def row(a, b):
                # every cache leaf (KV, recurrent state, conv window,
                # compressed keys) leads with batch: write the fresh
                # request's single row into this slot — hybrid models'
                # recurrent layers adopt exactly like dense KV layers
                return jax.lax.dynamic_update_slice(
                    a, b.astype(a.dtype), (slot,) + (z,) * (a.ndim - 1))

            new_layers = [jax.tree.map(row, lc, l1)
                          for lc, l1 in zip(layers, layers1)]
            offsets = offsets.at[slot].set(off_new)
            toks = toks.at[slot].set(tok_new)
            return new_layers, offsets, toks

        self._adopt = jax.jit(adopt, donate_argnums=(0,))

    # ------------------------------------------------------------ public ----

    def submit(self, rid, tokens: List[int], max_tokens: int = 128,
               stop_tokens=None, emit: Optional[Callable] = None,
               sampler: Optional[SamplerConfig] = None, seed: int = 0):
        if sampler is not None and sampler.temperature <= 0.0:
            sampler = None               # greedy is the default row state
        if sampler is not None and self.spec:
            raise ValueError(
                "speculative batcher verifies greedily; route sampled "
                "requests to the per-request engine path")
        self.queue.append(_Request(
            rid, list(tokens), max_tokens,
            stop=set(stop_tokens) if stop_tokens is not None else None,
            emit=emit, sampler=sampler, seed=seed))

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
                self._release_slot(b)
                if req.emit:
                    req.emit(None)
                return True
        return False

    def pending(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.active)

    def abort_all(self):
        """Terminate every queued and in-flight request (each emit sink gets
        its ``None``) — used by the serving thread to unblock HTTP waiters
        after an unrecoverable step error."""
        for req in list(self.queue):
            if req.emit:
                req.emit(None)
        self.queue.clear()
        for b, req in enumerate(self.active):
            if req is None:
                continue
            self.active[b] = None
            self._release_slot(b)
            if req.emit:
                req.emit(None)

    # ----------------------------------------------- adoption hooks --------
    # (overridden by PagedContinuousBatcher)

    def _prefill_layers(self, bucket: int):
        """Single-row empty cache layers for a prefill of ``bucket`` tokens."""
        return jax.tree.map(
            lambda a: a[:1] * 0, self.cache.layers,
            is_leaf=lambda x: isinstance(x, jax.Array))

    def _adopt_request(self, b: int, layers1, T: int, tok, req=None):
        layers, self.offsets, self.toks = self._adopt(
            list(self.cache.layers), layers1, jnp.int32(b), self.offsets,
            self.toks, jnp.int32(T), tok)
        self.cache = ModelCache(layers=list(layers), offset=self.offsets)

    def _release_slot(self, b: int):
        pass

    def _pre_step(self):
        pass

    def _can_adopt(self, req) -> bool:
        """Whether backing memory exists to adopt this request now
        (paged pools may be oversubscribed)."""
        return True

    def _recent_row(self, req) -> List[int]:
        """Generated-so-far history for ``req`` as a [-1]-padded
        REP_WINDOW row (non-empty only for preempted continuations)."""
        hist = list(req.out[-REP_WINDOW:])
        return [-1] * (REP_WINDOW - len(hist)) + hist

    def _run_prefill(self, req, T: int, bucket: int, padded, scfg, key):
        """Compute the adoption prefill for one request; returns the fresh
        single-row cache layers and the first sampled token. Hook point:
        the paged batcher substitutes a suffix-only prefill on a prefix-
        cache hit."""
        rec1 = jnp.asarray([self._recent_row(req)], jnp.int32)
        if self.chunk_fwd is not None and T > self.prefill_chunk:
            return self._run_prefill_chunked(T, bucket, padded, scfg, key,
                                             rec1)
        return self._prefill(
            self.params, padded, jnp.int32(T),
            self._prefill_layers(bucket),
            SamplerParams.from_config(scfg, 1),
            jax.random.fold_in(key, T), rec1)

    def _run_prefill_chunked(self, T, bucket, padded, scfg, key, rec1):
        """Long prompts prefill through the engine's chunked path (flash
        continuation chunks, bounded per-chunk compile/memory) into the
        same fresh single-row cache, then adopt as usual."""
        if self._chunk_engine_inst is None:
            from ominix_mlx_tpu.core.generate import Engine
            self._chunk_engine_inst = Engine(
                self.fwd, self.params,
                prefill_forward_fn=self.prefill_fwd,
                chunk_forward_fn=self.chunk_fwd,
                chunk_hidden_forward_fn=self.chunk_hidden_fwd)
        cache1 = ModelCache(layers=self._prefill_layers(bucket),
                            offset=jnp.zeros((), jnp.int32))
        last, cache1 = self._chunk_engine_inst.prefill_chunked(
            padded[:, :T], cache1, chunk_size=self.prefill_chunk)
        tok = sample_dynamic(last, jax.random.fold_in(key, T)[None],
                             SamplerParams.from_config(scfg, 1), rec1)[0]
        return cache1.layers, tok

    # ------------------------------------------------------------------------

    def _fill_free_slots(self):
        for b in range(self.slots):
            if self.active[b] is not None or not self.queue:
                continue
            if not self._can_adopt(self.queue[0]):
                break                 # wait for pages to free; stay queued
            req = self.queue.popleft()
            T = len(req.tokens)
            bucket = (T if self._has_recurrent
                      else min(bucket_length(T), self.max_len))
            padded = jnp.zeros((1, bucket), jnp.int32).at[0, :T].set(
                jnp.asarray(req.tokens, jnp.int32))
            scfg = req.sampler or SamplerConfig()
            key = jax.random.PRNGKey(req.seed)
            layers1, tok = self._run_prefill(req, T, bucket, padded, scfg,
                                             key)
            self._adopt_request(b, layers1, T, tok, req)
            if self.spec:
                dl1 = jax.tree.map(
                    lambda a: a[:1] * 0, self.d_cache.layers,
                    is_leaf=lambda x: isinstance(x, jax.Array))
                dl1 = self._spec_prefill(self.dparams, padded, dl1)
                dlayers = self._adopt_draft(list(self.d_cache.layers), dl1,
                                            jnp.int32(b))
                self.d_cache = ModelCache(layers=list(dlayers),
                                          offset=self.d_cache.offset)
                self.x_prev = self.x_prev.at[b].set(req.tokens[-1])
            self.sparams = self.sparams.set_row(b, scfg)
            self.keys = self.keys.at[b].set(key)
            # recent = history shifted left + the token just sampled, so a
            # preempted continuation resumes with its true rep-penalty state
            row = self._recent_row(req)[1:] + [-1]
            self.recent = self.recent.at[b].set(
                jnp.asarray(row, jnp.int32)).at[b, -1].set(tok)
            self.off_host[b] = T
            self.active[b] = req

    # ------------------------------------------------ batched speculative --

    def _build_spec_jits(self):
        nd = self.nd
        dfwd, fwd = self.dfwd, self.fwd

        def spec_round(tparams, dparams, tlayers, dlayers, offsets, toks,
                       x_prev, active):
            """One draft+verify round for ALL slots in one jit: catch-up
            [x_prev, last] re-syncs the draft cache (idempotent rewrite of
            x_prev's KV slot keeps the shape static whatever last round
            accepted), nd greedy draft steps, then the target scores
            [last, d1..dnd] per slot. Rejected drafts' KV sits beyond the
            rolled-back offset and is overwritten next round (the
            cache-as-ring trick, core/speculative.py)."""
            dc = ModelCache(layers=dlayers, offset=offsets - 1)
            catchup = jnp.stack([x_prev, toks], axis=1)          # [S, 2]
            lg, dc = dfwd(dparams, catchup, dc)
            d_tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
            if nd > 1:
                def dstep(carry, _):
                    dc, t = carry
                    lg, dc = dfwd(dparams, t[:, None], dc)
                    nt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
                    return (dc, nt), nt

                (dc, _), dts = jax.lax.scan(dstep, (dc, d_tok),
                                            length=nd - 1)
                drafts = jnp.concatenate([d_tok[:, None], dts.T], axis=1)
            else:
                drafts = d_tok[:, None]                          # [S, nd]
            tc = ModelCache(layers=tlayers, offset=offsets)
            seq = jnp.concatenate([toks[:, None], drafts], axis=1)
            logits, tc = fwd(tparams, seq, tc)
            tgt = jnp.argmax(logits, -1).astype(jnp.int32)       # [S, nd+1]
            agree = (tgt[:, :-1] == drafts).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(agree, axis=1), axis=1)  # [S]
            new_off = jnp.where(active, offsets + n_acc + 1, offsets)
            last = jnp.take_along_axis(tgt, n_acc[:, None], 1)[:, 0]
            from_draft = jnp.take_along_axis(
                drafts, jnp.maximum(n_acc - 1, 0)[:, None], 1)[:, 0]
            x_prev_new = jnp.where(n_acc > 0, from_draft, toks)
            return (tc.layers, dc.layers, new_off, last, x_prev_new, tgt,
                    n_acc)

        self._spec_round = jax.jit(spec_round, donate_argnums=(2, 3))

        def spec_prefill(dparams, tokens, layers1):
            cache = ModelCache(layers=layers1,
                               offset=jnp.zeros((), jnp.int32))
            _, cache = dfwd(dparams, tokens, cache)
            return cache.layers

        self._spec_prefill = jax.jit(spec_prefill, donate_argnums=(2,))

        def adopt_layers(layers, layers1, slot):
            z = jnp.zeros((), jnp.int32)
            out = []
            for lc, l1 in zip(layers, layers1):
                out.append(KVCache(
                    k=jax.lax.dynamic_update_slice(
                        lc.k, l1.k.astype(lc.k.dtype), (slot, z, z, z)),
                    v=jax.lax.dynamic_update_slice(
                        lc.v, l1.v.astype(lc.v.dtype), (slot, z, z, z))))
            return out

        self._adopt_draft = jax.jit(adopt_layers, donate_argnums=(0,))

    def _spec_step(self) -> List[Tuple[object, List[int]]]:
        """One speculative round for every active slot: emits the held
        token plus every accepted draft per slot (1..nd+1 tokens), holds
        the target's correction as the next round's input."""
        self._fill_free_slots()
        finished = []
        # a prompt adopted near capacity cannot survive even one round's
        # nd+1 transient writes: emit its held token and finish it now
        for b, req in enumerate(self.active):
            if req is not None and \
                    self.off_host[b] >= self.max_len - self.nd - 2:
                t = int(self.toks[b])
                stops = req.stop if req.stop is not None else \
                    self.stop_tokens
                if t not in stops and len(req.out) < req.max_tokens:
                    req.out.append(t)
                    if req.emit:
                        req.emit(t)
                finished.append((req.rid, req.out))
                if req.emit:
                    req.emit(None)
                self.active[b] = None
                self._release_slot(b)
        if not any(r is not None for r in self.active):
            return finished
        self._pre_step()
        active_mask = jnp.asarray([r is not None for r in self.active])
        cur_dev = self.toks
        (tlayers, dlayers, self.offsets, last, self.x_prev, tgt,
         n_acc) = self._spec_round(
            self.params, self.dparams, list(self.cache.layers),
            list(self.d_cache.layers), self.offsets, self.toks,
            self.x_prev, active_mask)
        self.cache = ModelCache(layers=tlayers, offset=self.offsets)
        self.d_cache = ModelCache(layers=dlayers,
                                  offset=self.d_cache.offset)
        # one transfer each (per-element int() would round-trip the tunnel
        # once PER slot, ~25ms each)
        cur = np.asarray(cur_dev).tolist()
        tgt_h = np.asarray(tgt)
        na_h = np.asarray(n_acc).tolist()
        for b, req in enumerate(self.active):
            if req is None:
                continue
            n = na_h[b]
            self.off_host[b] += n + 1
            stops = req.stop if req.stop is not None else self.stop_tokens
            # emitted this round: the held token + accepted drafts
            # (tgt[b, :n] == drafts[b, :n]); tgt[b, n] is held for next
            emitted = [cur[b]] + [int(x) for x in tgt_h[b, :n]]
            done = False
            for t in emitted:
                if t in stops:
                    done = True
                    break
                req.out.append(t)
                if req.emit:
                    req.emit(t)
                if len(req.out) >= req.max_tokens:
                    done = True
                    break
            # leave headroom for the next round's nd+1 transient writes
            if self.off_host[b] >= self.max_len - self.nd - 2:
                done = True
            if done:
                finished.append((req.rid, req.out))
                if req.emit:
                    req.emit(None)
                self.active[b] = None
                self._release_slot(b)
        self.toks = last
        return finished

    def step(self) -> List[Tuple[object, List[int]]]:
        """One decode step for every active slot; refills free slots first.
        Returns requests that FINISHED this step as (rid, tokens)."""
        if self.spec:
            return self._spec_step()
        self._fill_free_slots()
        if not any(r is not None for r in self.active):
            return []
        self._pre_step()
        active_mask = jnp.asarray([r is not None for r in self.active])
        finished = []
        cur_dev = self.toks       # previous step's result (already computed)
        layers, self.offsets, nxt, self.recent = self._decode(
            self.params, list(self.cache.layers), self.offsets, self.toks,
            active_mask, self.sparams, self.keys, self.recent)
        # fetch AFTER dispatching the next step: the device computes step
        # N+1 while the host round-trips step N's tokens — and in ONE
        # transfer (per-element int() would RPC once per slot, ~25ms each)
        cur = np.asarray(cur_dev).tolist()
        self.cache = ModelCache(layers=layers, offset=self.offsets)
        for b, req in enumerate(self.active):
            if req is None:
                continue
            self.off_host[b] += 1
            t = cur[b]
            stops = req.stop if req.stop is not None else self.stop_tokens
            done = (t in stops
                    or len(req.out) + 1 >= req.max_tokens
                    or self.off_host[b] >= self.max_len - 1)
            if t not in stops:
                req.out.append(t)
                if req.emit:
                    req.emit(t)
            if done:
                finished.append((req.rid, req.out))
                if req.emit:
                    req.emit(None)
                self.active[b] = None
                self._release_slot(b)
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


class PagedContinuousBatcher(ContinuousBatcher):
    """Continuous batching over a shared paged KV pool (core/paged_cache.py).

    Slots draw pages from one physical pool as their sequences grow instead
    of reserving slots x max_len up front, so the same HBM holds more
    in-flight sequences of mixed lengths. Page allocation is host-side; the
    per-layer page tables ride into the jitted decode as tiny int32 data
    arguments, so growth never retraces. Works with models.base-compatible
    forwards (TransformerConfig with num_layers/num_kv_heads/hd).
    """

    def __init__(self, forward_fn: Callable, params, cfg,
                 slots: int = 4, max_len: int = 2048,
                 num_pages: Optional[int] = None, page_size: int = 128,
                 stop_tokens: Tuple[int, ...] = (), dtype=jnp.bfloat16,
                 prefill_forward_fn: Optional[Callable] = None,
                 quantize_kv: bool = False, prefix_cache: bool = False,
                 chunk_forward_fn: Optional[Callable] = None,
                 chunk_hidden_forward_fn: Optional[Callable] = None,
                 draft_forward_fn: Optional[Callable] = None,
                 draft_params=None,
                 draft_init_cache_fn: Optional[Callable] = None,
                 num_draft_tokens: int = 4):
        """prefix_cache=True turns on automatic prefix caching: full pages
        of each adopted prompt are registered under a hash chain, later
        requests sharing that prefix map the SAME physical pages (ref-
        counted) and prefill only their suffix. chunk_forward_fn(params,
        tokens, cache, kv_limit) — e.g. base.forward with kv_limit= —
        makes the suffix prefill attend O(kv_limit) instead of O(capacity);
        optional (the plain forward is used otherwise)."""
        from ominix_mlx_tpu.core.paged_cache import (PageAllocator,
                                                     PagedKVCache,
                                                     PrefixCache)
        if getattr(cfg, "deltanet", None) is not None \
                or getattr(cfg, "mla", None) is not None \
                or getattr(cfg, "mixer_types", None) is not None:
            raise ValueError(
                "paged batching backs uniform GQA KV layers with one page "
                "pool; hybrid (deltanet/GLA-mixer) and MLA families use the "
                "dense continuous batcher (--batch-slots without "
                "--batch-paged)")
        assert max_len % page_size == 0, (max_len, page_size)
        self.page_size = page_size
        self.prefix = PrefixCache(page_size) if prefix_cache else None
        self._adopt_hit: List[int] = []
        self._sfx_jits: dict = {}
        self._gather_jits: dict = {}
        self._table_rep = None
        self.max_pages = max_len // page_size
        self.n_kv = cfg.num_kv_heads
        self.hd = cfg.hd
        self.num_layers = cfg.num_layers
        self.dtype = dtype
        # default pool: fully backed (+1 null page); callers shrink it to
        # oversubscribe capacity across slots
        self.num_pages = num_pages or slots * self.max_pages + 1
        self.alloc = PageAllocator(self.num_pages, page_size)
        import numpy as np
        self._np = np
        self.table = np.zeros((slots, self.max_pages), np.int32)

        def make_cache(cfg_, slots_, max_len_):
            return ModelCache(
                layers=[PagedKVCache.init(
                    slots_, self.n_kv, self.num_pages, page_size, self.hd,
                    self.max_pages, dtype, quantized=quantize_kv)
                        for _ in range(self.num_layers)],
                offset=jnp.zeros((slots_,), jnp.int32))

        super().__init__(forward_fn, params, cfg, make_cache, slots=slots,
                         max_len=max_len, stop_tokens=stop_tokens,
                         prefill_forward_fn=prefill_forward_fn,
                         draft_forward_fn=draft_forward_fn,
                         draft_params=draft_params,
                         draft_init_cache_fn=draft_init_cache_fn,
                         num_draft_tokens=num_draft_tokens,
                         chunk_forward_fn=chunk_forward_fn,
                         chunk_hidden_forward_fn=chunk_hidden_forward_fn)

        def paged_adopt(pools, k1s, v1s, page_row, offsets, toks, slot,
                        off_new, tok_new, skip=0):
            """skip > 0: a prefix-cache hit — the first ``skip`` pages of
            the prompt are already physically backed (shared), so only the
            suffix pages are written; page_row then lists suffix pages."""
            from ominix_mlx_tpu.core.paged_cache import quantize_kv_tokens
            ps = page_size
            new_pools = []
            for pool, k1, v1 in zip(pools, k1s, v1s):
                bucket = k1.shape[2] - skip * ps
                n = -(-bucket // ps)
                pad = n * ps - bucket
                def paged(a):
                    x = a[0, :, skip * ps:]                   # [n_kv,bucket,D]
                    if pad:
                        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                    return x.reshape(self.n_kv, n, ps, self.hd)
                if quantize_kv:
                    kp, vp, ksc, vsc = pool
                    kq, ks = quantize_kv_tokens(paged(k1))  # [n_kv,n,ps,D]/[..ps]
                    vq, vs = quantize_kv_tokens(paged(v1))
                    # k pages are stored transposed ([n_kv, P, D, ps])
                    kp = kp.at[:, page_row].set(
                        jnp.transpose(kq, (0, 1, 3, 2)))
                    vp = vp.at[:, page_row].set(vq)
                    ksc = ksc.at[:, page_row].set(ks)
                    vsc = vsc.at[:, page_row].set(vs)
                    new_pools.append((kp, vp, ksc, vsc))
                    continue
                kp, vp = pool
                kp = kp.at[:, page_row].set(
                    jnp.transpose(paged(k1), (0, 1, 3, 2)).astype(kp.dtype))
                vp = vp.at[:, page_row].set(paged(v1).astype(vp.dtype))
                new_pools.append((kp, vp))
            offsets = offsets.at[slot].set(off_new)
            toks = toks.at[slot].set(tok_new)
            return new_pools, offsets, toks

        self._paged_adopt = jax.jit(paged_adopt, donate_argnums=(0,),
                                    static_argnums=(9,))

    # ----------------------------------------------------------- hooks -----

    def _layers_with_table(self):
        """Rebuild layer views over the current pools + master table. Each
        layer needs its OWN device copy of the table so the decode jit can
        donate every buffer without aliasing (XLA rejects duplicate donated
        buffers) — but per-layer host->device transfers would cost one
        tunnel RPC PER LAYER per table change. One transfer + one jitted
        fan-out keeps it to two dispatches."""
        from ominix_mlx_tpu.core.paged_cache import PagedKVCache
        if self._table_rep is None:
            n = self.num_layers
            self._table_rep = jax.jit(
                lambda t: tuple(t.copy() for _ in range(n)))
        tables = self._table_rep(jnp.asarray(self.table))
        return [PagedKVCache(k_pool=lc.k_pool, v_pool=lc.v_pool,
                             page_table=tb,
                             k_scale=lc.k_scale, v_scale=lc.v_scale)
                for lc, tb in zip(self.cache.layers, tables)]

    def _sync_table(self):
        self.cache = ModelCache(layers=self._layers_with_table(),
                                offset=self.offsets)

    def _prefill_layers(self, bucket: int):
        return [KVCache.init(1, self.n_kv, bucket, self.hd, self.dtype)
                for _ in range(self.num_layers)]

    def _adopt_request(self, b: int, layers1, T: int, tok, req=None):
        ps = self.page_size
        bucket = layers1[0].k.shape[2]
        hit, self._adopt_hit = list(self._adopt_hit), []
        skip = len(hit)
        if skip:
            self.alloc.share(b, hit)       # prefix pages lead, ref-counted
        owned = self.alloc.alloc(b, T)
        n = -(-bucket // ps)
        row = self._np.zeros((n - skip,), self._np.int32)  # n > skip always:
        # skip <= (T-1)//ps < ceil(T/ps) <= ceil(bucket/ps) = n
        avail = owned[skip:n]
        row[:len(avail)] = avail
        self.table[b, :] = 0
        self.table[b, :len(owned)] = owned
        quant = self.cache.layers[0].quantized
        pools = [((lc.k_pool, lc.v_pool, lc.k_scale, lc.v_scale) if quant
                  else (lc.k_pool, lc.v_pool)) for lc in self.cache.layers]
        k1s = [l1.k for l1 in layers1]
        v1s = [l1.v for l1 in layers1]
        pools, self.offsets, self.toks = self._paged_adopt(
            pools, k1s, v1s, jnp.asarray(row), self.offsets, self.toks,
            jnp.int32(b), jnp.int32(T), tok, skip)
        if self.prefix is not None and req is not None:
            self.prefix.record(skip)
            # full pages of the prompt are immutable from here on (decode
            # writes land at positions >= T): register them for reuse
            self.prefix.register(req.tokens, owned[:T // ps], self.alloc,
                                 digests=req.chain)
        from ominix_mlx_tpu.core.paged_cache import PagedKVCache
        self.cache = ModelCache(
            layers=[PagedKVCache(k_pool=p[0], v_pool=p[1],
                                 page_table=lc.page_table,
                                 k_scale=p[2] if quant else None,
                                 v_scale=p[3] if quant else None)
                    for p, lc in zip(pools, self.cache.layers)],
            offset=self.offsets)
        self._sync_table()

    def _can_adopt(self, req) -> bool:
        T = len(req.tokens)
        need = self.alloc.pages_for(T + self._reserve)
        if need > self.num_pages - 1:
            # can never fit even an empty pool: fail it rather than stall
            bad = self.queue.popleft()
            if bad.emit:
                bad.emit(None)
            return bool(self.queue) and self._can_adopt(self.queue[0])
        hit = []
        if self.prefix is not None:
            if req.chain is None:      # hash the prompt ONCE per request
                req.chain = self.prefix.chain(req.tokens)
            hit = self.prefix.lookup(req.tokens,
                                     (T - 1) // self.page_size,
                                     digests=req.chain)
        self._adopt_hit = hit          # consumed by _run_prefill/_adopt
        need -= len(hit)
        lack = need - len(self.alloc.free)
        if lack > 0 and self.prefix is not None \
                and self.prefix.evictable(self.alloc, keep=hit) >= lack:
            self.prefix.evict(self.alloc, keep=hit, max_evict=lack)
            lack = 0
        return lack <= 0

    def _preempt(self, b: int):
        """Pool exhausted mid-decode: release this slot's pages and requeue
        the request as a continuation (prompt + tokens generated so far) so
        it re-prefills once pages free up. Replay is exact for greedy AND
        sampled decode: the per-position fold_in key schedule re-derives
        the same draw at the same absolute position."""
        req = self.active[b]
        self.active[b] = None
        self._release_slot(b)
        self.queue.append(_Request(req.rid, req.tokens + req.out,
                                   req.max_tokens, out=req.out,
                                   stop=req.stop, emit=req.emit,
                                   sampler=req.sampler, seed=req.seed))

    def _pre_step(self):
        changed = False
        for b, req in enumerate(self.active):
            if req is None:
                continue
            # reserve covers this step's KV writes (spec rounds write nd+1)
            tokens_needed = self.off_host[b] + self._reserve
            need = self.alloc.pages_for(tokens_needed)
            if len(self.alloc.owned.get(b, [])) < need:
                try:
                    owned = self._alloc_with_evict(b, tokens_needed)
                except MemoryError:
                    # oversubscribed pool: preempt this sequence instead of
                    # killing the stepping thread (the advertised mode)
                    self._preempt(b)
                    changed = True
                    continue
                self.table[b, :len(owned)] = owned
                changed = True
        if changed:
            self._sync_table()

    def _release_slot(self, b: int):
        self.alloc.release(b)
        self.table[b, :] = 0
        self._sync_table()

    def _alloc_with_evict(self, slot: int, n_tokens: int):
        """alloc() that reclaims LRU prefix-cache pages before giving up
        (cache-only pages are disposable capacity, not reservations)."""
        try:
            return self.alloc.alloc(slot, n_tokens)
        except MemoryError:
            if self.prefix is None:
                raise
            lack = (self.alloc.pages_for(n_tokens)
                    - len(self.alloc.owned.get(slot, []))
                    - len(self.alloc.free))
            if self.prefix.evict(self.alloc, max_evict=lack) < lack:
                raise
            return self.alloc.alloc(slot, n_tokens)

    # ------------------------------------------------ prefix caching -------

    def _run_prefill(self, req, T: int, bucket: int, padded, scfg, key):
        hit = self._adopt_hit
        if not hit:
            return super()._run_prefill(req, T, bucket, padded, scfg, key)
        L = len(hit) * self.page_size
        layers1 = self._gather_prefix_into(self._prefill_layers(bucket), hit)
        sfx = padded[:, L:]
        f = self._suffix_jit(L, bucket)
        return f(self.params, sfx, jnp.int32(T), layers1,
                 SamplerParams.from_config(scfg, 1),
                 jax.random.fold_in(key, T),
                 jnp.asarray([self._recent_row(req)], jnp.int32))

    def _gather_prefix_into(self, layers1, hit):
        """Dequantize/copy the shared prefix pages into positions [0:L] of
        the fresh single-row prefill cache so the suffix forward attends
        them. One jit per (n_hit, bucket) shape pair."""
        nh = len(hit)
        bucket = layers1[0].k.shape[2]
        quant = self.cache.layers[0].quantized
        jkey = (nh, bucket)
        f = self._gather_jits.get(jkey)
        if f is None:
            ps, n_kv, hd = self.page_size, self.n_kv, self.hd

            def gather(layers1, pools, pids):
                out = []
                for l1, pool in zip(layers1, pools):
                    if quant:
                        kp, vp, ks, vs = pool
                        km = jnp.transpose(kp[:, pids], (0, 1, 3, 2))
                        vm = vp[:, pids]               # [n_kv, nh, ps, D]
                        km = km.astype(jnp.float32) * ks[:, pids][..., None]
                        vm = vm.astype(jnp.float32) * vs[:, pids][..., None]
                    else:
                        kp, vp = pool
                        km = jnp.transpose(kp[:, pids], (0, 1, 3, 2))
                        vm = vp[:, pids]
                    km = km.reshape(n_kv, nh * ps, hd)
                    vm = vm.reshape(n_kv, nh * ps, hd)
                    out.append(KVCache(
                        k=l1.k.at[0, :, :nh * ps].set(km.astype(l1.k.dtype)),
                        v=l1.v.at[0, :, :nh * ps].set(vm.astype(l1.v.dtype))))
                return out

            f = jax.jit(gather, donate_argnums=(0,))
            self._gather_jits[jkey] = f
        quant = self.cache.layers[0].quantized
        pools = [((lc.k_pool, lc.v_pool, lc.k_scale, lc.v_scale) if quant
                  else (lc.k_pool, lc.v_pool)) for lc in self.cache.layers]
        return f(layers1, pools, jnp.asarray(hit, jnp.int32))

    def _suffix_jit(self, L: int, bucket: int):
        """Suffix prefill at offset L over a cache whose [0:L] region holds
        the gathered prefix. kv_limit = bucket keeps attention O(bucket)
        via the chunk forward when available."""
        f = self._sfx_jits.get((L, bucket))
        if f is None:
            chunk_fwd, fwd = self.chunk_fwd, self.fwd

            def suffix(params, toks_sfx, real_T, layers1, sp1, key1, rec1):
                cache = ModelCache(layers=layers1,
                                   offset=jnp.full((), L, jnp.int32))
                if chunk_fwd is not None:
                    logits, cache = chunk_fwd(params, toks_sfx, cache,
                                              bucket)
                else:
                    logits, cache = fwd(params, toks_sfx, cache)
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], real_T - 1 - L, 0, keepdims=False)
                tok = sample_dynamic(last[None], key1[None], sp1, rec1)[0]
                return cache.layers, tok

            f = jax.jit(suffix, donate_argnums=(3,))
            self._sfx_jits[(L, bucket)] = f
        return f
