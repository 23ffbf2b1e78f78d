"""Speculative decoding: draft proposes, target verifies in one forward.

TPU-native counterpart of reference ``SpeculativeGenerate``
(mlx-rs-core/src/speculative.rs:32-190): the draft model emits
``num_draft_tokens`` greedily, the target scores the previous token plus all
drafts in ONE forward, and the longest agreeing prefix is accepted (plus the
target's own next token — so every round yields >= 1 token).

Static-shape design (no MLX dynamic graphs): both caches are fixed-capacity;
a rejected draft's KV entries simply sit beyond ``offset`` and get
overwritten on the next round — rollback is just not advancing the offset
(the cache-as-ring trick from core/cache.py). The only host<->device sync
per round is fetching the accepted-token vector.

Also generalizes to the reference's minicpm *self*-speculative early-exit
mode (minicpm-sala-mlx/src/speculative.rs:1-40) by passing a draft forward
that runs the first N layers of the same params.

Recurrent (GLA) layers: offset rollback cannot un-ingest rejected drafts
from a recurrent state. This matches the REFERENCE's own semantics — its
trim_caches only adjusts the lightning offset and leaves the state
contaminated, "the contamination from rejected tokens decays
exponentially" (minicpm-sala-mlx/src/speculative.rs:125-139) — so
self-speculative decoding on hybrid models is approximate-by-design in
both frameworks. Exact-output speculative decoding (dense/MLA caches) is
what the continuous batcher exposes; it refuses recurrent layers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp

import numpy as np

from ominix_mlx_tpu.core.cache import ModelCache


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0


class SpeculativeEngine:
    def __init__(self, target_forward: Callable, target_params,
                 draft_forward: Callable, draft_params,
                 num_draft_tokens: int = 4, force_accept: bool = False):
        self.tf, self.tp = target_forward, target_params
        self.df, self.dp = draft_forward, draft_params
        self.nd = num_draft_tokens
        # benchmarking only: pretend every draft verifies (all compute still
        # runs) — measures the pipeline's acceptance=1 throughput ceiling
        # with a given draft size, which real acceptance rates scale down
        self.force_accept = force_accept
        self._draft_jit = jax.jit(self._draft_impl, donate_argnums=(1,))
        self._verify_jit = jax.jit(self._verify_impl, donate_argnums=(1,))
        self._prefill_t = jax.jit(self.tf, donate_argnums=(2,))
        self._prefill_d = jax.jit(self.df, donate_argnums=(2,))

    def _draft_impl(self, params, cache, catchup):
        """Ingest the 2-token catch-up [x_prev, last] (x_prev rewrites its
        own KV slot idempotently — this keeps the shape static whether the
        previous round accepted all drafts or not), then greedy-draft nd
        tokens. Returns ([1, nd] tokens, cache)."""
        logits, cache = self.df(params, catchup, cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        def step(carry, _):
            cache, tok = carry
            lg, cache = self.df(params, tok[:, None], cache)
            nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
            return (cache, nxt), nxt

        (cache, _), toks = jax.lax.scan(step, (cache, tok),
                                        length=self.nd - 1)
        drafts = jnp.concatenate([tok[:, None], toks.T], axis=1)
        return drafts, cache

    def _verify_impl(self, params, cache, last_token, draft_tokens):
        """Score [last, d1..dnd] in one forward; greedy targets per position.

        Returns (target_tokens [1, nd+1], n_accept scalar, cache rolled back
        to offset + n_accept + 1).
        """
        seq = jnp.concatenate([last_token[:, None], draft_tokens], axis=1)
        start = cache.offset
        logits, cache = self.tf(params, seq, cache)
        tgt = jnp.argmax(logits, -1).astype(jnp.int32)       # [1, nd+1]
        agree = (tgt[:, :-1] == draft_tokens)[0]
        n_accept = jax.lax.fori_loop(
            0, self.nd,
            lambda i, n: jnp.where((i == n) & agree[i], n + 1, n), 0)
        if self.force_accept:
            n_accept = jnp.int32(self.nd)
        # rollback: keep KV only for last_token + accepted drafts
        cache = ModelCache(layers=cache.layers,
                           offset=start + n_accept + 1)
        return tgt, n_accept, cache

    def generate(self, prompt: jax.Array, t_cache: ModelCache,
                 d_cache: ModelCache, max_tokens: int = 256,
                 stop_tokens: tuple = (),
                 stats: Optional[SpecStats] = None) -> Iterator[int]:
        if prompt.ndim == 1:
            prompt = prompt[None]
        caps = [lc.max_len for lc in t_cache.layers
                if hasattr(lc, "max_len")]
        if caps and prompt.shape[1] + max_tokens + self.nd + 1 > min(caps):
            # a verify round writes nd+1 transient KV entries; past capacity
            # the dynamic_update_slice would clamp and corrupt real slots
            raise ValueError(
                f"prompt ({prompt.shape[1]}) + max_tokens ({max_tokens}) + "
                f"draft headroom ({self.nd + 1}) exceeds KV cache capacity "
                f"{min(caps)}")
        # prefill both models on the full prompt
        t_logits, t_cache = self._prefill_t(self.tp, prompt, t_cache)
        _, d_cache = self._prefill_d(self.dp, prompt, d_cache)
        last = jnp.argmax(t_logits[:, -1], -1).astype(jnp.int32)
        x_prev = prompt[:, -1]   # token whose KV slot precedes `last`

        produced = 0
        t = int(last[0])
        if t in stop_tokens:
            return
        yield t
        produced += 1

        while produced < max_tokens:
            # invariant: target offset o = position of `last`;
            # draft has valid KV through o-1 (x_prev's slot)
            d_cache = ModelCache(layers=d_cache.layers,
                                 offset=t_cache.offset - 1)
            catchup = jnp.concatenate([x_prev[:, None], last[:, None]], 1)
            draft, d_cache = self._draft_jit(self.dp, d_cache, catchup)
            tgt, n_acc, t_cache = self._verify_jit(self.tp, t_cache, last,
                                                   draft)
            n = int(n_acc)
            if stats is not None:
                stats.rounds += 1
                stats.drafted += self.nd
                stats.accepted += n
            # emitted tokens: accepted drafts + the target's correction —
            # fetched in ONE transfer (per-element int() costs a ~25ms
            # tunnel RPC each); stop tokens are not emitted
            toks = np.asarray(tgt[0, :n + 1]).tolist()
            stop = False
            for t in toks:
                if t in stop_tokens:
                    stop = True
                    break
                yield t
                produced += 1
                if produced >= max_tokens:
                    stop = True
                    break
            if stop:
                break
            x_prev = last if n == 0 else draft[:, n - 1]
            last = tgt[:, n]

    # ------------------------------------------------ on-device round loop --

    def generate_scan(self, prompt: jax.Array, t_cache: ModelCache,
                      d_cache: ModelCache, max_tokens: int = 256,
                      stop_tokens: tuple = (),
                      stats: Optional[SpecStats] = None):
        """Speculative decode as jitted scans over rounds: every round
        drafts nd tokens, verifies them in one target forward, rolls the
        caches back by offset arithmetic, and appends the accepted prefix +
        correction into a token buffer at a traced write position. Zero
        host round-trips inside a chunk — the TPU-native form of the
        reference's async_eval-pipelined speculative loop
        (speculative.rs:113-190).

        The host loops CHUNKS of rounds until max_tokens tokens are out or
        a stop token lands: with real acceptance < 1 a single fixed round
        count would silently under-produce (each round only yields
        n_accept+1 tokens). Returns (tokens list, rounds run).
        """
        if prompt.ndim == 1:
            prompt = prompt[None]
        T = prompt.shape[1]
        caps = [lc.max_len for lc in t_cache.layers
                if hasattr(lc, "max_len")]
        cap = min(caps) if caps else None

        t_cache, d_cache, last, x_prev = self._spec_prefill_jit(
            self.tp, self.dp, prompt, t_cache, d_cache)

        out = []
        stopped = False

        def take(toks) -> bool:
            nonlocal stopped
            for t in toks:
                if t in stop_tokens:
                    stopped = True
                    return True
                out.append(t)
                if len(out) >= max_tokens:
                    stopped = True
                    return True
            return False

        take([int(last[0])])
        total_rounds = 0
        first_rounds = -(-max_tokens // (self.nd + 1)) + 1
        while not stopped:
            # FIXED chunk sizes (first chunk sized for acceptance=1, then a
            # constant catch-up chunk): each distinct round count is its own
            # jit compile, so sizing chunks by the exact remainder would
            # compile a fresh program per chunk (30-90s each on the TPU)
            rounds = first_rounds if total_rounds == 0 \
                else max(2, first_rounds // 4)
            if cap is not None:
                # keep every transient verify write (offset + nd + 1) inside
                # the cache; offset tracks T + len(out) exactly
                safe = (cap - (T + len(out)) - (self.nd + 2)) // (self.nd + 1)
                if safe < 1:
                    break
                rounds = min(rounds, safe)
            run = self._rounds_jit(rounds)
            buf, n_out, accepted, t_cache, d_cache, last, x_prev = run(
                self.tp, self.dp, t_cache, d_cache, last, x_prev)
            total_rounds += rounds
            if stats is not None:
                stats.rounds += rounds
                stats.drafted += rounds * self.nd
                stats.accepted += int(accepted)
            take([int(x) for x in np.asarray(buf[:int(n_out)])])
        return out, total_rounds

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnums=(4, 5))
    def _spec_prefill_jit(self, tp, dp, prompt, t_cache, d_cache):
        t_logits, t_cache = self.tf(tp, prompt, t_cache)
        _, d_cache = self.df(dp, prompt, d_cache)
        last = jnp.argmax(t_logits[:, -1], -1).astype(jnp.int32)
        return t_cache, d_cache, last, prompt[:, -1]

    def _rounds_jit(self, rounds: int):
        """Jitted chunk of ``rounds`` speculative rounds resuming from
        (caches, last, x_prev); memoized per round count."""
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        fn = cache.get(rounds)
        if fn is not None:
            return fn

        def run(tp, dp, t_cache, d_cache, last, x_prev):
            buf = jnp.zeros((rounds * (self.nd + 1) + self.nd + 2,),
                            jnp.int32)

            def round_fn(carry, _):
                t_cache, d_cache, last, x_prev, buf, n_out, acc = carry
                d_cache = ModelCache(layers=d_cache.layers,
                                     offset=t_cache.offset - 1)
                catchup = jnp.concatenate([x_prev[:, None], last[:, None]],
                                          1)
                draft, d_cache = self._draft_impl(dp, d_cache, catchup)
                tgt, n_acc, t_cache = self._verify_impl(tp, t_cache, last,
                                                        draft)
                buf = jax.lax.dynamic_update_slice(buf, tgt[0], (n_out,))
                x_prev = jnp.where(
                    n_acc > 0,
                    jax.lax.dynamic_index_in_dim(draft[0],
                                                 jnp.maximum(n_acc - 1, 0),
                                                 keepdims=False),
                    last[0])[None]
                last = jax.lax.dynamic_index_in_dim(tgt[0], n_acc,
                                                    keepdims=False)[None]
                return (t_cache, d_cache, last, x_prev, buf,
                        n_out + n_acc + 1, acc + n_acc), ()

            (t_cache, d_cache, last, x_prev, buf, n_out, acc), _ = \
                jax.lax.scan(
                    round_fn,
                    (t_cache, d_cache, last, x_prev, buf, jnp.int32(0),
                     jnp.int32(0)),
                    length=rounds)
            return buf, n_out, acc, t_cache, d_cache, last, x_prev

        fn = jax.jit(run, donate_argnums=(2, 3))
        cache[rounds] = fn
        return fn
