"""Generation engine: jitted prefill / decode-step with fused sampling.

TPU-native re-design of the reference's typestate ``Generate`` iterator +
``GenerateToken`` Prefill->Decode state machine (reference:
mlx-rs-core/src/generate/mod.rs:18-196, generate_token.rs:10-33) and the
async_eval one-token-lookahead pipelining (qwen3-mlx/src/model.rs:817-833,
worth +22% on the reference).

On TPU the equivalents are:
  - lazy graph + async_eval  ->  jit + JAX async dispatch (tokens are fetched
    with a one-step lag so the host sees step N-1 while the device runs N)
  - growth-by-256 cache      ->  fixed-capacity donated cache buffers
  - per-token sampling on host -> sampling fused into the jitted decode step
  - whole-prompt prefill     ->  bucketed (power-of-2 padded) prefill so a
    prompt-length change does not recompile; padded tail slots are masked by
    offset bookkeeping and overwritten by subsequent decode steps
  - for max throughput, ``generate_scan`` runs K decode steps inside one
    lax.scan (zero host round-trips), used by benchmarks and batch serving.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.cache import ModelCache
from ominix_mlx_tpu.core.sampling import SamplerConfig, sample


def bucket_length(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _kv_capacity(cache: ModelCache):
    """Max KV length across layers; None for pure-recurrent models."""
    caps = [lc.max_len for lc in cache.layers if hasattr(lc, "max_len")]
    return min(caps) if caps else None


@dataclasses.dataclass
class GenerationStats:
    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_time_s: float = 0.0
    decode_time_s: float = 0.0

    @property
    def decode_tps(self) -> float:
        return self.generated_tokens / self.decode_time_s if self.decode_time_s else 0.0

    @property
    def prefill_tps(self) -> float:
        return self.prompt_tokens / self.prefill_time_s if self.prefill_time_s else 0.0


class Engine:
    """Wraps a model ``forward(params, tokens, cache) -> (logits, cache)``.

    The same engine drives every AR model family (LLM, VLM decoder, TTS
    talker, T2S), like the reference's generic ``Generate`` over
    ``Module<I>``.
    """

    def __init__(self, forward_fn: Callable, params,
                 sampler: SamplerConfig = SamplerConfig(),
                 prefill_forward_fn: Optional[Callable] = None,
                 chunk_forward_fn: Optional[Callable] = None,
                 chunk_hidden_forward_fn: Optional[Callable] = None):
        """prefill_forward_fn: variant used for the FIRST prefill on an empty
        cache (e.g. base.forward with fresh_prefill=True to enable the Pallas
        flash-attention path). Defaults to forward_fn.

        chunk_forward_fn(params, tokens, cache, kv_limit): variant for
        CONTINUATION chunks of a long prefill that attends only the first
        ``kv_limit`` cache slots (base.forward's kv_limit) — O(written)
        instead of O(capacity) per chunk.

        chunk_hidden_forward_fn: like chunk_forward_fn but its first return
        value is ignored (e.g. base.forward with skip_logits=True). Used for
        NON-FINAL chunks, whose logits are discarded — skips the lm_head
        matmul and the [T, V] logits write per chunk."""
        self.forward_fn = forward_fn
        self.prefill_forward_fn = prefill_forward_fn or forward_fn
        self.chunk_forward_fn = chunk_forward_fn
        self.chunk_hidden_forward_fn = chunk_hidden_forward_fn
        self.params = params
        self.sampler = sampler
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(2,),
                                    static_argnames=("fresh",))
        self._decode_jit = jax.jit(self._decode_impl, donate_argnums=(1,),
                                   static_argnames=("sampler",))
        self._chunk_jits: dict = {}
        self._batch_jits: dict = {}

    # --- jitted bodies ---------------------------------------------------

    def _prefill_impl(self, params, tokens, cache, real_len, fresh=False):
        """tokens: [B, T_bucket]; real_len: scalar actual prompt length.

        Padded tail positions write garbage KV beyond ``offset + real_len``;
        the offset is advanced by ``real_len`` only, so decode overwrites
        those slots and the causal mask never exposes them.
        """
        start = cache.offset
        fn = self.prefill_forward_fn if fresh else self.forward_fn
        logits, cache = fn(params, tokens, cache)
        cache = ModelCache(layers=cache.layers, offset=start + real_len)
        B = tokens.shape[0]
        last = jax.vmap(lambda lg: jax.lax.dynamic_index_in_dim(
            lg, real_len - 1, axis=0, keepdims=False))(logits)
        return last, cache

    def _decode_impl(self, params, cache, token, key, recent, sampler):
        logits, cache = self.forward_fn(params, token[:, None], cache)
        logits = logits[:, -1]
        tok = sample(logits, key, sampler, recent)
        if sampler.repetition_penalty != 1.0:
            recent = jnp.roll(recent, -1, axis=-1).at[:, -1].set(tok)
        return tok, logits, cache, recent

    # --- public API --------------------------------------------------------

    def prefill(self, tokens: jax.Array, cache: ModelCache,
                fresh: bool = True):
        """tokens: [B, T] -> (last_logits [B, V], cache).

        fresh=True (default) asserts the cache is empty, routing through
        prefill_forward_fn (flash-attention path). Pass False when resuming
        a non-empty cache (multi-turn chunked prefill)."""
        B, T = tokens.shape
        cap = _kv_capacity(cache)
        if cap is not None and T > cap:
            raise ValueError(
                f"prompt length {T} exceeds KV cache capacity {cap}; "
                f"create the cache with a larger max_len")
        from ominix_mlx_tpu.core.cache import ingests_padding
        if any(ingests_padding(lc) for lc in cache.layers):
            # recurrent/hybrid layers ingest every position into their state,
            # so padded bucketing would corrupt it — prefill exact length
            # (one retrace per prompt length; KV-only models keep buckets)
            bucket = T
        else:
            bucket = min(bucket_length(T), cap)
            from ominix_mlx_tpu.core.cache import RotatingKVCache
            if not fresh and not any(isinstance(lc, RotatingKVCache)
                                     for lc in cache.layers):
                # resuming a partly-full cache: a padded bucket overflowing
                # capacity would make the KV write's dynamic_update_slice
                # CLAMP its start index and silently overwrite real slots
                # (rotating caches wrap by design). offset is concrete here
                # (prefill is host code), so exact-fit to the free tail.
                free = cap - int(cache.offset)
                if T > free:
                    raise ValueError(
                        f"prompt length {T} exceeds the cache's remaining "
                        f"capacity {free} (offset {int(cache.offset)} of "
                        f"{cap}); create the cache with a larger max_len")
                bucket = min(bucket, free)
        padded = jnp.pad(tokens, ((0, 0), (0, bucket - T)))
        return self._prefill_jit(self.params, padded, cache,
                                 jnp.int32(T), fresh=fresh)

    def _chunk_jit(self, kv_limit: int, final: bool = True):
        hidden_fn = self.chunk_hidden_forward_fn if not final else None
        key = (kv_limit, hidden_fn is not None)
        fn = self._chunk_jits.get(key)
        if fn is None:
            def impl(params, tokens, cache, real_len):
                start = cache.offset
                fwd = hidden_fn or self.chunk_forward_fn
                logits, cache = fwd(params, tokens, cache, kv_limit)
                cache = ModelCache(layers=cache.layers,
                                   offset=start + real_len)
                if hidden_fn is not None:
                    # non-final chunk: only the KV writes matter
                    return None, cache
                last = jax.vmap(lambda lg: jax.lax.dynamic_index_in_dim(
                    lg, real_len - 1, axis=0, keepdims=False))(logits)
                return last, cache

            fn = jax.jit(impl, donate_argnums=(2,))
            self._chunk_jits[key] = fn
        return fn

    def prefill_chunked(self, tokens: jax.Array, cache: ModelCache,
                        chunk_size: int = 512):
        """Long-prompt prefill in fixed chunks: bounds per-step compile size
        and attention memory (SURVEY.md hard part (a)). Only the chunk
        shapes (chunk_size + one tail bucket) ever compile.

        The first chunk rides the flash path; continuation chunks attend a
        STATIC kv_limit prefix of the cache (when the engine has a
        chunk_forward_fn) so each chunk costs O(tokens written so far), not
        O(cache capacity)."""
        B, T = tokens.shape
        cap = _kv_capacity(cache)
        # recurrent/hybrid layers ingest every position into their state, so
        # chunks must be EXACT-width (intermediate chunks are all chunk_size
        # anyway; only the tail costs one extra compile)
        from ominix_mlx_tpu.core.cache import ingests_padding
        exact = any(ingests_padding(lc) for lc in cache.layers)
        last = None
        pos = 0
        while pos < T:
            end = min(pos + chunk_size, T)
            if pos == 0 or self.chunk_forward_fn is None:
                last, cache = self.prefill(tokens[:, pos:end], cache,
                                           fresh=(pos == 0))
            else:
                # pad to the chunk size, but never past capacity: a padded
                # window overflowing the cache would make the KV write's
                # dynamic_update_slice CLAMP its start index and silently
                # overwrite real slots. Exact-fit padding also preserves
                # the flash chunk contract kv_limit == chunk start + T.
                real = end - pos
                width = real if exact else chunk_size
                if cap is not None:
                    width = min(width, cap - pos)
                padded = jnp.pad(tokens[:, pos:end],
                                 ((0, 0), (0, width - real)))
                out, cache = self._chunk_jit(pos + width, final=end >= T)(
                    self.params, padded, cache, jnp.int32(real))
                if out is not None:
                    last = out
            pos = end
        return last, cache

    def generate(self, prompt: jax.Array, cache: ModelCache,
                 max_tokens: int = 256,
                 stop_tokens: tuple = (),
                 key: Optional[jax.Array] = None,
                 stats: Optional[GenerationStats] = None,
                 ) -> Iterator[int]:
        """Streaming per-token generation (single sequence, B=1).

        Pipelined: the sampled-token fetch lags one step behind dispatch, so
        host-side work (detokenize, stop check) overlaps device execution —
        the JAX-native form of the reference's async_eval lookahead.
        """
        if prompt.ndim == 1:
            prompt = prompt[None]
        B = prompt.shape[0]
        cap = _kv_capacity(cache)
        # resuming a non-empty cache: count its history against capacity
        # and route prefill through the non-flash path (fresh_prefill
        # attends ONLY the fresh tokens)
        off = (int(cache.offset)
               if getattr(cache.offset, "ndim", 0) == 0 else 0)
        if cap is not None and off + prompt.shape[1] + max_tokens > cap:
            # decode past capacity would make dynamic_update_slice clamp its
            # start index and silently overwrite the last KV slot
            raise ValueError(
                f"offset ({off}) + prompt ({prompt.shape[1]}) + max_tokens "
                f"({max_tokens}) exceeds KV cache capacity {cap}")
        if key is None:
            key = jax.random.PRNGKey(0)
        recent = jnp.full((B, self.sampler.repetition_context), -1, jnp.int32)

        t0 = time.perf_counter()
        logits, cache = self.prefill(prompt, cache, fresh=(off == 0))
        key, sub = jax.random.split(key)
        tok = sample(logits, sub, self.sampler, recent)
        # the prefill-sampled token joins the repetition-penalty window
        # (it would otherwise permanently escape the penalty)
        recent = recent.at[:, -1].set(tok)
        pending_host = None
        if stats is not None:
            # block_until_ready is a no-op through the TPU tunnel — time
            # prefill by FETCHING the first token and reuse the value below
            pending_host = int(tok[0])
            stats.prompt_tokens = int(prompt.shape[1])
            stats.prefill_time_s = time.perf_counter() - t0

        pending = tok  # device array, not yet fetched
        n = 0
        td0 = time.perf_counter()
        for i in range(max_tokens):
            key, sub = jax.random.split(key)
            if i + 1 < max_tokens:
                nxt, _, cache, recent = self._decode_jit(
                    self.params, cache, pending, sub, recent,
                    sampler=self.sampler)
            else:
                nxt = None
            # fetch step i while step i+1 runs
            t = pending_host if pending_host is not None else int(pending[0])
            pending_host = None
            n += 1
            if t in stop_tokens:
                break
            yield t
            if nxt is None:
                break
            pending = nxt
        if stats is not None:
            stats.generated_tokens = n
            stats.decode_time_s = time.perf_counter() - td0

    def generate_batch(self, prompts: jax.Array, cache: ModelCache,
                       max_tokens: int = 256, stop_tokens: tuple = (),
                       pad_id: int = 0,
                       key: Optional[jax.Array] = None,
                       prompt_lengths=None):
        """Batched decode with per-sequence finish flags (reference:
        minicpm-sala-mlx/examples/batch_generate.rs:62-84).

        prompts: [B, T] RIGHT-padded to a common width; ``prompt_lengths``
        [B] gives each row's true length (None = all rows are length T).
        Right padding keeps every real token at its true RoPE position and
        the pads' garbage KV beyond each row's offset, where the causal
        mask never exposes it and decode overwrites it — decode then runs
        at per-row vector offsets. Returns (tokens [B, max_tokens] with
        pad_id after each EOS, lengths [B])."""
        B, T = prompts.shape
        if key is None:
            key = jax.random.PRNGKey(0)
        lengths = (jnp.full((B,), T, jnp.int32) if prompt_lengths is None
                   else jnp.asarray(prompt_lengths, jnp.int32))
        stops = jnp.asarray(list(stop_tokens) or [-1], jnp.int32)
        fn = self._batch_jits.get(max_tokens)
        if fn is None:
            sampler = self.sampler

            # NOTE: no cache donation here — the final cache is not
            # returned, so a donated input would have no aliasing target
            # (XLA warns "donated buffers were not usable")
            def run(params, prompts, cache, lengths, stops, pad, key):
                logits, cache = self.prefill_forward_fn(params, prompts,
                                                        cache)
                cache = ModelCache(layers=cache.layers, offset=lengths)
                last = jax.vmap(lambda lg, n: jax.lax.dynamic_index_in_dim(
                    lg, n - 1, axis=0, keepdims=False))(logits, lengths)
                key, sub = jax.random.split(key)
                tok = sample(last, sub, sampler)

                def step(carry, _):
                    cache, tok, done, key = carry
                    key, sub = jax.random.split(key)
                    lg, cache = self.forward_fn(params, tok[:, None], cache)
                    nxt = sample(lg[:, -1], sub, sampler)
                    done = done | jnp.any(tok[:, None] == stops[None], -1)
                    out = jnp.where(done, pad, tok)
                    nxt = jnp.where(done, tok, nxt)
                    # finished rows hold their offset (writes overwrite one
                    # garbage slot); live rows advance
                    cache = ModelCache(
                        layers=cache.layers,
                        offset=jnp.where(done, cache.offset - 1,
                                         cache.offset))
                    return (cache, nxt, done, key), (out, done)

                (_, _, _, _), (toks, dones) = jax.lax.scan(
                    step, (cache, tok, jnp.zeros((B,), bool), key),
                    length=max_tokens)
                return toks.T, (~dones.T).sum(-1)

            fn = jax.jit(run)
            self._batch_jits[max_tokens] = fn
        return fn(self.params, prompts, cache, lengths, stops,
                  jnp.int32(pad_id), key)

    def generate_scan(self, prompt: jax.Array, cache: ModelCache,
                      max_tokens: int, key: Optional[jax.Array] = None):
        """Fixed-length generation with the decode loop inside lax.scan.

        Zero host round-trips between tokens — the TPU upper bound for
        decode throughput. Returns (tokens [B, max_tokens], cache).
        """
        if prompt.ndim == 1:
            prompt = prompt[None]
        cap = _kv_capacity(cache)
        if cap is not None and prompt.shape[1] + max_tokens > cap:
            raise ValueError(
                f"prompt ({prompt.shape[1]}) + max_tokens ({max_tokens}) "
                f"exceeds KV cache capacity {cap}")
        if key is None:
            key = jax.random.PRNGKey(0)
        logits, cache = self.prefill(prompt, cache)
        key, sub = jax.random.split(key)
        tok = sample(logits, sub, self.sampler)
        return self._scan_jit(self.params, cache, tok, key, max_tokens)

    @functools.partial(jax.jit, static_argnames=("self", "max_tokens"),
                       donate_argnums=(2,))
    def _scan_jit(self, params, cache, tok, key, max_tokens):
        sampler = self.sampler

        def step(carry, _):
            cache, tok, key = carry
            key, sub = jax.random.split(key)
            logits, cache = self.forward_fn(params, tok[:, None], cache)
            nxt = sample(logits[:, -1], sub, sampler)
            return (cache, nxt, key), tok

        (cache, _, _), toks = jax.lax.scan(
            step, (cache, tok, key), length=max_tokens)
        return toks.T, cache
