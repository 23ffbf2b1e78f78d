"""Samplers: argmax / temperature / top-k / top-p / min-p / repetition penalty.

Union of the reference's sampling surfaces: the core ``DefaultSampler``
(argmax at temp 0, else scaled categorical — mlx-rs-core/src/sampler.rs:3-19),
GPT-SoVITS top-k/top-p/repetition-penalty (gpt-sovits-mlx/src/sampling.rs),
and qwen3-tts EOS steering/suppression masks (qwen3-tts-mlx/src/sampling.rs).

Everything is a pure jittable function of (logits, key, params) so it can be
fused into the decode step (no host round-trip between logits and token).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 0.0
    top_k: int = 0              # 0 = off
    top_p: float = 1.0          # 1.0 = off
    min_p: float = 0.0          # 0.0 = off
    repetition_penalty: float = 1.0
    repetition_context: int = 64


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals = jax.lax.top_k(logits, k)[0]
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, -jnp.inf, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top one)
    keep_sorted = cum - probs < p
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < min_p * top, -jnp.inf, logits)


def apply_repetition_penalty(logits: jax.Array, recent_tokens: jax.Array,
                             penalty: float) -> jax.Array:
    """Penalize logits of recently-generated tokens.

    recent_tokens: [B, W] int32, padded with -1 for empty slots.
    Matches gpt-sovits-mlx/src/sampling.rs semantics: positive logits are
    divided by the penalty, negative multiplied.
    """
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    valid = recent_tokens >= 0
    tok = jnp.where(valid, recent_tokens, 0)
    onehot_any = jax.vmap(
        lambda t, m: jnp.zeros((V,), jnp.bool_).at[t].max(m)
    )(tok, valid)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(onehot_any, penalized, logits)


def sample(logits: jax.Array, key: Optional[jax.Array],
           cfg: SamplerConfig,
           recent_tokens: Optional[jax.Array] = None) -> jax.Array:
    """logits: [B, V] -> tokens [B] int32. Pure & jittable."""
    logits = logits.astype(jnp.float32)
    if recent_tokens is not None and cfg.repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, recent_tokens,
                                          cfg.repetition_penalty)
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    logits = apply_top_k(logits, cfg.top_k)
    logits = apply_top_p(logits, cfg.top_p)
    logits = apply_min_p(logits, cfg.min_p)
    assert key is not None, "stochastic sampling requires a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def apply_eos_steering(logits: jax.Array, eos_id: int, step: jax.Array,
                       min_steps: int, max_steps: int,
                       boost: float = 8.0) -> jax.Array:
    """EOS suppression/steering for AR audio decoders (reference:
    qwen3-tts-mlx/src/sampling.rs + generate.rs:22): forbid EOS before
    min_steps, increasingly boost it approaching max_steps."""
    logits = logits.astype(jnp.float32)
    suppress = step < min_steps
    ramp = jnp.clip((step - 0.8 * max_steps) / (0.2 * max_steps + 1e-6),
                    0.0, 1.0) * boost
    delta = jnp.where(suppress, -jnp.inf, ramp)
    return logits.at[..., eos_id].add(delta)


# -------------------------------------------------- dynamic (traced) form ----

@dataclasses.dataclass
class SamplerParams:
    """Per-row sampler settings as ARRAYS — a jit operand, not a static
    config. One compiled decode step serves every (temperature, top-k,
    top-p, ...) combination and every per-slot mix in the continuous
    batcher; changing a sampler setting never re-traces (the reference
    rebuilds its sampler closure per request, mlx-rs-core/src/sampler.rs —
    free on CPU, 30-90s per recompile through the TPU tunnel)."""
    temperature: jax.Array       # [B] f32; <= 0 -> greedy
    top_k: jax.Array             # [B] i32; 0 -> off
    top_p: jax.Array             # [B] f32; 1.0 -> off
    min_p: jax.Array             # [B] f32; 0.0 -> off
    repetition_penalty: jax.Array  # [B] f32; 1.0 -> off

    @staticmethod
    def from_config(cfg: SamplerConfig, batch: int = 1) -> "SamplerParams":
        f = lambda v: jnp.full((batch,), v, jnp.float32)
        return SamplerParams(
            temperature=f(cfg.temperature),
            top_k=jnp.full((batch,), cfg.top_k, jnp.int32),
            top_p=f(cfg.top_p), min_p=f(cfg.min_p),
            repetition_penalty=f(cfg.repetition_penalty))

    def set_row(self, b: int, cfg: SamplerConfig) -> "SamplerParams":
        return SamplerParams(
            temperature=self.temperature.at[b].set(cfg.temperature),
            top_k=self.top_k.at[b].set(cfg.top_k),
            top_p=self.top_p.at[b].set(cfg.top_p),
            min_p=self.min_p.at[b].set(cfg.min_p),
            repetition_penalty=self.repetition_penalty.at[b].set(
                cfg.repetition_penalty))


jax.tree_util.register_dataclass(
    SamplerParams,
    data_fields=["temperature", "top_k", "top_p", "min_p",
                 "repetition_penalty"],
    meta_fields=[])


def sample_dynamic(logits: jax.Array, keys: jax.Array, sp: SamplerParams,
                   recent_tokens: Optional[jax.Array] = None) -> jax.Array:
    """logits: [B, V]; keys: [B, 2] per-row PRNG keys -> tokens [B].

    Fully traced per-row equivalents of the static pipeline: every filter
    is a data-dependent mask, so rows with different settings share one
    compiled program."""
    logits = logits.astype(jnp.float32)
    B, V = logits.shape

    if recent_tokens is not None:
        pen = sp.repetition_penalty[:, None]
        valid = recent_tokens >= 0
        tok = jnp.where(valid, recent_tokens, 0)
        onehot_any = jax.vmap(
            lambda t, m: jnp.zeros((V,), jnp.bool_).at[t].max(m)
        )(tok, valid)
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(onehot_any & (pen != 1.0), penalized, logits)

    greedy = jnp.argmax(logits, -1).astype(jnp.int32)

    scaled = logits / jnp.maximum(sp.temperature, 1e-6)[:, None]
    # top-k: kth-largest threshold via one sort; k<=0 -> keep all
    sorted_desc = jnp.sort(scaled, -1)[:, ::-1]
    k_eff = jnp.clip(jnp.where(sp.top_k <= 0, V, sp.top_k) - 1, 0, V - 1)
    thresh_k = jnp.take_along_axis(sorted_desc, k_eff[:, None], -1)
    scaled = jnp.where(scaled < thresh_k, -jnp.inf, scaled)
    # top-p over the survivors
    sorted_desc = jnp.sort(scaled, -1)[:, ::-1]
    probs = jax.nn.softmax(sorted_desc, -1)
    cum = jnp.cumsum(probs, -1)
    keep = cum - probs < sp.top_p[:, None]
    thresh_p = jnp.min(jnp.where(keep, sorted_desc, jnp.inf), -1,
                       keepdims=True)
    scaled = jnp.where(scaled < thresh_p, -jnp.inf, scaled)
    # min-p
    probs = jax.nn.softmax(scaled, -1)
    top = jnp.max(probs, -1, keepdims=True)
    scaled = jnp.where(probs < sp.min_p[:, None] * top, -jnp.inf, scaled)

    drawn = jax.vmap(lambda k, l: jax.random.categorical(k, l))(
        keys, scaled).astype(jnp.int32)
    return jnp.where(sp.temperature <= 0.0, greedy, drawn)
