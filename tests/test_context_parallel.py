"""Context-parallel prefill (parallel/context_parallel.py): sequence-sharded
ring-attention prefill over the virtual 8-device CPU mesh equals the
single-device forward, logits AND cache contents (VERDICT r3 #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.parallel import context_parallel as cp
from ominix_mlx_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = TransformerConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    use_qk_norm=True, tie_word_embeddings=True)


def _reference(tokens, T):
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    cache = base.init_cache(CFG, 1, T, jnp.float32)
    logits, cache = base.forward(params, CFG, tokens, cache,
                                 fresh_prefill=True)
    return params, logits[:, -1:], cache


def _run_cp(params, tokens, T, sp=8):
    m = pmesh.make_mesh(dp=1, tp=1, sp=sp)
    cache = base.init_cache(CFG, 1, T, jnp.float32)
    return cp.prefill_context_parallel(params, CFG, tokens, cache, m)


@pytest.mark.parametrize("T", [512])
def test_cp_prefill_matches_single_device(T):
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 128)
    params, want_logits, want_cache = _reference(tokens, T)
    got_logits, got_cache = _run_cp(params, tokens, T)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               rtol=2e-4, atol=2e-4)
    assert int(got_cache.offset) == T
    for wl, gl in zip(want_cache.layers, got_cache.layers):
        np.testing.assert_allclose(np.asarray(gl.k), np.asarray(wl.k),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gl.v), np.asarray(wl.v),
                                   rtol=2e-4, atol=2e-4)


def test_cp_then_decode_continues():
    """Prefill context-parallel, gather the cache, decode single-device:
    tokens match an end-to-end single-device run."""
    T = 256
    cap = T + 8
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, T), 0, 128)
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)

    # single-device reference decode
    cache = base.init_cache(CFG, 1, cap, jnp.float32)
    logits, cache = base.forward(params, CFG, tokens, cache,
                                 fresh_prefill=True)
    ref_toks = []
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(4):
        ref_toks.append(int(tok[0, 0]))
        logits, cache = base.forward(params, CFG, tok, cache)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)

    # cp prefill (capacity == T), then paste into a decode-capacity cache
    got_logits, cp_cache = _run_cp(params, tokens, T)
    cp_cache = cp.gather_cache(cp_cache)
    cache2 = base.init_cache(CFG, 1, cap, jnp.float32)
    layers = []
    for full, pre in zip(cache2.layers, cp_cache.layers):
        layers.append(type(full)(k=full.k.at[:, :, :T].set(pre.k),
                                 v=full.v.at[:, :, :T].set(pre.v)))
    cache2 = type(cache2)(layers=layers, offset=cp_cache.offset)
    got_toks = []
    # logits come back committed to the sp mesh; bring them to the decode
    # device before mixing with the single-device cache
    got_logits = jnp.asarray(np.asarray(got_logits))
    tok = jnp.argmax(got_logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(4):
        got_toks.append(int(tok[0, 0]))
        logits, cache2 = base.forward(params, CFG, tok, cache2)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    assert got_toks == ref_toks


@pytest.mark.slow
@pytest.mark.parametrize("T", [8192, 32768])
def test_cp_prefill_long(T):
    """8k/32k sequence-parallel prefill equals the single-device CHUNKED
    prefill path (the dense [T, T] reference does not fit host memory at
    32k; chunked prefill is itself equality-tested against dense at small
    T in test_qwen3.py)."""
    from ominix_mlx_tpu.core.generate import Engine
    from ominix_mlx_tpu.core.sampling import SamplerConfig

    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, T), 0, 128)
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    engine = Engine(
        lambda p, t, c: base.forward(p, CFG, t, c), params, SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, CFG, t, c, fresh_prefill=True),
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, CFG, t, c, kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: base.forward(
            p, CFG, t, c, kv_limit=kl, skip_logits=True))
    cache = base.init_cache(CFG, 1, T, jnp.float32)
    want, _ = engine.prefill_chunked(tokens, cache, chunk_size=2048)
    want = want[:, -1:]

    cache2 = base.init_cache(CFG, 1, T, jnp.float32)
    m = pmesh.make_mesh(dp=1, tp=1, sp=8)
    got, _ = cp.prefill_context_parallel(params, CFG, tokens, cache2, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_cp_prefill_sliding_window_matches_single_device():
    """Sliding-window (Mistral-style) model under cp prefill: the windowed
    ring mask must reproduce the single-device sliding-window forward."""
    import dataclasses

    cfg = dataclasses.replace(CFG, sliding_window=96)
    T = 512
    tokens = jax.random.randint(jax.random.PRNGKey(7), (1, T), 0, 128)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    cache = base.init_cache(cfg, 1, T, jnp.float32)
    want, _ = base.forward(params, cfg, tokens, cache, fresh_prefill=True)
    m = pmesh.make_mesh(dp=1, tp=1, sp=8)
    cache2 = base.init_cache(cfg, 1, T, jnp.float32)
    got, _ = cp.prefill_context_parallel(params, cfg, tokens, cache2, m)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want[:, -1:]),
                               rtol=2e-4, atol=2e-4)
