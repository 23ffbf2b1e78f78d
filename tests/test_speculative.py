"""Speculative decoding: must reproduce the target's greedy output exactly
(the acceptance rule guarantees it), and accept everything when the draft IS
the target."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.core.speculative import SpecStats, SpeculativeEngine
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig

CFG = TransformerConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, use_qk_norm=True, intermediate_size=96,
    tie_word_embeddings=True)
DRAFT_CFG = TransformerConfig(
    vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
    num_kv_heads=1, head_dim=16, use_qk_norm=True, intermediate_size=48,
    tie_word_embeddings=True)


def test_speculative_matches_greedy():
    tparams = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    dparams = base.init_params(DRAFT_CFG, jax.random.PRNGKey(1), jnp.float32)
    prompt = jnp.asarray([3, 1, 4, 1, 5])

    eng = Engine(lambda p, t, c: base.forward(p, CFG, t, c), tparams)
    want = list(eng.generate(prompt, base.init_cache(CFG, 1, 64, jnp.float32),
                             max_tokens=12))

    spec = SpeculativeEngine(
        lambda p, t, c: base.forward(p, CFG, t, c), tparams,
        lambda p, t, c: base.forward(p, DRAFT_CFG, t, c), dparams,
        num_draft_tokens=3)
    stats = SpecStats()
    got = list(spec.generate(prompt, base.init_cache(CFG, 1, 64, jnp.float32),
                             base.init_cache(DRAFT_CFG, 1, 64, jnp.float32),
                             max_tokens=12, stats=stats))
    assert got == want, (got, want)
    assert stats.rounds >= 1


@pytest.mark.slow
def test_self_draft_accepts_everything():
    """Draft == target -> every draft token must be accepted."""
    tparams = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    prompt = jnp.asarray([3, 1, 4])
    fwd = lambda p, t, c: base.forward(p, CFG, t, c)
    spec = SpeculativeEngine(fwd, tparams, fwd, tparams, num_draft_tokens=3)
    stats = SpecStats()
    eng = Engine(fwd, tparams)
    want = list(eng.generate(prompt, base.init_cache(CFG, 1, 64, jnp.float32),
                             max_tokens=13))
    got = list(spec.generate(prompt, base.init_cache(CFG, 1, 64, jnp.float32),
                             base.init_cache(CFG, 1, 64, jnp.float32),
                             max_tokens=13, stats=stats))
    assert got == want
    assert stats.acceptance_rate == 1.0, stats


@pytest.mark.slow
def test_generate_scan_matches_host_loop():
    """The on-device round-scan must emit exactly the host loop's tokens."""
    tp = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    dp = base.init_params(DRAFT_CFG, jax.random.PRNGKey(1), jnp.float32)
    spec = SpeculativeEngine(
        lambda p, t, c: base.forward(p, CFG, t, c), tp,
        lambda p, t, c: base.forward(p, DRAFT_CFG, t, c), dp,
        num_draft_tokens=3)
    prompt = jnp.asarray([3, 1, 4, 1, 5])

    want = list(spec.generate(prompt, base.init_cache(CFG, 1, 96,
                                                      jnp.float32),
                              base.init_cache(DRAFT_CFG, 1, 96, jnp.float32),
                              max_tokens=20))
    st = SpecStats()
    got, rounds = spec.generate_scan(
        prompt, base.init_cache(CFG, 1, 96, jnp.float32),
        base.init_cache(DRAFT_CFG, 1, 96, jnp.float32), max_tokens=20,
        stats=st)
    assert rounds >= 1 and len(got) >= rounds   # >= 1 token per round
    n = min(len(got), len(want))
    assert got[:n] == want[:n], (got, want)
