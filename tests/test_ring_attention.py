"""Ring attention (context parallel) must equal full causal attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ominix_mlx_tpu.parallel.ring_attention import make_ring_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")


def full_causal(q, k, v):
    D = q.shape[-1]
    T = q.shape[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * D ** -0.5
    mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd",
                      jax.nn.softmax(logits + mask, -1), v)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(causal):
    B, H, T, D = 1, 2, 32, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, T, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, D))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    ring = make_ring_attention(mesh, "sp", causal=causal)
    got = jax.jit(ring)(q, k, v)
    if causal:
        want = full_causal(q, k, v)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * D ** -0.5
        want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("window", [8, 24])
def test_ring_sliding_window_matches_masked(window):
    """window>0: ring attention equals the single-device sliding-window
    mask (Mistral-style) — the context-parallel prefill path for
    sliding-window models."""
    B, H, T, D = 1, 2, 32, 16
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, T, D))
    k = jax.random.normal(jax.random.PRNGKey(4), (B, H, T, D))
    v = jax.random.normal(jax.random.PRNGKey(5), (B, H, T, D))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    ring = make_ring_attention(mesh, "sp", causal=True, window=window)
    got = jax.jit(ring)(q, k, v)

    pos = jnp.arange(T)
    keep = (pos[None, :] <= pos[:, None]) \
        & (pos[None, :] > pos[:, None] - window)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * D ** -0.5
    want = jnp.einsum("bhqk,bhkd->bhqd",
                      jax.nn.softmax(logits + jnp.where(keep, 0.0, -1e30),
                                     -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
