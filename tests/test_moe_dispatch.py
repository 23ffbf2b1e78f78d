"""Sorted expert dispatch (models/moe.py sorted_expert_mlp): equality vs
the dense all-expert combine across routing shapes, incl. empty experts and
skewed routing (TPU counterpart of the reference's token sort-by-expert,
qwen3-mlx/src/qwen3_moe.rs:339)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.models import moe
from ominix_mlx_tpu.models.moe import MoEConfig, init_moe_params, moe_block
from ominix_mlx_tpu.nn.layers import ACTIVATIONS


def _dense_combine(xt, ex, w, idx, E, act):
    M = xt.shape[0]
    comb = jnp.zeros((M, E), jnp.float32)
    comb = jax.vmap(lambda c, i, ww: c.at[i].add(ww))(
        comb, idx, w.astype(jnp.float32))
    g = jnp.einsum("md,eid->mei", xt, ex["gate_proj"])
    u = jnp.einsum("md,eid->mei", xt, ex["up_proj"])
    h = act(g) * u
    ye = jnp.einsum("mei,edi->med", h, ex["down_proj"])
    return jnp.einsum("med,me->md", ye.astype(jnp.float32), comb)


@pytest.mark.parametrize("E,k,M", [(16, 4, 64), (8, 2, 33), (4, 1, 128)])
def test_sorted_matches_dense(E, k, M):
    D, I = 32, 48
    mcfg = MoEConfig(num_experts=E, top_k=k, moe_intermediate_size=I)
    lp = init_moe_params(jax.random.PRNGKey(0), D, mcfg, jnp.float32)
    xt = jax.random.normal(jax.random.PRNGKey(1), (M, D), jnp.float32)
    w, idx = moe.route(lp, mcfg, xt)
    act = ACTIVATIONS[mcfg.hidden_act]
    want = _dense_combine(xt, lp["experts"], w, idx, E, act)
    got = moe.sorted_expert_mlp(xt, lp["experts"], w, idx, E, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sorted_skewed_routing_all_one_expert():
    """Every token routed to one expert (worst-case group imbalance) and
    some experts completely empty."""
    E, k, M, D, I = 8, 2, 40, 32, 48
    mcfg = MoEConfig(num_experts=E, top_k=k, moe_intermediate_size=I)
    lp = init_moe_params(jax.random.PRNGKey(0), D, mcfg, jnp.float32)
    xt = jax.random.normal(jax.random.PRNGKey(1), (M, D), jnp.float32)
    idx = jnp.stack([jnp.full((M,), 3), jnp.full((M,), 5)], 1)
    w = jnp.full((M, k), 0.5, jnp.float32)
    act = ACTIVATIONS[mcfg.hidden_act]
    want = _dense_combine(xt, lp["experts"], w, idx, E, act)
    got = moe.sorted_expert_mlp(xt, lp["experts"], w, idx, E, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_moe_block_prefill_env_paths_agree(monkeypatch):
    """moe_block prefill output identical with sorted dispatch on and off."""
    E, k = 8, 2
    mcfg = MoEConfig(num_experts=E, top_k=k, norm_topk_prob=True,
                     moe_intermediate_size=48)
    lp = init_moe_params(jax.random.PRNGKey(3), 64, mcfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 64), jnp.float32)
    monkeypatch.setenv("OMINIX_MOE_SORTED", "0")
    want = moe_block(lp, mcfg, x)
    monkeypatch.setenv("OMINIX_MOE_SORTED", "1")
    got = moe_block(lp, mcfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sorted_under_jit_grad_safe_shapes():
    """The dispatch is fully static-shaped: jit compiles once across
    different routing VALUES (same shapes)."""
    E, k, M, D, I = 8, 2, 24, 32, 16
    mcfg = MoEConfig(num_experts=E, top_k=k, moe_intermediate_size=I)
    lp = init_moe_params(jax.random.PRNGKey(0), D, mcfg, jnp.float32)
    act = ACTIVATIONS[mcfg.hidden_act]
    f = jax.jit(lambda xt, w, idx: moe.sorted_expert_mlp(
        xt, lp["experts"], w, idx, E, act))
    for seed in (1, 2):
        xt = jax.random.normal(jax.random.PRNGKey(seed), (M, D), jnp.float32)
        w, idx = moe.route(lp, mcfg, xt)
        want = _dense_combine(xt, lp["experts"], w, idx, E, act)
        np.testing.assert_allclose(np.asarray(f(xt, w, idx)),
                                   np.asarray(want), rtol=2e-5, atol=2e-5)
