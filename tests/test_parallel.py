"""Sharding layer tests on the virtual 8-device CPU mesh: TP-sharded
forward equals the unsharded forward; EP MoE equals single-device MoE;
sharded training step runs (SURVEY.md §7 step 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.models.moe import MoEConfig, init_moe_params, moe_block
from ominix_mlx_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = TransformerConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=8,
    num_kv_heads=4, head_dim=16, intermediate_size=128,
    use_qk_norm=True, tie_word_embeddings=True)


def test_tp_sharded_forward_matches_unsharded():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray([[5, 17, 99, 3]])
    cache = base.init_cache(CFG, 1, 16, jnp.float32)
    want, _ = base.forward(params, CFG, tokens, cache)

    m = pmesh.make_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = pmesh.shard_params(CFG, params, m)
    cache2 = base.init_cache(CFG, 1, 16, jnp.float32)
    cache2 = pmesh.shard_tree(cache2, pmesh.cache_specs(cache2), m)
    with jax.set_mesh(m):
        got, _ = jax.jit(lambda p, t, c: base.forward(p, CFG, t, c))(
            sharded, tokens, cache2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ep_moe_matches_unsharded():
    mcfg = MoEConfig(num_experts=8, top_k=2, norm_topk_prob=True,
                     moe_intermediate_size=32)
    lp = init_moe_params(jax.random.PRNGKey(1), 64, mcfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 64))
    want = moe_block(lp, mcfg, x)

    m = pmesh.make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    lps = pmesh.shard_tree(lp, pmesh.moe_param_specs(lp), m)
    with jax.set_mesh(m):
        got = jax.jit(lambda lp, x: moe_block(lp, mcfg, x))(lps, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_ep_moe_channelwise_matches_unsharded():
    """Channelwise-int8 experts shard over the EP axis (data + per-row
    scale lead with the expert dim) and both decode (gather) and prefill
    (scan) paths run under GSPMD equal to the single-device result."""
    from ominix_mlx_tpu.models.moe import quantize_experts_params

    mcfg = MoEConfig(num_experts=8, top_k=2, norm_topk_prob=True,
                     moe_intermediate_size=32)
    lp = init_moe_params(jax.random.PRNGKey(1), 64, mcfg, jnp.float32)
    qlp = quantize_experts_params(lp, scheme="channel8")
    m = pmesh.make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    lps = pmesh.shard_tree(qlp, pmesh.moe_param_specs(qlp), m)
    for T in (4, 16):   # gather path and scan path
        x = jax.random.normal(jax.random.PRNGKey(2), (1, T, 64))
        want = moe_block(qlp, mcfg, x)
        with jax.set_mesh(m):
            got = jax.jit(lambda lp, x: moe_block(lp, mcfg, x))(lps, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_pipeline_parallel_matches_sequential():
    """GPipe schedule over a 4-stage pp mesh == plain sequential layer
    application (parallel/pipeline.py; new design, no reference
    counterpart — SURVEY.md §2.7)."""
    from ominix_mlx_tpu.parallel import pipeline as pp
    from ominix_mlx_tpu.nn.layers import linear

    L, D, M, mb = 8, 16, 6, 2
    rng = jax.random.PRNGKey(0)
    layers = []
    for i in range(L):
        k1, k2, rng = jax.random.split(rng, 3)
        layers.append({"w": jax.random.normal(k1, (D, D)) * 0.2,
                       "b": jax.random.normal(k2, (D,)) * 0.1})

    def layer_fn(lp, x):
        return jnp.tanh(x @ lp["w"].T + lp["b"])

    xs = jax.random.normal(jax.random.PRNGKey(1), (M, mb, D))

    want = xs
    for lp in layers:
        want = layer_fn(lp, want)

    mesh = pp.make_pp_mesh(pp=4, devices=jax.devices()[:4])
    stacked = pp.stack_stage_params(layers, 4)
    from ominix_mlx_tpu.parallel.mesh import shard_tree
    stacked = shard_tree(stacked, pp.stage_specs(stacked), mesh)
    got = pp.pipeline_apply(mesh, layer_fn, stacked, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_sharded_paged_decode_matches_unsharded():
    """Paged KV pool sharded heads-on-tp: decode step equals unsharded."""
    from ominix_mlx_tpu.core.cache import ModelCache
    from ominix_mlx_tpu.core.paged_cache import PagedKVCache

    params = base.init_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    table = jnp.asarray([[1, 2]], jnp.int32)

    def fresh_cache():
        return ModelCache(
            layers=[PagedKVCache.init(1, CFG.num_kv_heads, 4, 8, CFG.hd, 2,
                                      jnp.float32, page_table=table)
                    for _ in range(CFG.num_layers)],
            offset=jnp.zeros((), jnp.int32))

    tokens = jnp.asarray([[5, 17, 99]])
    tok1 = jnp.asarray([[7]])
    _, c = base.forward(params, CFG, tokens, fresh_cache())
    want, _ = base.forward(params, CFG, tok1, c)

    m = pmesh.make_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = pmesh.shard_params(CFG, params, m)
    c2 = fresh_cache()
    c2 = pmesh.shard_tree(c2, pmesh.cache_specs(c2), m)
    with jax.set_mesh(m):
        f = jax.jit(lambda p, t, c: base.forward(p, CFG, t, c))
        _, c2 = f(sharded, tokens, c2)
        got, _ = f(sharded, tok1, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
