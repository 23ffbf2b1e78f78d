"""MiniCPM-SALA tests: GLA chunked-vs-recurrent equivalence, sparse decode
== dense for short contexts, hybrid prefill/decode consistency, config
parsing golden values (the reference's test pattern,
minicpm-sala-mlx/tests/test_model.rs:1-90), self-speculative drafting."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.attention import causal_mask, sdpa
from ominix_mlx_tpu.core.cache import KVCache
from ominix_mlx_tpu.models import lightning as gla
from ominix_mlx_tpu.models import minicpm_sala as mc
from ominix_mlx_tpu.models.sparse_attention import (SparseConfig,
                                                    sparse_decode_attention)

CFG = mc.MiniCPMConfig(
    vocab_size=256, hidden_size=64, num_layers=4, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=96,
    mixer_types=("minicpm4", "lightning-attn", "minicpm4", "lightning-attn"),
    sparse=SparseConfig(kernel_size=4, block_size=4, init_blocks=1,
                        window_size=8, topk=2),
    scale_emb=12.0, scale_depth=1.4, dim_model_base=32)


def test_config_derived_values():
    assert abs(CFG.res_scale - 1.4 / 2.0) < 1e-6
    assert CFG.logits_scale == 2.0


def test_gla_chunked_matches_recurrent():
    """Chunked prefill must equal step-by-step recurrence (incl. a partial
    final chunk and a nonzero initial state)."""
    B, H, L, D = 1, 3, 10, 8
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, H, L, D))
               for i in range(3))
    slopes = gla.alibi_slopes(H)
    c0 = gla.GLACache.init(B, H, D)
    out_c, cache_c = gla.gla_chunked(q, k, v, slopes, c0, chunk=4)

    cache_r = gla.GLACache.init(B, H, D)
    outs = []
    for t in range(L):
        o, cache_r = gla.gla_decode_step(q[:, :, t:t + 1], k[:, :, t:t + 1],
                                         v[:, :, t:t + 1],
                                         jnp.asarray(slopes), cache_r)
        outs.append(o)
    out_r = jnp.concatenate(outs, 2)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_c.state),
                               np.asarray(cache_r.state), rtol=2e-4, atol=2e-4)


def test_sparse_decode_equals_dense_short_context():
    """When init + window cover the whole history, sparse == dense."""
    B, H, Hkv, D, S = 1, 4, 2, 16, 32
    scfg = SparseConfig(kernel_size=4, block_size=4, init_blocks=1,
                        window_size=16, topk=2)
    cache = KVCache.init(B, Hkv, S, D, jnp.float32)
    n = 12  # history length: 4 init + <=16 window covers all
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, n, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, n, D))
    cache = cache.update(k, v, jnp.int32(0))
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, 1, D))
    got = sparse_decode_attention(q, cache, jnp.int32(n - 1), scfg, D ** -0.5)
    mask = causal_mask(1, S, jnp.int32(n - 1))
    want = sdpa(q, cache.k, cache.v, D ** -0.5, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_hybrid_prefill_decode_consistency():
    params = mc.init_params(CFG, jax.random.PRNGKey(0))
    toks = jnp.asarray([[7, 3, 11, 5, 2, 9, 1, 8]])
    c1 = mc.init_cache(CFG, 1, 32, jnp.float32)
    full, _ = mc.forward(params, CFG, toks, c1)
    c2 = mc.init_cache(CFG, 1, 32, jnp.float32)
    outs = []
    for t in range(8):
        lg, c2 = mc.forward(params, CFG, toks[:, t:t + 1], c2)
        outs.append(lg[:, 0])
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full), rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_self_speculative_draft_runs_prefix_layers():
    params = mc.init_params(CFG, jax.random.PRNGKey(0))
    toks = jnp.asarray([[7, 3, 11]])
    c = mc.init_cache(CFG, 1, 32, jnp.float32)
    lg_full, _ = mc.forward(params, CFG, toks, c)
    c = mc.init_cache(CFG, 1, 32, jnp.float32)
    lg_draft, _ = mc.forward(params, CFG, toks, c, num_layers=2)
    assert lg_draft.shape == lg_full.shape
    assert not np.allclose(np.asarray(lg_draft), np.asarray(lg_full))


def test_sparse_attention_retrieves_needle_block():
    """Mechanism version of the reference needle test (examples/
    needle_test.rs): plant a distinctive K/V block in the middle region;
    a query aligned with that key must retrieve its value through the
    top-k block selection."""
    B, Hkv, H, D, S = 1, 2, 4, 16, 256
    scfg = SparseConfig(kernel_size=8, block_size=8, init_blocks=1,
                        window_size=16, topk=2)
    n = 200  # long history: middle region is large
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(B, Hkv, n, D)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, n, D)) * 0.1, jnp.float32)
    needle = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    needle = needle / jnp.linalg.norm(needle) * 5.0
    pos = 96  # inside the middle region, block-aligned
    k = k.at[:, :, pos:pos + 8].set(needle)
    v = v.at[:, :, pos:pos + 8].set(1.0)

    cache = KVCache.init(B, Hkv, S, D, jnp.float32)
    cache = cache.update(k, v, jnp.int32(0))
    q = jnp.broadcast_to(needle, (B, H, 1, D))
    out = sparse_decode_attention(q, cache, jnp.int32(n - 1), scfg,
                                  D ** -0.5)
    # attention mass should concentrate on the needle block's value (1.0)
    assert float(out.mean()) > 0.9, float(out.mean())


def test_sparse_cache_incremental_compression_matches_recompute():
    """SparseKVCache maintains compressed keys on append (O(ks) per step);
    every block fully inside the valid region must equal a full re-pool
    (reference compresses on append, sparse.rs:115-138)."""
    from ominix_mlx_tpu.models.sparse_attention import (SparseKVCache,
                                                        compress_keys)
    B, Hkv, D, S, ks = 1, 2, 8, 128, 4
    rng = np.random.default_rng(0)
    cache = SparseKVCache.init(B, Hkv, S, D, jnp.float32, kernel_size=ks)
    total = 0
    # mixed chunk sizes incl. block-misaligned ones
    for t in (7, 1, 1, 9, 4, 1, 13, 1, 1, 1):
        k = jnp.asarray(rng.normal(size=(B, Hkv, t, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, Hkv, t, D)), jnp.float32)
        cache = cache.update(k, v, jnp.int32(total))
        total += t
        full = compress_keys(cache.k, ks)
        nfull = total // ks  # blocks completely covered by valid tokens
        np.testing.assert_allclose(
            np.asarray(cache.comp[:, :, :nfull]),
            np.asarray(full[:, :, :nfull]), rtol=1e-5, atol=1e-5)


def test_sparse_decode_same_result_with_incremental_cache():
    """sparse_decode_attention must give identical output whether compressed
    keys come from the incremental cache or a full recompute."""
    from ominix_mlx_tpu.models.sparse_attention import SparseKVCache
    B, H, Hkv, D, S = 1, 4, 2, 16, 256
    scfg = SparseConfig(kernel_size=8, block_size=8, init_blocks=1,
                        window_size=16, topk=2)
    n = 200
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(B, Hkv, n, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, n, D)), jnp.float32)
    sc = SparseKVCache.init(B, Hkv, S, D, jnp.float32, kernel_size=8)
    sc = sc.update(k, v, jnp.int32(0))
    dc = KVCache.init(B, Hkv, S, D, jnp.float32)
    dc = dc.update(k, v, jnp.int32(0))
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, 1, D))
    got = sparse_decode_attention(q, sc, jnp.int32(n - 1), scfg, D ** -0.5)
    want = sparse_decode_attention(q, dc, jnp.int32(n - 1), scfg, D ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chunked_prefill_matches_whole_prefill():
    """prefill_chunked over the hybrid (sparse + GLA) model must equal one
    whole-prompt prefill: chunks are EXACT-width (padding would run through
    the GLA recurrence) and sparse chunks attend the kv_limit prefix."""
    from ominix_mlx_tpu.core.generate import Engine

    params = mc.init_params(CFG, jax.random.PRNGKey(3))
    toks = jnp.asarray([[7, 3, 11, 5, 2, 9, 1, 8, 4, 6, 10, 12, 13]])  # T=13
    eng = Engine(
        lambda p, t, c: mc.forward(p, CFG, t, c), params,
        chunk_forward_fn=lambda p, t, c, kl: mc.forward(p, CFG, t, c,
                                                        kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: mc.forward(
            p, CFG, t, c, kv_limit=kl, skip_logits=True))
    last_w, cache_w = eng.prefill(toks, mc.init_cache(CFG, 1, 32,
                                                      jnp.float32))
    last_c, cache_c = eng.prefill_chunked(
        toks, mc.init_cache(CFG, 1, 32, jnp.float32), chunk_size=4)
    np.testing.assert_allclose(np.asarray(last_c), np.asarray(last_w),
                               rtol=2e-4, atol=2e-4)
    # the caches must continue identically: one decode step each
    lg_w, _ = mc.forward(params, CFG, jnp.asarray([[2]]), cache_w)
    lg_c, _ = mc.forward(params, CFG, jnp.asarray([[2]]), cache_c)
    np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_w),
                               rtol=2e-4, atol=2e-4)


def test_needle_accuracy_eval_small():
    """The needle-retrieval eval (benchmarks/longcontext_bench.py --needle;
    reference: minicpm-sala-mlx/examples/needle_test.rs): at a size where
    the sparse path really prunes (middle region >> topk*ks coverage is
    not guaranteed — the needle must WIN the compressed-score top-k),
    sparse retrieval accuracy matches dense."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "longcontext_bench",
        os.path.join(os.path.dirname(__file__), os.pardir, "benchmarks",
                     "longcontext_bench.py"))
    lb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lb)
    scfg = SparseConfig(kernel_size=16, block_size=16, init_blocks=1,
                        window_size=128, topk=4)
    sa, da, rel = lb.needle_accuracy(4096, trials=8, scfg=scfg, Hkv=2,
                                     H=4, D=32, dtype=jnp.float32)
    assert da > 0.9, da            # dense must retrieve (sanity)
    assert sa >= da, (sa, da)      # sparse >= dense (VERDICT r3 item 6)


def test_gla_numpy_golden_recurrence():
    """Hand-derived float64 numpy golden for the lightning/GLA mixer math
    (VERDICT r3 item 7): the ALiBi slopes are HARDCODED from the published
    formula (not computed via alibi_slopes) and the recurrence
        S_t = exp(-slope_h) * S_{t-1} + k_t^T v_t;   o_t = q_t @ S_t
    is written token-by-token, independent of decay_tensors — a decay-mask
    sign/off-by-one error in the chunked form would pass the
    chunked==recurrent self-consistency test but fail here.
    Reference math: minicpm-sala-mlx/src/attention/lightning.rs:449-575."""
    H = 4
    # ALiBi for n=4: start = 2^(-2^-(log2(4)-3)) = 2^-2; ratio = start
    hard = np.array([0.25, 0.0625, 0.015625, 0.00390625])
    np.testing.assert_allclose(np.asarray(gla.alibi_slopes(H)), -hard,
                               rtol=1e-7)
    B, L, D = 2, 13, 8
    rng = np.random.default_rng(42)
    q64, k64, v64 = (rng.standard_normal((B, H, L, D)) for _ in range(3))
    lam = np.exp(-hard)                                   # per-head decay
    S = np.zeros((B, H, D, D))
    golden = np.zeros((B, H, L, D))
    for t in range(L):
        S = S * lam[None, :, None, None] + np.einsum(
            "bhd,bhe->bhde", k64[:, :, t], v64[:, :, t])
        golden[:, :, t] = np.einsum("bhd,bhde->bhe", q64[:, :, t], S)

    qj, kj, vj = (jnp.asarray(x, jnp.float32) for x in (q64, k64, v64))
    slopes = gla.alibi_slopes(H)

    # chunked prefill with a PARTIAL final chunk (13 % 4 = 1)
    out_c, st_c = gla.gla_chunked(qj, kj, vj, slopes,
                                  gla.GLACache.init(B, H, D), chunk=4)
    np.testing.assert_allclose(np.asarray(out_c), golden, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_c.state), S, rtol=2e-4,
                               atol=2e-4)

    # decode-step recurrence
    c = gla.GLACache.init(B, H, D)
    for t in range(L):
        o, c = gla.gla_decode_step(qj[:, :, t:t + 1], kj[:, :, t:t + 1],
                                   vj[:, :, t:t + 1], slopes, c)
        np.testing.assert_allclose(np.asarray(o[:, :, 0]), golden[:, :, t],
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c.state), S, rtol=2e-4, atol=2e-4)
