"""Tests for the packed quantized-matmul op layer (CPU fallback paths) and
fused projections. The Pallas kernels themselves are TPU-only; their
correctness is pinned by the same dequantize() ground truth used here."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.quant import dequantize, quantize_tensor
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.ops import quant_matmul as qm


def test_prepare_unpack_roundtrip():
    for bits in (4, 8):
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.float32)
        qt = quantize_tensor(w, 64, bits)
        rt = qm.unpack(qm.prepare(qt))
        np.testing.assert_array_equal(np.asarray(rt.q), np.asarray(qt.q))
        # prepare() stores bf16 scales (kernels compute S in bf16 anyway)
        np.testing.assert_array_equal(
            np.asarray(rt.scales),
            np.asarray(qt.scales.astype(jnp.bfloat16)))


def test_quantized_matmul_fallback_matches_dequant():
    for bits in (4, 8):
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 128), jnp.float32)
        qt = quantize_tensor(w, 64, bits)
        y = qm.quantized_matmul(x, qm.prepare(qt))
        want = x @ dequantize(qt, jnp.float32).T
        # prepare() keeps bf16 scales; allow the extra rounding vs f32
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=5e-2, atol=5e-2)


def test_gather_rows_matches_dequant_rows():
    for bits in (4, 8):
        w = jax.random.normal(jax.random.PRNGKey(0), (16, 128), jnp.float32)
        qt = quantize_tensor(w, 64, bits)
        pqt = qm.prepare(qt)
        tokens = jnp.asarray([[3, 0], [15, 7]])
        got = qm.gather_rows(pqt, tokens)
        want = dequantize(qt, jnp.float32)[tokens]
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                                   np.asarray(want), rtol=2e-2, atol=2e-2)


def test_fused_projections_match_unfused():
    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=48,
        use_qk_norm=True, tie_word_embeddings=True)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    fused = base.fuse_layer_projections(params)
    assert "qkv_proj" in fused["layers"][0]
    assert "q_proj" not in fused["layers"][0]
    tokens = jnp.asarray([[1, 5, 9, 2]])
    c1 = base.init_cache(cfg, 1, 16, jnp.float32)
    c2 = base.init_cache(cfg, 1, 16, jnp.float32)
    l1, _ = base.forward(params, cfg, tokens, c1)
    l2, _ = base.forward(fused, cfg, tokens, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-5, atol=2e-5)


def test_quantized_model_forward_close_to_dense():
    """A quantized tiny model's logits stay close to the dense model's."""
    cfg = TransformerConfig(
        vocab_size=64, hidden_size=128, num_layers=1, num_heads=4,
        num_kv_heads=2, head_dim=32, intermediate_size=128,
        tie_word_embeddings=True)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = base.quantize_params(params, 32, 8, pack=True,
                                   quantize_embed=False, consume=False)
    tokens = jnp.asarray([[1, 5, 9, 2]])
    c1 = base.init_cache(cfg, 1, 16, jnp.float32)
    c2 = base.init_cache(cfg, 1, 16, jnp.float32)
    l1, _ = base.forward(params, cfg, tokens, c1)
    l2, _ = base.forward(qparams, cfg, tokens, c2)
    # 8-bit group quantization: logits should track within a few percent
    corr = np.corrcoef(np.asarray(l1).ravel(), np.asarray(l2).ravel())[0, 1]
    assert corr > 0.999, corr


def test_gather_qmm_fallback_matches_per_expert_dequant():
    from ominix_mlx_tpu.ops import quant_matmul as qm
    E, N, K, T, k = 4, 64, 128, 3, 2
    w = jax.random.normal(jax.random.PRNGKey(0), (E, N, K), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (T, K), jnp.float32)
    ids = jnp.asarray([[0, 2], [1, 3], [2, 2]], jnp.int32)
    for bits in (4, 8):
        pqe = qm.quantize_experts(w, 32, bits)
        got = qm.gather_qmm(x, pqe, ids)                 # [T, k, N]
        for t in range(T):
            for j in range(k):
                wd = qm.dequantize_expert(pqe, ids[t, j]).astype(jnp.float32)
                want = x[t] @ wd.T
                np.testing.assert_allclose(np.asarray(got[t, j]),
                                           np.asarray(want),
                                           rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_moe_block_quantized_matches_dense():
    from ominix_mlx_tpu.models.moe import (MoEConfig, init_moe_params,
                                           moe_block, quantize_experts_params)
    mcfg = MoEConfig(num_experts=4, top_k=2, norm_topk_prob=True,
                     moe_intermediate_size=64)
    D = 96
    lp = init_moe_params(jax.random.PRNGKey(0), D, mcfg, jnp.float32)
    qlp = quantize_experts_params(lp, 32, 8)
    for T in (2, 16):   # decode (gather path) and prefill (scan path)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, D), jnp.float32)
        y_dense = moe_block(lp, mcfg, x)
        y_quant = moe_block(qlp, mcfg, x)
        corr = np.corrcoef(np.asarray(y_dense).ravel(),
                           np.asarray(y_quant).ravel())[0, 1]
        assert corr > 0.995, (T, corr)


def test_moe_block_channelwise_matches_dense():
    """Channelwise-int8 experts (w8a8 batched serving): both the decode
    gather path (M<=8) and the prefill int8-scan path must track dense."""
    from ominix_mlx_tpu.models.moe import (MoEConfig, init_moe_params,
                                           moe_block, quantize_experts_params)
    mcfg = MoEConfig(num_experts=4, top_k=2, norm_topk_prob=True,
                     moe_intermediate_size=64)
    D = 96
    lp = init_moe_params(jax.random.PRNGKey(0), D, mcfg, jnp.float32)
    qlp = quantize_experts_params(lp, scheme="channel8")
    assert isinstance(qlp["experts"]["gate_proj"], qm.ChannelQuantizedExperts)
    for T in (2, 16):   # decode (gather path) and prefill (scan path)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, D), jnp.float32)
        y_dense = moe_block(lp, mcfg, x)
        y_quant = moe_block(qlp, mcfg, x)
        corr = np.corrcoef(np.asarray(y_dense).ravel(),
                           np.asarray(y_quant).ravel())[0, 1]
        assert corr > 0.999, (T, corr)


def test_channel_gather_qmm_matches_per_expert():
    E, N, K, T, k = 4, 64, 128, 3, 2
    w = jax.random.normal(jax.random.PRNGKey(0), (E, N, K), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (T, K), jnp.float32)
    ids = jnp.asarray([[0, 2], [1, 3], [2, 2]], jnp.int32)
    cqe = qm.channel_quantize_experts(w)
    got = qm.channel_gather_qmm(x, cqe, ids)             # [T, k, N]
    for t in range(T):
        for j in range(k):
            want = x[t] @ np.asarray(w[ids[t, j]]).T
            np.testing.assert_allclose(np.asarray(got[t, j]), want,
                                       rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_quantize_params_channel8_covers_moe_layers():
    """quantize_params(scheme='channel8') on a MoE model quantizes the
    stacked experts and shared-expert projections, and forward tracks."""
    from ominix_mlx_tpu.models import qwen3_moe

    cfg = qwen3_moe.config_from_hf({
        "vocab_size": 256, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
        "intermediate_size": 128, "moe_intermediate_size": 64,
        "num_experts": 4, "num_experts_per_tok": 2, "norm_topk_prob": True,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
        "tie_word_embeddings": True})
    p = qwen3_moe.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = base.quantize_params(dict(p), scheme="channel8", consume=False,
                              quantize_embed=False)
    l0 = qp["layers"][0]["moe"]
    assert isinstance(l0["experts"]["gate_proj"], qm.ChannelQuantizedExperts)
    toks = jnp.arange(6)[None]
    c1 = qwen3_moe.init_cache(cfg, 1, 16, jnp.float32)
    c2 = qwen3_moe.init_cache(cfg, 1, 16, jnp.float32)
    ld, _ = qwen3_moe.forward(p, cfg, toks, c1)
    lq, _ = qwen3_moe.forward(qp, cfg, toks, c2)
    corr = np.corrcoef(np.asarray(ld).ravel(), np.asarray(lq).ravel())[0, 1]
    assert corr > 0.995, corr


@pytest.mark.slow
def test_quantize_tree_generic_hybrid():
    """Generic tree quantizer: eligible 2D weights quantize, everything
    else stays dense, and the hybrid forward still runs."""
    import jax

    from ominix_mlx_tpu.core.quant import QuantizedTensor, quantize_tree
    from ominix_mlx_tpu.models import minicpm_sala as mc

    cfg = mc.MiniCPMConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512,
        mixer_types=("lightning-attn", "minicpm4"))
    p = mc.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    want, _ = mc.forward(p, cfg, jnp.ones((1, 4), jnp.int32),
                         mc.init_cache(cfg, 1, 16, jnp.float32))
    q = quantize_tree(p, group_size=64, bits=8, pack=False)
    leaves = jax.tree_util.tree_leaves(
        q, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    assert sum(isinstance(x, QuantizedTensor) for x in leaves) >= 8
    got, _ = mc.forward(q, cfg, jnp.ones((1, 4), jnp.int32),
                        mc.init_cache(cfg, 1, 16, jnp.float32))
    import numpy as np
    # int8 grouped quantization: close, not exact
    assert np.allclose(np.asarray(got), np.asarray(want), rtol=0.2, atol=0.5)


def test_prepare_batched_cpu_fallback_exact():
    """On CPU the batched-prepared tensor routes through the dequant
    fallback and must match the dense reference."""
    import numpy as np

    from ominix_mlx_tpu.core.quant import quantize_tensor

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.float32)
    qt = quantize_tensor(w, group_size=64, bits=4)
    pq = qm.prepare(qt, act_bits=8, batched=True)
    assert pq.batched
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 128), jnp.float32)
    got = qm.quantized_matmul(x, pq)
    want = x @ dequantize(qt, jnp.float32).T
    # prepare() stores bf16 scales -> small absolute wobble vs f32 ref
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-1)


def test_fused_projection_carries_batched_flag():
    from ominix_mlx_tpu.core.quant import quantize_tensor

    ws = []
    for i, n in enumerate((512, 256, 256)):
        qt = quantize_tensor(
            jax.random.normal(jax.random.PRNGKey(i), (n, 128), jnp.float32),
            group_size=64, bits=4)
        ws.append(qm.prepare(qt, act_bits=8, batched=True))
    fused = base._stack_weights(ws)
    assert fused.batched and fused.data.shape[0] == 1024


def test_channel_quantize_matmul_close_to_dense():
    """Channelwise w8a8 (batched-serving scheme): int8 dot + rank-1
    rescale must track the dense product within int8 error."""
    w = jax.random.normal(jax.random.PRNGKey(0), (384, 256), jnp.float32) * 0.02
    cq = qm.channel_quantize(w)
    assert cq.data.dtype == jnp.int8 and cq.scale.shape == (384,)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256), jnp.bfloat16)
    got = qm.quantized_matmul(x, cq).astype(jnp.float32)
    want = x.astype(jnp.float32) @ w.T
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel
    # dequantize roundtrip
    wd = qm.channel_dequantize(cq, jnp.float32)
    assert float(jnp.max(jnp.abs(wd - w))) < float(jnp.max(cq.scale)) * 0.51


@pytest.mark.slow
def test_channel_scheme_model_forward_and_fusion():
    """quantize_params(scheme='channel8') + fuse_layer_projections +
    forward: logits must stay close to the dense model's."""
    cfg = TransformerConfig(
        vocab_size=512, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=32, intermediate_size=256,
        use_qk_norm=True, tie_word_embeddings=True)
    dense = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ch = base.quantize_params(dict(dense), scheme="channel8", consume=False)
    ch = base.fuse_layer_projections(ch)
    densef = base.fuse_layer_projections(dense)
    assert isinstance(ch["layers"][0]["qkv_proj"]["w"],
                      qm.ChannelQuantizedTensor)
    toks = jnp.arange(8)[None]
    cache = base.init_cache(cfg, 1, 16, jnp.bfloat16)
    cache2 = base.init_cache(cfg, 1, 16, jnp.bfloat16)
    lq, _ = base.forward(ch, cfg, toks, cache)
    ld, _ = base.forward(densef, cfg, toks, cache2)
    lq, ld = lq.astype(jnp.float32), ld.astype(jnp.float32)
    rel = float(jnp.linalg.norm(lq - ld) / jnp.linalg.norm(ld))
    assert rel < 0.15, rel
    # greedy next-token usually agrees on a random model; require most
    # positions to match
    agree = float(jnp.mean((jnp.argmax(lq, -1) == jnp.argmax(ld, -1))
                           .astype(jnp.float32)))
    assert agree >= 0.5, agree


def test_channel_embedding_gather():
    from ominix_mlx_tpu.nn.layers import embedding
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32) * 0.1
    cq = qm.channel_quantize(w)
    toks = jnp.asarray([[1, 5, 63]])
    got = embedding(cq, toks).astype(jnp.float32)
    want = w[jnp.asarray([1, 5, 63])][None]
    assert float(jnp.max(jnp.abs(got - want))) < 0.01


@pytest.mark.parametrize("bits", [4, 8])
def test_panels_t_roundtrip_gather_matmul(bits):
    """Transposed-panel decode layout (to_panels_t): codes round-trip
    exactly, scales/biases within the bf16 fold error, gather_rows and the
    dense-fallback matmul match the row-major layout."""
    rng = np.random.default_rng(0)
    N, K = 1536, 2560
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
    pq = qm.prepare(quantize_tensor(w, 64, bits), act_bits=8)
    pt = qm.to_panels_t(pq)
    assert pt.tn and pt.shape == pq.shape
    u0, u1 = qm.unpack(pq), qm.unpack(pt)
    assert int(jnp.max(jnp.abs(u0.q.astype(jnp.int32)
                               - u1.q.astype(jnp.int32)))) == 0
    assert float(jnp.max(jnp.abs(
        u0.scales.astype(jnp.float32) - u1.scales.astype(jnp.float32)))) \
        < 1e-6
    # bits=4 folds b - 8s through bf16: one-ulp error at |b|~8s is expected
    assert float(jnp.max(jnp.abs(
        u0.biases.astype(jnp.float32) - u1.biases.astype(jnp.float32)))) \
        < 0.05
    toks = jnp.asarray(rng.integers(0, N, (7,)), jnp.int32)
    g0 = qm.gather_rows(pq, toks).astype(jnp.float32)
    g1 = qm.gather_rows(pt, toks).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(g0 - g1))
                 / (jnp.max(jnp.abs(g0)) + 1e-9)) < 0.02
    for M in (1, 4):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        y0 = qm.quantized_matmul(x, pq).astype(jnp.float32)
        y1 = qm.quantized_matmul(x, pt).astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-9))
        assert rel < 0.05, (bits, M, rel)


def test_transpose_packed_params_walks_tree():
    """fuse_layer_projections re-tiles group-quantized trees into the
    transposed-panel layout; model forward still matches the dense model."""
    cfg = TransformerConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64)
    dense = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = base.quantize_params(dict(dense), group_size=64, bits=4,
                              consume=False)
    qp = base.fuse_layer_projections(qp)
    densef = base.fuse_layer_projections(dense)
    tiled = [w for w in jax.tree.leaves(
        qp, is_leaf=lambda x: isinstance(x, qm.PackedQuantizedTensor))
        if isinstance(x := w, qm.PackedQuantizedTensor) and x.tn]
    assert tiled, "no tensor was re-tiled by fuse_layer_projections"
    toks = jnp.arange(8)[None]
    lq, _ = base.forward(qp, cfg, toks, base.init_cache(cfg, 1, 16,
                                                        jnp.bfloat16))
    ld, _ = base.forward(densef, cfg, toks, base.init_cache(cfg, 1, 16,
                                                            jnp.bfloat16))
    rel = float(jnp.linalg.norm(lq.astype(jnp.float32)
                                - ld.astype(jnp.float32))
                / jnp.linalg.norm(ld.astype(jnp.float32)))
    assert rel < 0.2, rel


def test_quantize_tree_channel8():
    """scheme="channel8" swaps eligible weights for ChannelQuantizedTensor
    (pure XLA int8 path) and nn.layers.linear dispatches on the leaf; used
    by the zimage bench to fit the 6B DiT in 16GB HBM."""
    import jax

    from ominix_mlx_tpu.core.quant import quantize_tree
    from ominix_mlx_tpu.nn.layers import linear
    from ominix_mlx_tpu.ops.quant_matmul import ChannelQuantizedTensor

    key = jax.random.PRNGKey(0)
    tree = {"big": {"w": jax.random.normal(key, (512, 640), jnp.float32)},
            "small": {"w": jax.random.normal(key, (128, 128), jnp.float32)},
            # in-dim not 128-aligned: must stay dense
            "odd": {"w": jax.random.normal(key, (512, 320), jnp.float32)}}
    q = quantize_tree(tree, scheme="channel8", min_dim=512)
    assert isinstance(q["big"]["w"], ChannelQuantizedTensor)
    assert not isinstance(q["small"]["w"], ChannelQuantizedTensor)
    assert not isinstance(q["odd"]["w"], ChannelQuantizedTensor)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 640), jnp.float32)
    import numpy as np
    got = np.asarray(linear(q["big"], x))
    want = np.asarray(linear(tree["big"], x))
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 0.05, rel
