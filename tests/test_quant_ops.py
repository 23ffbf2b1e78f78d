"""Tests for the packed quantized-matmul op layer (CPU fallback paths) and
fused projections. The Pallas kernels themselves are TPU-only; their
correctness is pinned by the same dequantize() ground truth used here."""

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
        np.testing.assert_array_equal(np.asarray(rt.scales), np.asarray(qt.scales))


def test_quantized_matmul_fallback_matches_dequant():
    for bits in (4, 8):
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 128), jnp.float32)
        qt = quantize_tensor(w, 64, bits)
        y = qm.quantized_matmul(x, qm.prepare(qt))
        want = x @ dequantize(qt, jnp.float32).T
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


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
