"""Unit tests for the shared inference core (quant, rope, cache, masks,
sampling) — mirrors the reference's inline #[cfg(test)] style (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.core import quant
from ominix_mlx_tpu.core.attention import causal_mask, sdpa
from ominix_mlx_tpu.core.cache import KVCache, ModelCache
from ominix_mlx_tpu.core.rope import apply_rope, make_rope
from ominix_mlx_tpu.core.sampling import SamplerConfig, sample


# ------------------------------------------------------------ quant ---------

@pytest.mark.parametrize("bits,group_size", [(4, 64), (8, 64), (4, 32), (8, 32)])
def test_quantize_roundtrip(bits, group_size):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (32, 128), jnp.float32)
    qt = quant.quantize_tensor(w, group_size, bits)
    w_hat = quant.dequantize(qt, jnp.float32)
    # group-affine quant error bound: half a step per element
    max_step = (w.max() - w.min()) / ((1 << bits) - 1)
    assert jnp.max(jnp.abs(w - w_hat)) <= max_step


def test_pack_unpack_inverse():
    rng = np.random.default_rng(0)
    for bits in (4, 8):
        codes = rng.integers(0, 1 << bits, size=(8, 64), dtype=np.uint32)
        packed = quant.pack_codes(jnp.asarray(codes), bits)
        unpacked = quant.unpack_to_int8(packed, bits)
        if bits == 8:
            unpacked = unpacked.view(jnp.uint8)
        np.testing.assert_array_equal(np.asarray(unpacked, dtype=np.uint32), codes)


def test_quantized_matmul_matches_dequant():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (64, 128), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128), jnp.float32)
    qt = quant.quantize_tensor(w, 64, 8)
    y1 = quant.quantized_matmul(x, qt, dtype=jnp.float32)
    y2 = x @ quant.dequantize(qt, jnp.float32).T
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- rope ---------

def test_rope_matches_hf_rotate_half():
    """Cross-check against the standard HF rotate-half formulation."""
    B, H, T, D = 1, 2, 5, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, D), jnp.float32)
    cfg = make_rope(D, theta=10000.0)
    pos = jnp.arange(T)
    got = apply_rope(x, pos, cfg)

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    ang = np.arange(T)[:, None] * inv_freq[None, :]          # [T, D/2]
    cos = np.cos(np.concatenate([ang, ang], -1))             # [T, D]
    sin = np.sin(np.concatenate([ang, ang], -1))
    xn = np.asarray(x)
    rot = np.concatenate([-xn[..., D // 2:], xn[..., :D // 2]], -1)
    want = xn * cos + rot * sin
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rope_partial_passthrough():
    D = 8
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 3, D))
    cfg = make_rope(D, partial_rotary_factor=0.5)
    got = apply_rope(x, jnp.arange(3), cfg)
    np.testing.assert_allclose(np.asarray(got[..., D // 2:]),
                               np.asarray(x[..., D // 2:]), rtol=1e-3)
    assert not np.allclose(np.asarray(got[..., 1:D // 2]),
                           np.asarray(x[..., 1:D // 2]))


def test_rope_offset_consistency():
    """Applying rope at offset o must equal slicing a full-sequence apply."""
    D, T = 8, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, T, D))
    cfg = make_rope(D)
    full = apply_rope(x, jnp.arange(T), cfg)
    part = apply_rope(x[:, :, 3:], jnp.arange(3, T), cfg)
    np.testing.assert_allclose(np.asarray(full[:, :, 3:]), np.asarray(part),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------ cache ---------

def test_kv_cache_update_and_mask():
    c = KVCache.init(1, 2, 16, 4, jnp.float32)
    k1 = jnp.ones((1, 2, 3, 4))
    c = c.update(k1, k1 * 2, jnp.int32(0))
    c = c.update(k1 * 3, k1 * 4, jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(c.k[0, 0, :6, 0]),
                                  [1, 1, 1, 3, 3, 3])
    assert float(c.k[0, 0, 6, 0]) == 0.0


def test_causal_mask_offset_window():
    m = causal_mask(2, 8, jnp.int32(3))
    ok = np.asarray(m) == 0
    # query absolute positions 3,4
    np.testing.assert_array_equal(ok[0], [1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(ok[1], [1, 1, 1, 1, 1, 0, 0, 0])
    mw = causal_mask(1, 8, jnp.int32(5), window=3)
    np.testing.assert_array_equal(np.asarray(mw)[0] == 0,
                                  [0, 0, 0, 1, 1, 1, 0, 0])


# ------------------------------------------------------------- sdpa ---------

def test_sdpa_gqa_matches_repeated_heads():
    B, H, Hkv, T, S, D = 1, 4, 2, 3, 8, 16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, T, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, S, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, S, D))
    mask = causal_mask(T, S, jnp.int32(2))
    got = sdpa(q, k, v, D ** -0.5, mask)
    # naive: repeat kv heads
    kr = jnp.repeat(k, H // Hkv, axis=1)
    vr = jnp.repeat(v, H // Hkv, axis=1)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, kr) * D ** -0.5 + mask
    want = jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(logits, -1), vr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------------- sampling ---------

def test_sample_argmax_and_topk():
    logits = jnp.asarray([[0.1, 3.0, 0.2, -1.0]])
    assert int(sample(logits, None, SamplerConfig())[0]) == 1
    # top-k=1 at any temperature must return argmax
    t = sample(logits, jax.random.PRNGKey(0),
               SamplerConfig(temperature=1.0, top_k=1))
    assert int(t[0]) == 1


def test_sample_top_p_excludes_tail():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    cfg = SamplerConfig(temperature=1.0, top_p=0.7)
    toks = [int(sample(logits, jax.random.PRNGKey(i), cfg)[0]) for i in range(50)]
    assert set(toks) <= {0, 1}


def test_repetition_penalty_shifts_distribution():
    logits = jnp.asarray([[2.0, 2.0]])
    recent = jnp.asarray([[0, -1, -1, -1]], jnp.int32)
    cfg = SamplerConfig(repetition_penalty=5.0)
    assert int(sample(logits, None, cfg, recent)[0]) == 1


def test_eos_steering():
    from ominix_mlx_tpu.core.sampling import apply_eos_steering
    logits = jnp.zeros((1, 8))
    early = apply_eos_steering(logits, 3, jnp.int32(0), 5, 100)
    assert np.isneginf(np.asarray(early)[0, 3])
    late = apply_eos_steering(logits, 3, jnp.int32(99), 5, 100)
    assert np.asarray(late)[0, 3] > 5.0


def test_recurrent_layers_match_torch():
    """GRU/LSTM vs torch (gate conventions torch-compatible so weight maps
    are mechanical; reference layer set mlx-rs/src/nn/recurrent.rs)."""
    import pytest
    torch = pytest.importorskip("torch")
    from ominix_mlx_tpu.nn import layers as L

    B, T, I, H = 2, 5, 3, 4
    x = np.random.default_rng(0).normal(size=(B, T, I)).astype("f4")

    tg = torch.nn.GRU(I, H, batch_first=True)
    p = {"wx": jnp.asarray(tg.weight_ih_l0.detach().numpy()),
         "wh": jnp.asarray(tg.weight_hh_l0.detach().numpy()),
         "b": jnp.asarray(tg.bias_ih_l0.detach().numpy()),
         "bhn": None}
    # torch adds bias_hh inside the gates; fold r/z parts into b, keep n
    bhh = tg.bias_hh_l0.detach().numpy()
    p["b"] = p["b"] + jnp.asarray(np.concatenate([bhh[:2 * H], np.zeros(H, "f4")]))
    p["bhn"] = jnp.asarray(bhh[2 * H:])
    want, _ = tg(torch.from_numpy(x))
    got, _ = L.gru(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)

    tl = torch.nn.LSTM(I, H, batch_first=True)
    pl = {"wx": jnp.asarray(tl.weight_ih_l0.detach().numpy()),
          "wh": jnp.asarray(tl.weight_hh_l0.detach().numpy()),
          "b": jnp.asarray((tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy())}
    want, _ = tl(torch.from_numpy(x))
    got, _ = L.lstm(pl, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_pooling_and_upsample():
    from ominix_mlx_tpu.nn import layers as L
    x = jnp.arange(8.0).reshape(1, 8, 1)
    np.testing.assert_allclose(
        np.asarray(L.max_pool1d(x, 2))[0, :, 0], [1, 3, 5, 7])
    np.testing.assert_allclose(
        np.asarray(L.avg_pool1d(x, 2))[0, :, 0], [0.5, 2.5, 4.5, 6.5])
    img = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = L.upsample(img, 2, "nearest")
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(up[0, :, :, 0]),
                               [[0, 0, 1, 1], [0, 0, 1, 1],
                                [2, 2, 3, 3], [2, 2, 3, 3]])
