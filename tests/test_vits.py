"""VITS/SoVITS decoder tests: flow invertibility, generator length
arithmetic, end-to-end decode shape, weight-norm folding."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import vits

SMALL = vits.VITSConfig(
    spec_channels=129, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=2, n_symbols=40, ssl_dim=48,
    codebook_size=64, gin_channels=24, upsample_initial_channel=64,
    upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    flow_layers=2, wn_layers=2, wn_kernel=5)


@pytest.mark.slow
def test_flow_is_invertible():
    p = vits.init_params(SMALL, jax.random.PRNGKey(0))
    # non-zero post weights so the coupling actually does something
    for lp in p["flow"]["flows"]:
        lp["post"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), lp["post"]["w"].shape) * 0.1
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 10, SMALL.inter_channels))
    g = jax.random.normal(jax.random.PRNGKey(3), (1, SMALL.gin_channels))
    fwd = vits.flow_forward(p["flow"], SMALL, z, g)
    assert not np.allclose(np.asarray(fwd), np.asarray(z))
    back = vits.flow_reverse(p["flow"], SMALL, fwd, g)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_generator_length_arithmetic():
    p = vits.init_params(SMALL, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 12, SMALL.inter_channels))
    g = jax.random.normal(jax.random.PRNGKey(2), (1, SMALL.gin_channels))
    wav = vits.generator(p["dec"], SMALL, z, g)
    hop = int(np.prod(SMALL.upsample_rates))
    assert wav.shape == (1, 12 * hop)
    assert float(jnp.max(jnp.abs(wav))) <= 1.0


@pytest.mark.slow
def test_sovits_decode_end_to_end_shape():
    p = vits.init_params(SMALL, jax.random.PRNGKey(0))
    codes = jnp.asarray([[3, 17, 5, 60, 2, 9]], jnp.int32)      # 6 frames
    text = jnp.asarray([[1, 4, 9, 2, 7]], jnp.int32)
    spec = jax.random.normal(jax.random.PRNGKey(1), (1, 20, SMALL.spec_channels))
    wav = vits.sovits_decode(p, SMALL, codes, text, spec)
    hop = int(np.prod(SMALL.upsample_rates))
    assert wav.shape == (1, 6 * 2 * hop)                         # 2x upsample
    assert np.isfinite(np.asarray(wav)).all()


def test_fold_weight_norm():
    v = np.random.default_rng(0).normal(size=(8, 4, 3)).astype(np.float32)
    g = np.abs(np.random.default_rng(1).normal(size=(8, 1, 1))).astype(np.float32)
    flat = {"dec.ups.0.weight_v": jnp.asarray(v),
            "dec.ups.0.weight_g": jnp.asarray(g),
            "other.weight": jnp.ones((2, 2))}
    out = vits.fold_weight_norm(flat)
    w = np.asarray(out["dec.ups.0.weight"])
    norms = np.linalg.norm(w.reshape(8, -1), axis=1)
    np.testing.assert_allclose(norms, g[:, 0, 0], rtol=1e-4)
    assert "other.weight" in out and "dec.ups.0.weight_v" not in out


@pytest.mark.slow
def test_text_encoder_and_style_encoder_shapes():
    p = vits.init_params(SMALL, jax.random.PRNGKey(0))
    spec = jax.random.normal(jax.random.PRNGKey(1), (2, 15, SMALL.spec_channels))
    ge = vits.mel_style_encoder(p["ref_enc"], SMALL, spec)
    assert ge.shape == (2, SMALL.gin_channels)
    ssl = jax.random.normal(jax.random.PRNGKey(2), (2, 8, SMALL.ssl_dim))
    text = jnp.ones((2, 5), jnp.int32)
    m, logs = vits.text_encoder(p["enc_p"], SMALL, ssl, text, ge)
    assert m.shape == (2, 8, SMALL.inter_channels)
    assert logs.shape == m.shape


@pytest.mark.slow
def test_voice_cloner_full_stack():
    """text -> frontend -> T2S -> VITS decode on random weights (the
    reference's e2e shape, voice_clone.rs:740)."""
    from ominix_mlx_tpu.models import gpt_sovits as gs
    from ominix_mlx_tpu.models.base import TransformerConfig
    from ominix_mlx_tpu.text.frontend import TextFrontend

    tcfg = gs.T2SConfig(
        phoneme_vocab=800, semantic_vocab=1025, bert_dim=16,
        transformer=TransformerConfig(
            vocab_size=1025, hidden_size=32, num_layers=1, num_heads=2,
            num_kv_heads=2, head_dim=16, intermediate_size=48))
    t2s = gs.init_t2s(tcfg, jax.random.PRNGKey(0))
    vp = vits.init_params(SMALL, jax.random.PRNGKey(1))
    fe = TextFrontend(cmu_table={"HI": ["HH", "AY1"]})
    vc = gs.VoiceCloner(t2s, tcfg, vits_params=vp, vits_cfg=SMALL,
                        frontend=fe)
    vc.set_reference_semantics(np.asarray([5, 9, 2]))
    vc.set_reference_spec(np.random.default_rng(0).normal(
        size=(12, SMALL.spec_channels)).astype(np.float32))
    wav = vc.synthesize("hi", key=jax.random.PRNGKey(2), max_tokens=6)
    hop = int(np.prod(SMALL.upsample_rates))
    assert wav.ndim == 1 and wav.shape[0] % (2 * hop) == 0
    if wav.shape[0]:
        assert np.isfinite(wav).all()


def test_onnx_initializer_roundtrip_bitexact(tmp_path):
    """save_onnx_initializers -> load_onnx_initializers is bit-exact for
    every dtype the importer maps (VERDICT r3 item 8)."""
    from ominix_mlx_tpu.utils.onnx_export import save_onnx_initializers
    from ominix_mlx_tpu.utils.onnx_import import load_onnx_initializers

    rng = np.random.default_rng(0)
    named = {
        "a.weight": rng.standard_normal((3, 5, 7)).astype(np.float32),
        "b.bias": rng.standard_normal((11,)).astype(np.float64),
        "c.idx": rng.integers(-4, 4, (2, 6)).astype(np.int64),
        "d.half": rng.standard_normal((4, 4)).astype(np.float16),
        "e.scalar1d": np.asarray([2.5], np.float32),
    }
    path = str(tmp_path / "w.onnx")
    save_onnx_initializers(named, path)
    got = load_onnx_initializers(path)
    assert set(got) == set(named)
    for k, v in named.items():
        assert got[k].dtype == v.dtype and got[k].shape == v.shape, k
        np.testing.assert_array_equal(got[k], v, err_msg=k)


@pytest.mark.slow
def test_vits_onnx_export_import_forward_parity(tmp_path):
    """export_vits_onnx emits the published GPT-SoVITS tensor names;
    load_vits_from_onnx must invert it (name-for-name exercise of the
    checkpoint map, reference examples/export_vits_onnx.rs) and the
    re-imported params must synthesize the identical waveform."""
    from ominix_mlx_tpu.utils.onnx_export import export_vits_onnx
    from ominix_mlx_tpu.utils.onnx_import import load_vits_from_onnx

    import dataclasses
    cfg = dataclasses.replace(SMALL, gin_channels=SMALL.hidden_channels)
    p0 = vits.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "vits.onnx")
    n = export_vits_onnx(p0, cfg, path)
    assert n > 100, n
    p1 = load_vits_from_onnx(path, cfg)

    codes = jnp.asarray([[3, 17, 5, 60, 2, 9]], jnp.int32)
    text = jnp.asarray([[1, 4, 9, 2, 7]], jnp.int32)
    spec = jax.random.normal(jax.random.PRNGKey(1),
                             (1, 20, cfg.spec_channels))
    w0 = np.asarray(vits.sovits_decode(p0, cfg, codes, text, spec))
    w1 = np.asarray(vits.sovits_decode(p1, cfg, codes, text, spec))
    np.testing.assert_allclose(w1, w0, rtol=1e-5, atol=1e-5)
