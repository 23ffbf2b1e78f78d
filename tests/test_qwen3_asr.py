"""Qwen3-ASR encoder tests: conv-length formula, sinusoid layout, block
mask windows, end-to-end encode shapes, and decoder splice smoke."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import base, qwen3_asr as asr

TINY = asr.AudioEncoderConfig(
    num_mel_bins=32, encoder_layers=2, encoder_attention_heads=4,
    encoder_ffn_dim=64, d_model=32, output_dim=48,
    downsample_hidden_size=16, n_window=50, n_window_infer=200)


def test_out_length_formula():
    # reference: encoder.rs:76-80 — 13 tokens per full 100-frame chunk
    assert asr.out_length(100) == 13
    assert asr.out_length(200) == 26
    assert asr.out_length(250) == 26 + asr.out_length(50)
    assert asr.out_length(1) == 1


def test_sinusoid_layout():
    e = asr.sinusoid_positions(4, 8)
    assert e.shape == (4, 8)
    np.testing.assert_allclose(e[0, :4], 0.0, atol=1e-9)   # sin(0)
    np.testing.assert_allclose(e[0, 4:], 1.0, atol=1e-9)   # cos(0)
    np.testing.assert_allclose(e[1, 0], np.sin(1.0), rtol=1e-6)


@pytest.mark.slow
def test_encode_shapes_full_and_partial_chunks():
    params = asr.init_encoder_params(TINY, jax.random.PRNGKey(0))
    for n_frames in (200, 250):
        pad = (-n_frames) % 100
        mel = jax.random.normal(jax.random.PRNGKey(1),
                                (TINY.num_mel_bins, n_frames + pad))
        out = asr.encode(params, TINY, mel, n_frames)
        assert out.shape == (asr.out_length(n_frames), TINY.output_dim)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_chunks_are_convolved_independently():
    """The conv stack must not leak across 100-frame chunk boundaries
    (the reference convolves each chunk separately, encoder.rs:304-370).
    Tokens of chunk 0 must be identical whatever chunk 1 contains.
    The block-windowed attention DOES mix chunks inside a window, so
    compare at a window boundary (n_window_infer=200 -> 2 chunks/window):
    use 4 chunks and change only the last window's content."""
    params = asr.init_encoder_params(TINY, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (TINY.num_mel_bins, 400))
    a = asr.encode(params, TINY, mel, 400)
    mel2 = mel.at[:, 200:].multiply(3.0)
    b = asr.encode(params, TINY, mel2, 400)
    tpw = 26  # tokens per 200-frame window
    np.testing.assert_allclose(np.asarray(a[:tpw]), np.asarray(b[:tpw]),
                               rtol=2e-4, atol=2e-4)
    assert not np.allclose(np.asarray(a[tpw:]), np.asarray(b[tpw:]))


@pytest.mark.slow
def test_transcribe_embeds_smoke():
    lm_cfg = base.TransformerConfig(
        vocab_size=64, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=12, intermediate_size=64,
        use_qk_norm=True, tie_word_embeddings=True)
    lm_params = base.init_params(lm_cfg, jax.random.PRNGKey(2), jnp.float32)
    enc_params = asr.init_encoder_params(TINY, jax.random.PRNGKey(0))
    m = asr.Qwen3ASR(enc_params, TINY, lm_params, lm_cfg)
    samples = jnp.asarray(np.random.default_rng(0)
                          .normal(size=8000).astype(np.float32))
    # frontend uses 128 mels by default; tiny encoder wants 32
    mel = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (32, 100)))
    feats = asr.encode(enc_params, TINY, jnp.asarray(mel), 100)
    # project features into lm hidden size for the splice smoke test
    feats = feats[:, :lm_cfg.hidden_size]
    toks = m.transcribe_embeds(feats, jnp.asarray([1, 2]),
                               jnp.asarray([3]), max_tokens=4)
    assert len(toks) == 4 and all(0 <= t < 64 for t in toks)
