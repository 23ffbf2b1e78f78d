"""Qwen3-TTS tests: causal conv properties, SnakeBeta, codec decode
upsampling, dual-track frame generation end-to-end (tiny random weights)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import qwen3_tts as tts
from ominix_mlx_tpu.models import qwen3_tts as qt
from ominix_mlx_tpu.models.base import TransformerConfig

TINY = tts.TalkerConfig(
    transformer=TransformerConfig(
        vocab_size=1, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96),
    codec_vocab_size=32, codec_head_size=40, num_code_groups=16,
    text_vocab_size=128, text_embed_dim=48, cp_hidden=32, cp_layers=1,
    cp_heads=2, codec_eos_id=33, codec_bos_id=35, tts_pad_token_id=100)


def test_causal_conv_is_causal():
    key = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(key, (4, 5, 4)), "b": jnp.zeros(4)}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 4))
    y1 = tts.causal_conv1d(p, x)
    x2 = x.at[:, 8:].multiply(100.0)   # change the future
    y2 = tts.causal_conv1d(p, x2)
    assert y1.shape == (1, 12, 4)
    np.testing.assert_allclose(np.asarray(y1[:, :8]), np.asarray(y2[:, :8]),
                               rtol=1e-5)


def test_snake_beta_formula():
    p = {"alpha_exp": jnp.full((1, 1, 3), 2.0),
         "beta_exp": jnp.full((1, 1, 3), 4.0)}
    x = jnp.asarray([[[0.5, -1.0, 0.0]]])
    got = np.asarray(tts.snake_beta(p, x))
    want = np.asarray(x) + np.sin(2.0 * np.asarray(x)) ** 2 / (4.0 + 1e-9)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_conv_transpose_upsamples():
    p = {"w": jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4)) * 0.1,
         "b": jnp.zeros(4)}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 4))
    y = tts.causal_conv_transpose1d(p, x, stride=2)
    assert y.shape == (1, 12, 4)


@pytest.mark.slow
def test_codec_decode_shapes():
    dec, cfg = tts.init_codec(jax.random.PRNGKey(0), frame_dim=32,
                              up_strides=(2,), dec_strides=(2, 2))
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 64, (5, 16)),
                        jnp.int32)
    wav = tts.codec_decode(dec, codes, cfg)
    # upsample factor: 2 (convnext) * 2 * 2 (decoder blocks) = 8
    assert wav.shape == (5 * 8,)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


@pytest.mark.slow
def test_dual_track_generation():
    params = tts.init_params(TINY, jax.random.PRNGKey(0))
    synth = tts.Synthesizer(params, TINY)
    res = synth.synthesize_codes(text_tokens=[5, 9, 3],
                                 codec_prefix=[36, 37, 38, 39],
                                 max_frames=4)
    assert res.codes.shape[1] == 16
    assert 0 <= res.frames <= 4
    if res.frames:
        assert (res.codes[:, 1:] < TINY.codec_vocab_size).all()
        # deterministic
        res2 = tts.Synthesizer(params, TINY).synthesize_codes(
            [5, 9, 3], [36, 37, 38, 39], max_frames=4)
        np.testing.assert_array_equal(res.codes, res2.codes)


@pytest.mark.slow
def test_streaming_session_chunks():
    params = tts.init_params(TINY, jax.random.PRNGKey(0))
    dec, ccfg = tts.init_codec(jax.random.PRNGKey(1), frame_dim=32,
                               up_strides=(2,), dec_strides=(2, 2),
                               codec_vocab=TINY.codec_vocab_size)
    synth = tts.Synthesizer(params, TINY, dec, ccfg)
    chunks = list(synth.stream([5, 9, 3], [36, 37, 38, 39],
                               chunk_frames=2, max_frames=4))
    if chunks:  # random model may emit EOS immediately
        total = sum(len(c) for c in chunks)
        assert total % 8 == 0  # upsample factor 8 per frame


@pytest.mark.slow
def test_speaker_encoder_xvector_shape_and_padding_invariance():
    from ominix_mlx_tpu.models import speaker_encoder as se
    cfg = se.SpeakerEncoderConfig(
        mel_dim=16, enc_dim=32, enc_channels=(24, 24, 24, 24, 48),
        enc_kernel_sizes=(5, 3, 3, 3, 1), enc_dilations=(1, 2, 3, 4, 1),
        enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8)
    p = se.init_params(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 16))
    v = se.speaker_encoder(p, cfg, mel)
    assert v.shape == (2, 32)
    assert np.isfinite(np.asarray(v)).all()
    # a longer reference should give a different (but finite) vector
    mel2 = jnp.concatenate([mel, mel], axis=1)
    v2 = se.speaker_encoder(p, cfg, mel2)
    assert v2.shape == (2, 32)


def test_mrope_temporal_only_rotation():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 16))
    y = qt.apply_mrope_tts(x, 0, temporal_section=4)
    # identity at position 0 (cos=1, sin=0 everywhere)
    np.testing.assert_allclose(np.asarray(y[:, :, 0]),
                               np.asarray(x[:, :, 0]), rtol=1e-5, atol=1e-5)
    y5 = qt.apply_mrope_tts(x, 5, temporal_section=4)
    # non-temporal pairs (beyond section) never rotate
    np.testing.assert_allclose(np.asarray(y5[..., 8:]),
                               np.asarray(x[..., 8:]), rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(y5[..., :8]), np.asarray(x[..., :8]))


@pytest.mark.slow
def test_speech_encoder_codes_shape():
    enc, ecfg = qt.init_speech_encoder(jax.random.PRNGKey(0), dim=16,
                                       enc_strides=(2, 2), codec_vocab=32)
    samples = jax.random.normal(jax.random.PRNGKey(1), (1, 64))
    codes = qt.speech_encode(enc, ecfg, samples)
    assert codes.shape[0] == 1 and codes.shape[2] == 16
    assert codes.shape[1] == 64 // (2 * 2 * 2)   # strides 2,2 + downsample 2
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()


@pytest.mark.slow
def test_voice_clone_generation_runs():
    tcfg = qt.TalkerConfig(transformer=TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=2, head_dim=16, intermediate_size=48),
        codec_vocab_size=32, codec_head_size=40, text_vocab_size=128,
        text_embed_dim=16, cp_hidden=16, cp_layers=1, cp_heads=2,
        codec_eos_id=33, codec_pad_id=34, codec_bos_id=35,
        tts_pad_token_id=100)
    tp = qt.init_params(tcfg, jax.random.PRNGKey(0))
    syn = qt.Synthesizer(tp, tcfg)
    ref_codes = np.random.default_rng(0).integers(0, 31, (3, 16))
    res = syn.synthesize_voice_clone(
        ref_text_tokens=[5, 9], text_tokens=[11, 3, 7],
        ref_codes=ref_codes, max_frames=4)
    assert res.codes.shape[1] == 16 if res.frames else res.frames == 0
    assert res.frames <= 4
