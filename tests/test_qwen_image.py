"""Qwen-Image MMDiT + 3D-causal VAE tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import qwen_image as qi
from ominix_mlx_tpu.models.dit import vae3d

TINY = qi.QwenImageConfig(dim=48, num_heads=4, head_dim=12, num_layers=2,
                          in_channels=8, txt_dim=24, axes_dim=(4, 4, 4))


@pytest.mark.slow
def test_mmdit_forward_and_denoise():
    params = qi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(1), (1, 3, TINY.txt_dim),
                            jnp.float32)
    z = qi.generate_latents(params, TINY, txt, ph=2, pw=2, num_steps=2)
    assert z.shape == (1, 4, TINY.in_channels)
    assert np.isfinite(np.asarray(z)).all()


def test_causal_conv3d_is_temporally_causal():
    p = {"w": jax.random.normal(jax.random.PRNGKey(0), (4, 3, 3, 3, 4)) * 0.1,
         "b": jnp.zeros(4)}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 4, 4, 4))
    y1 = vae3d.causal_conv3d(p, x)
    x2 = x.at[:, 4:].multiply(50.0)   # change future frames
    y2 = vae3d.causal_conv3d(p, x2)
    assert y1.shape == (1, 6, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_vae3d_decode_shapes():
    cfg = vae3d.VAE3DConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4, temporal_upsample=(False, True))
    params = vae3d.init_decoder(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 4))
    img = vae3d.decode(params, cfg, z)
    # one spatial upsample level (x2), temporal x2 on level 1
    assert img.shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_params_from_flat_roundtrip():
    """init -> flat (diffusers names) -> params_from_flat is identity."""
    p0 = qi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    p1 = qi.params_from_flat(qi.flat_from_params(p0), TINY)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p0, p1)


def test_txt_mask_matches_unpadded():
    """Masked-out padded txt tokens must not change the velocity field."""
    params = qi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(1), (1, 3, TINY.txt_dim),
                            jnp.float32)
    z = qi.generate_latents(params, TINY, txt, ph=2, pw=2, num_steps=2)
    pad = jnp.concatenate(
        [txt, 7.0 * jnp.ones((1, 2, TINY.txt_dim), jnp.float32)], 1)
    mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 0.0]])
    zp = qi.generate_latents(params, TINY, pad, ph=2, pw=2, num_steps=2,
                             txt_mask=mask)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zp), rtol=2e-4,
                               atol=2e-4)


def test_cfg_with_identical_prompts_matches_uncond():
    """v_u + s*(v_c - v_u) == v when cond == uncond, any scale."""
    params = qi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(1), (1, 3, TINY.txt_dim),
                            jnp.float32)
    z = qi.generate_latents(params, TINY, txt, ph=2, pw=2, num_steps=2)
    zc = qi.generate_latents(params, TINY, txt, ph=2, pw=2, num_steps=2,
                             neg_txt=txt, cfg_scale=4.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zc), rtol=2e-4,
                               atol=2e-4)


def test_text_encoder_hf_parity():
    """encode_hidden over the Qwen2.5-VL-style text stack (GQA + qkv bias)
    matches transformers' Qwen2Model hidden states (reference
    text_encoder.rs:1-4: the encoder IS the Qwen2 decoder stack run
    causally, last_hidden_state)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2Model

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.utils.loading import torch_to_jnp

    d = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             intermediate_size=48, rope_theta=1e6, rms_norm_eps=1e-6,
             attention_bias=True, model_type="qwen2")
    torch.manual_seed(0)
    hf = Qwen2Model(Qwen2Config(**d)).eval()
    cfg = base.TransformerConfig.from_hf(d)
    flat = {f"model.{k}": torch_to_jnp(v).astype(jnp.float32)
            for k, v in hf.state_dict().items()}
    params = base.params_from_flat(flat, cfg)
    toks = np.array([[5, 17, 42, 3, 9, 60]])
    with torch.no_grad():
        want = hf(torch.tensor(toks)).last_hidden_state.numpy()
    got = base.encode_hidden(params, cfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


class _FakeTok:
    def encode(self, text):
        return [ord(c) % 64 for c in text][:40]


@pytest.mark.slow
def test_image_generator_end_to_end():
    """prompt string -> encoder -> MMDiT denoise -> 3D VAE -> [H, W, 3]."""
    from ominix_mlx_tpu.models import base

    tcfg = base.TransformerConfig(
        vocab_size=64, hidden_size=TINY.txt_dim, num_layers=1, num_heads=2,
        num_kv_heads=1, intermediate_size=32, head_dim=12,
        attention_bias=True, tie_word_embeddings=True)
    vcfg = vae3d.VAE3DConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                             z_channels=TINY.in_channels // 4,
                             temporal_upsample=(False, False))
    gen = qi.ImageGenerator(
        params=qi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32),
        cfg=TINY,
        vae_params=vae3d.init_decoder(vcfg, jax.random.PRNGKey(1)),
        vae_cfg=vcfg,
        text_params=base.init_params(tcfg, jax.random.PRNGKey(2),
                                     jnp.float32),
        text_cfg=tcfg, tokenizer=_FakeTok())
    # vf = 8*patch would need height%16==0 but the tiny VAE upsamples 2x:
    # drive generate_latents + decode through generate() at a matching size
    img = gen.generate("a cat", height=16, width=16, num_steps=2)
    # tiny VAE: 2x spatial upsample only -> (16/16 latents) ... just check
    # rank/finite/range
    assert img.ndim == 3 and img.shape[-1] == 3
    assert np.isfinite(np.asarray(img)).all()
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
