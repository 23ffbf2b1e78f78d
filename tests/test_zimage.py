"""Z-Image DiT tests: 3-axis RoPE properties, tiny end-to-end generation."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import zimage as zi
from ominix_mlx_tpu.models.dit import vae

TINY = zi.ZImageConfig(dim=48, n_heads=4, n_layers=2, n_refiner_layers=1,
                       in_channels=4, cap_feat_dim=32, axes_dims=(4, 4, 4),
                       rope_theta=256.0, patch_size=2)
TINY_VAE = vae.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)


def test_rope3_norm_preserved():
    pos = jnp.asarray(np.random.default_rng(0).integers(0, 5, (1, 6, 3)),
                      jnp.float32)
    cos, sin = zi.rope_3axis(pos, (4, 4, 4), 256.0)
    assert cos.shape == (1, 6, 1, 6)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 12))
    r = zi.apply_rope_3axis(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(r), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_coordinate_grid():
    g = zi.coordinate_grid((1, 2, 3), (5, 0, 0))
    assert g.shape == (6, 3)
    np.testing.assert_array_equal(g[0], [5, 0, 0])
    np.testing.assert_array_equal(g[-1], [5, 1, 2])


@pytest.mark.slow
def test_generate_image_tiny():
    params = zi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    vparams = vae.init_decoder(TINY_VAE, jax.random.PRNGKey(1))
    cap = jax.random.normal(jax.random.PRNGKey(2), (1, 3, TINY.cap_feat_dim),
                            jnp.float32)
    img = zi.generate_image(params, TINY, vparams, TINY_VAE, cap,
                            height=16, width=16, num_steps=2)
    assert img.shape == (1, 16, 16, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and 0.0 <= a.min() and a.max() <= 1.0


def test_params_from_flat_roundtrip():
    p0 = zi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    p1 = zi.params_from_flat(zi.flat_from_params(p0, TINY), TINY)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p0, p1)


class _FakeTok:
    def encode(self, text):
        return [ord(c) % 32 for c in text][:24]


@pytest.mark.slow
def test_image_generator_end_to_end():
    """prompt -> Qwen3 layer-(n-1) features -> refiners+joint -> flux VAE."""
    from ominix_mlx_tpu.models import base

    tcfg = base.TransformerConfig(
        vocab_size=32, hidden_size=TINY.cap_feat_dim, num_layers=2,
        num_heads=2, num_kv_heads=1, intermediate_size=48, head_dim=8,
        use_qk_norm=True, tie_word_embeddings=True)
    gen = zi.ImageGenerator(
        params=zi.init_params(TINY, jax.random.PRNGKey(0), jnp.float32),
        cfg=TINY,
        vae_params=vae.init_decoder(TINY_VAE, jax.random.PRNGKey(1)),
        vae_cfg=TINY_VAE,
        text_params=base.init_params(tcfg, jax.random.PRNGKey(2),
                                     jnp.float32),
        text_cfg=tcfg, tokenizer=_FakeTok())
    img = gen.generate("a red square", height=16, width=16, num_steps=2)
    assert img.ndim == 3 and img.shape[-1] == 3
    assert np.isfinite(np.asarray(img)).all()
