"""FLUX.2-klein DiT tests: pack/unpack roundtrip, schedule properties,
axis-RoPE norm preservation, end-to-end tiny-model generate."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import flux_klein as fk
from ominix_mlx_tpu.models.dit import common, vae

TINY = fk.FluxKleinConfig(
    in_channels=16, hidden_size=64, txt_embed_dim=32, num_heads=4,
    depth=1, depth_single=2, head_dim=16, mlp_hidden=96,
    axes_dim=(4, 4, 4, 4), rope_theta=2000.0)
TINY_VAE = vae.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=4)


def test_pack_unpack_roundtrip():
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    p = fk.pack_latent(z, 2)
    assert p.shape == (2, 16, 16)
    back = fk.unpack_latent(p, 4, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z))


def test_flux_schedule_monotone():
    ts = common.flux_schedule(4096, 4)
    assert ts.shape == (5,)
    assert ts[0] > 0.9 and ts[-1] < 1e-6
    assert (np.diff(ts) < 0).all()


def test_shifted_linear_schedule():
    s = common.shifted_linear_schedule(9, shift=3.0)
    assert s[0] == 1.0 and s[-1] == 0.0 and (np.diff(s) < 0).all()


def test_axis_rope_preserves_norm():
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 8, (1, 6, 4)),
                      jnp.float32)
    cos, sin = common.compute_axis_rope(ids, (4, 4, 4, 4), 2000.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 2, 16))
    r = common.apply_rope_interleaved(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(r), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # position 0 on all axes = identity rotation
    ids0 = jnp.zeros((1, 1, 4))
    c0, s0 = common.compute_axis_rope(ids0, (4, 4, 4, 4), 2000.0)
    x0 = x[:, :1]
    np.testing.assert_allclose(
        np.asarray(common.apply_rope_interleaved(x0, c0, s0)),
        np.asarray(x0), atol=1e-6)


@pytest.mark.slow
def test_forward_shapes():
    params = fk.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, TINY.in_channels))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 3, TINY.txt_embed_dim))
    txt_ids, img_ids = fk.make_ids(1, 4, 4, 3)
    cos, sin = common.compute_axis_rope(
        jnp.concatenate([txt_ids, img_ids], 1), TINY.axes_dim, 2000.0)
    v = fk.forward(params, TINY, img, txt, jnp.asarray([500.0]), cos, sin)
    assert v.shape == (1, 16, TINY.in_channels)
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_generate_image_tiny_end_to_end():
    params = fk.init_params(TINY, jax.random.PRNGKey(0), jnp.float32)
    vparams = vae.init_decoder(TINY_VAE, jax.random.PRNGKey(1))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 3, TINY.txt_embed_dim),
                            jnp.float32)
    # height/width: latent = H/8; patch 2 -> ph = H/16
    img = fk.generate_image(params, TINY, vparams, TINY_VAE, txt,
                            height=32, width=32, num_steps=2)
    assert img.shape == (1, 32, 32, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0


@pytest.mark.slow
def test_vae_encode_decode_shapes():
    enc = vae.init_encoder(TINY_VAE, jax.random.PRNGKey(0))
    dec = vae.init_decoder(TINY_VAE, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    z = vae.encode(enc, TINY_VAE, x)
    assert z.shape == (1, 8, 8, TINY_VAE.z_channels)
    y = vae.decode(dec, TINY_VAE, z)
    assert y.shape == (1, 16, 16, 3)
