"""Qwen-Image MMDiT + 3D-causal VAE tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import qwen_image as qi
from ominix_mlx_tpu.models.dit import vae3d

TINY = qi.QwenImageConfig(dim=48, num_heads=4, head_dim=12, num_layers=2,
                          in_channels=8, txt_dim=24, axes_dim=(4, 4, 4))


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


def test_vae3d_decode_shapes():
    cfg = vae3d.VAE3DConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4, temporal_upsample=(False, True))
    params = vae3d.init_decoder(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 4))
    img = vae3d.decode(params, cfg, z)
    # one spatial upsample level (x2), temporal x2 on level 1
    assert img.shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()
