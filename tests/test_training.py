"""Training subsystem: loss decreases on a tiny LM, checkpoint save/resume
roundtrip (the reference T2STrainer pattern), GAN loss sanity."""

import tempfile

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.training import gan
from ominix_mlx_tpu.training.trainer import Trainer, lm_loss

CFG = TransformerConfig(
    vocab_size=32, hidden_size=32, num_layers=1, num_heads=2,
    num_kv_heads=1, head_dim=16, intermediate_size=48,
    tie_word_embeddings=True)


def test_lm_training_loss_decreases():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    loss_fn = lm_loss(base.forward, CFG, base.init_cache)
    tr = Trainer(loss_fn, params, lr=3e-3)
    batch = {"tokens": jnp.asarray(
        np.tile(np.arange(8), (4, 2)))}   # repetitive -> learnable
    losses = [tr.step(batch) for _ in range(20)]
    assert losses[-1] < losses[0] * 0.9, losses[::5]
    assert tr.state.step == 20


def test_checkpoint_roundtrip():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    loss_fn = lm_loss(base.forward, CFG, base.init_cache)
    tr = Trainer(loss_fn, params, lr=1e-3)
    batch = {"tokens": jnp.ones((2, 8), jnp.int32)}
    for _ in range(3):
        tr.step(batch)
    with tempfile.TemporaryDirectory() as d:
        tr.save_checkpoint(d)
        tr2 = Trainer(loss_fn, base.init_params(CFG, jax.random.PRNGKey(1),
                                                jnp.float32), lr=1e-3)
        tr2.load_checkpoint(d)
        assert tr2.state.step == 3
        l1 = tr.step(batch)
        l2 = tr2.step(batch)
        assert abs(l1 - l2) < 1e-5


@pytest.mark.slow
def test_gan_losses_and_mpd():
    mpd = gan.init_mpd(jax.random.PRNGKey(0))
    wav_r = jax.random.normal(jax.random.PRNGKey(1), (1, 1024))
    wav_f = jax.random.normal(jax.random.PRNGKey(2), (1, 1024))
    ro, rf = gan.multi_period_discriminator(mpd, wav_r)
    fo, ff = gan.multi_period_discriminator(mpd, wav_f)
    assert len(ro) == len(gan.PERIODS)
    d = gan.discriminator_loss(ro, fo)
    g = gan.generator_adv_loss(fo)
    fm = gan.feature_matching_loss(rf, ff)
    for v in (d, g, fm):
        assert np.isfinite(float(v)) and float(v) >= 0
