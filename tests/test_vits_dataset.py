"""VITS dataset loader: .list parsing, fixed-crop static batches, and a
real trainer step straight off the loader's output."""

import pytest

import numpy as np

from ominix_mlx_tpu.training.dataset import DatasetConfig, VITSDataset

SR = 16000


def _make_list(tmp_path, n=3):
    from ominix_mlx_tpu.audio import io as audio_io
    lines = []
    for i in range(n):
        t = np.arange(SR) / SR
        wav = (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        audio_io.save_wav(str(p), wav, SR)
        lines.append(f"{p}|spk|en|hello world {i}")
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


DCFG = DatasetConfig(sample_rate=SR, n_fft=256, hop=16, crop_frames=24,
                     max_text=12, ref_frames=10)


def test_batches_static_shapes(tmp_path):
    ds = VITSDataset(_make_list(tmp_path), DCFG)
    assert len(ds) == 3
    batches = list(ds.batches(batch_size=2, seed=0))
    assert len(batches) == 1                       # drop_last
    b = batches[0]
    assert b["codes"].shape == (2, 12)
    assert b["text"].shape == (2, 12)
    assert b["spec"].shape == (2, 24, 129)
    assert b["refer_spec"].shape == (2, 10, 129)
    assert b["wav"].shape == (2, 24 * 16)
    assert b["text"].max() > 0                     # frontend produced phones


def test_codes_fn_wiring(tmp_path):
    calls = []

    def fake_codes(wav16):
        calls.append(len(wav16))
        return np.arange(len(wav16) // 320, dtype=np.int32) % 7

    ds = VITSDataset(_make_list(tmp_path, 1), DCFG, codes_fn=fake_codes)
    b = next(ds.batches(1, drop_last=False))
    assert calls and b["codes"].max() < 7 and b["codes"].shape == (1, 12)


@pytest.mark.slow
def test_trainer_step_from_loader(tmp_path):
    import jax
    import jax.numpy as jnp

    from ominix_mlx_tpu.models import vits
    from ominix_mlx_tpu.training import gan
    from ominix_mlx_tpu.training.vits_trainer import (VITSGanTrainer,
                                                      VITSTrainConfig,
                                                      vits_training_forward)

    cfg = vits.VITSConfig(
        spec_channels=129, inter_channels=32, hidden_channels=32,
        filter_channels=64, n_heads=2, n_layers=2, n_symbols=800, ssl_dim=48,
        codebook_size=64, gin_channels=24, upsample_initial_channel=64,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        flow_layers=2, wn_layers=2, wn_kernel=5)
    tcfg = VITSTrainConfig(segment_frames=8, mel_n_fft=64, mel_hop=16,
                           n_mels=8)
    ds = VITSDataset(_make_list(tmp_path), DCFG)
    batch = {k: jnp.asarray(v) for k, v in
             next(ds.batches(batch_size=2, seed=1)).items()}
    trainer = VITSGanTrainer(
        lambda p, b, k: vits_training_forward(p, cfg, tcfg, b, k),
        vits.init_params(cfg, jax.random.PRNGKey(0)),
        gan.init_combined(jax.random.PRNGKey(1), mpd_channels=(4, 8),
                          msd_channels=(4, 8, 8, 8, 8, 8)),
        tcfg=tcfg, sample_rate=SR)
    out = trainer.step(batch, jax.random.PRNGKey(2))
    assert all(np.isfinite(v) for v in out.values()), out
