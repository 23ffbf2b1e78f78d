"""Fine-tune the SoVITS decoder on a labeled dataset.

End-to-end s2 training flow (reference gpt-sovits-mlx training/ + its
preprocess examples):

  1. prepare data:  python examples/preprocess_dataset.py raw/ data/
  2. train:         python examples/train_vits.py data/train.list out/

Runs on random-init weights out of the box; pass --resume to continue from
a checkpoint directory.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("list_path")
    ap.add_argument("out_dir")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--crop-frames", type=int, default=100)
    ap.add_argument("--sample-rate", type=int, default=32000)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug / while the TPU is "
                         "held by another process)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ominix_mlx_tpu.models import vits
    from ominix_mlx_tpu.training import gan
    from ominix_mlx_tpu.training.dataset import DatasetConfig, VITSDataset
    from ominix_mlx_tpu.training.vits_trainer import (VITSGanTrainer,
                                                      VITSTrainConfig,
                                                      vits_training_forward)

    cfg = vits.VITSConfig(sampling_rate=args.sample_rate)
    tcfg = VITSTrainConfig(segment_frames=min(32, args.crop_frames))
    dcfg = DatasetConfig(sample_rate=args.sample_rate,
                         crop_frames=args.crop_frames)
    ds = VITSDataset(args.list_path, dcfg)
    print(f"{len(ds)} samples from {args.list_path}")

    trainer = VITSGanTrainer(
        lambda p, b, k: vits_training_forward(p, cfg, tcfg, b, k),
        vits.init_params(cfg, jax.random.PRNGKey(0)),
        gan.init_combined(jax.random.PRNGKey(1)),
        tcfg=tcfg, sample_rate=args.sample_rate)
    if args.resume:
        trainer.load_checkpoint(args.resume)
        print(f"resumed from {args.resume} at step {trainer.step_count}")

    step = trainer.step_count
    key = jax.random.PRNGKey(42)
    while step < args.steps:
        for batch in ds.batches(args.batch_size, seed=step):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            losses = trainer.step(batch, key)
            step = trainer.step_count
            print(f"step {step}: " + " ".join(
                f"{k}={v:.3f}" for k, v in losses.items()), flush=True)
            if step % args.save_every == 0 or step >= args.steps:
                trainer.save_checkpoint(args.out_dir)
            if step >= args.steps:
                break
    trainer.save_checkpoint(args.out_dir)
    print(f"saved -> {args.out_dir}")


if __name__ == "__main__":
    main()
