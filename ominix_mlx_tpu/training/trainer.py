"""Training subsystem: generic optax trainer with checkpoint/resume.

TPU-native counterpart of the reference's only trainers (GPT-SoVITS):
  - ``T2STrainer`` with TrainingState (step/epoch/loss) and save/load
    checkpoints (gpt-sovits-mlx/src/training/trainer.rs:44-340)
  - LR schedule (warmup + decay) per vits_trainer.rs

Design: one jitted ``train_step`` (value_and_grad + optax update, donated
state) that works for any (params, batch) -> loss function, and shards over
a mesh when given param specs (parallel/mesh.py) — the reference is
single-device; multi-chip data/tensor parallel training is the TPU addition.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ominix_mlx_tpu.utils.loading import save_safetensors


@dataclasses.dataclass
class TrainingState:
    """Reference: trainer.rs:24 TrainingState."""
    step: int = 0
    epoch: int = 0
    best_loss: float = float("inf")

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "TrainingState":
        return TrainingState(**json.loads(s))


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  min_lr: float = 0.0):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr)


class Trainer:
    def __init__(self, loss_fn: Callable, params, optimizer=None,
                 lr: float = 1e-4, grad_clip: float = 1.0):
        """loss_fn(params, batch) -> scalar loss (pure)."""
        self.loss_fn = loss_fn
        self.params = params
        tx = optimizer or optax.adamw(lr)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        self.tx = tx
        self.opt_state = tx.init(params)
        self.state = TrainingState()
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 1))

    def _step_impl(self, params, opt_state, batch):
        loss, grads = jax.value_and_grad(self.loss_fn)(params, batch)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(self, batch) -> float:
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch)
        self.state.step += 1
        return float(loss)

    # -------------------------------------------------- checkpointing -------

    def save_checkpoint(self, path: str):
        """Params + opt state + TrainingState (trainer.rs:285-340)."""
        os.makedirs(path, exist_ok=True)
        flat, _ = jax.tree_util.tree_flatten_with_path(self.params)
        save_safetensors(os.path.join(path, "params.safetensors"),
                         {_key(k): v for k, v in flat})
        oflat, _ = jax.tree_util.tree_flatten_with_path(self.opt_state)
        save_safetensors(os.path.join(path, "opt_state.safetensors"),
                         {_key(k): v for k, v in oflat})
        with open(os.path.join(path, "training_state.json"), "w") as f:
            f.write(self.state.to_json())

    def load_checkpoint(self, path: str):
        from safetensors import safe_open

        def load_into(tree, fname):
            flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
            with safe_open(os.path.join(path, fname), framework="flax") as f:
                leaves = [f.get_tensor(_key(k)) for k, _ in flat]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        self.params = load_into(self.params, "params.safetensors")
        self.opt_state = load_into(self.opt_state, "opt_state.safetensors")
        with open(os.path.join(path, "training_state.json")) as f:
            self.state = TrainingState.from_json(f.read())


def _key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return ".".join(parts)


# --------------------------------------------------------- LM training ------

def lm_loss(forward_fn, cfg, init_cache_fn):
    """Next-token cross-entropy over a [B, T] token batch — T2S-style AR
    training (reference: trainer.rs:137-208)."""

    def loss(params, batch):
        tokens = batch["tokens"]
        cache = init_cache_fn(cfg, tokens.shape[0], tokens.shape[1],
                              jnp.float32)
        logits, _ = forward_fn(params, cfg, tokens, cache)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        if "mask" in batch:
            m = batch["mask"][:, 1:]
            return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
        return nll.mean()

    return loss
