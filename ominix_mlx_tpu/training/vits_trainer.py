"""VITS/SoVITS GAN fine-tuning: the s2 training loop, TPU-jitted.

Behavior parity with reference gpt-sovits-mlx/src/training/vits_trainer.rs
(1065 LoC): posterior-encoder + flow training path, random latent-segment
slicing (slice_segments_by_ids, vits_trainer.rs:73-112), LSGAN losses with
c_mel=45 / c_kl=1 (VITSTrainingConfig, vits_trainer.rs:117-176), alternating
discriminator/generator Adam steps. TPU design: both steps are single jits
(grads + optimizer update fused), the segment slice is a vmapped
dynamic_slice (static segment length), and batches are static-shaped.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ominix_mlx_tpu.models import vits
from ominix_mlx_tpu.training import gan


@dataclasses.dataclass
class VITSTrainConfig:
    segment_frames: int = 32       # latent frames per slice (seg samples / hop)
    c_mel: float = 45.0
    c_kl: float = 1.0
    c_fm: float = 2.0              # feature-matching weight (folded in gan.py)
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    n_mels: int = 80
    mel_n_fft: int = 1024
    mel_hop: int = 256


def slice_segments(x: jax.Array, starts: jax.Array, length: int) -> jax.Array:
    """[B, T, ...] + per-row starts -> [B, length, ...] (static length)."""

    def one(row, s):
        return jax.lax.dynamic_slice_in_dim(row, s, length, axis=0)

    return jax.vmap(one)(x, starts)


def vits_training_forward(params: dict, cfg: vits.VITSConfig,
                          tcfg: VITSTrainConfig, batch: Dict, key):
    """Full s2 training path: ref-encoder conditioning, quantized SSL ->
    text encoder prior, posterior from the linear spec, flow to prior space,
    sliced waveform synthesis.

    batch: codes [B,Tc] int32, text [B,Tt] int32, spec [B,Ts,spec_channels]
    (Ts == 2*Tc), refer_spec [B,Tr,spec_channels], wav [B, Ts*hop].
    Returns (wav_fake_seg, wav_real_seg, aux_losses).
    """
    k_post, k_slice = jax.random.split(key)
    ge = vits.mel_style_encoder(params["ref_enc"], cfg, batch["refer_spec"])
    ssl = vits.rvq_decode(params["quantizer"]["codebook"], batch["codes"])
    ssl = jnp.repeat(ssl, 2, axis=1)                       # 25Hz -> 50Hz
    m_p, logs_p = vits.text_encoder(params["enc_p"], cfg, ssl, batch["text"],
                                    ge)
    z, m_q, logs_q = vits.posterior_encoder(params["enc_q"], cfg,
                                            batch["spec"], ge, k_post)
    z_p = vits.flow_forward(params["flow"], cfg, z, ge)
    mask = jnp.ones(z_p.shape[:2] + (1,))
    kl = gan.kl_loss(z_p, logs_q, m_p, logs_p, mask)

    hop = 1
    for r in cfg.upsample_rates:
        hop *= r
    T = z.shape[1]
    seg = tcfg.segment_frames
    starts = jax.random.randint(k_slice, (z.shape[0],), 0, max(T - seg, 0) + 1)
    z_seg = slice_segments(z, starts, seg)
    wav_fake = vits.generator(params["dec"], cfg, z_seg, ge)   # [B, seg*hop]
    wav_real = slice_segments(batch["wav"][..., None], starts * hop,
                              seg * hop)[..., 0]
    return wav_fake, wav_real, {"kl": tcfg.c_kl * kl}


class VITSGanTrainer:
    """Alternating D/G optimization. ``gen_forward(params, batch, key) ->
    (wav_fake, wav_real, aux_losses)`` decouples the trainer from VITS so
    HiFiGAN-style vocoders train with the same loop."""

    def __init__(self, gen_forward, gen_params, disc_params,
                 tcfg: VITSTrainConfig = VITSTrainConfig(),
                 sample_rate: int = 32000,
                 disc_forward=gan.combined_discriminator):
        self.tcfg = tcfg
        self.gen_params = gen_params
        self.disc_params = disc_params
        self.opt_g = optax.adam(tcfg.lr_g, b1=tcfg.betas[0], b2=tcfg.betas[1])
        self.opt_d = optax.adam(tcfg.lr_d, b1=tcfg.betas[0], b2=tcfg.betas[1])
        self.opt_state_g = self.opt_g.init(gen_params)
        self.opt_state_d = self.opt_d.init(disc_params)
        self.step_count = 0

        def mel_loss(real, fake):
            return gan.mel_l1_loss(real, fake, sample_rate=sample_rate,
                                   n_fft=tcfg.mel_n_fft, hop=tcfg.mel_hop,
                                   n_mels=tcfg.n_mels)

        def d_loss_fn(dp, gp, batch, key):
            wav_fake, wav_real, _ = gen_forward(gp, batch, key)
            wav_fake = jax.lax.stop_gradient(wav_fake)
            r_outs, _ = disc_forward(dp, wav_real)
            f_outs, _ = disc_forward(dp, wav_fake)
            return gan.discriminator_loss(r_outs, f_outs)

        def d_step(dp, opt_d, gp, batch, key):
            loss, grads = jax.value_and_grad(d_loss_fn)(dp, gp, batch, key)
            updates, opt_d = self.opt_d.update(grads, opt_d, dp)
            return optax.apply_updates(dp, updates), opt_d, loss

        self._d_step = jax.jit(d_step, donate_argnums=(0, 1))

        def g_loss_fn(gp, dp, batch, key):
            wav_fake, wav_real, aux = gen_forward(gp, batch, key)
            f_outs, f_feats = disc_forward(dp, wav_fake)
            _, r_feats = disc_forward(dp, wav_real)
            l_adv = gan.generator_adv_loss(f_outs)
            l_fm = gan.feature_matching_loss(r_feats, f_feats)
            l_mel = tcfg.c_mel * jax.vmap(mel_loss)(wav_real, wav_fake).mean()
            total = l_adv + l_fm + l_mel + sum(aux.values())
            return total, {"adv": l_adv, "fm": l_fm, "mel": l_mel, **aux}

        def g_step(gp, opt_g, dp, batch, key):
            (loss, parts), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gp, dp, batch, key)
            updates, opt_g = self.opt_g.update(grads, opt_g, gp)
            return optax.apply_updates(gp, updates), opt_g, loss, parts

        self._g_step = jax.jit(g_step, donate_argnums=(0, 1))

    def step(self, batch: Dict, key) -> Dict[str, float]:
        """One alternating D then G update (vits_trainer.rs training loop)."""
        kd, kg = jax.random.split(jax.random.fold_in(key, self.step_count))
        self.disc_params, self.opt_state_d, d_loss = self._d_step(
            self.disc_params, self.opt_state_d, self.gen_params, batch, kd)
        self.gen_params, self.opt_state_g, g_loss, parts = self._g_step(
            self.gen_params, self.opt_state_g, self.disc_params, batch, kg)
        self.step_count += 1
        out = {"d_loss": float(d_loss), "g_loss": float(g_loss)}
        out.update({k: float(v) for k, v in parts.items()})
        return out

    # ------------------------------------------------------- checkpoints ----

    def save_checkpoint(self, path: str):
        import json
        import os

        import numpy as np
        from safetensors.numpy import save_file

        from ominix_mlx_tpu.training.trainer import _key
        os.makedirs(path, exist_ok=True)
        tree = {"gen": self.gen_params, "disc": self.disc_params}
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        save_file({_key(p): np.asarray(v) for p, v in flat},
                  os.path.join(path, "gan_params.safetensors"))
        with open(os.path.join(path, "gan_state.json"), "w") as f:
            json.dump({"step": self.step_count}, f)

    def load_checkpoint(self, path: str):
        import json
        import os

        from safetensors.numpy import load_file
        from ominix_mlx_tpu.training.trainer import _key
        data = load_file(os.path.join(path, "gan_params.safetensors"))
        tree = {"gen": self.gen_params, "disc": self.disc_params}
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = [jnp.asarray(data[_key(p)]) for p, _ in flat]
        tree = jax.tree_util.tree_unflatten(treedef, leaves)
        self.gen_params, self.disc_params = tree["gen"], tree["disc"]
        with open(os.path.join(path, "gan_state.json")) as f:
            self.step_count = json.load(f)["step"]
