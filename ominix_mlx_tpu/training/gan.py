"""GAN training pieces for vocoder fine-tuning (VITS/SoVITS-style).

TPU-native counterpart of reference gpt-sovits-mlx training:
  - ``MultiPeriodDiscriminator`` (training/discriminator.rs, 765 LoC)
  - mel / KL / feature-matching / adversarial losses
    (training/vits_loss.rs; vits_trainer.rs:117-290)
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.audio.dsp import log_mel_spectrogram
from ominix_mlx_tpu.nn.layers import conv1d, conv2d, init_linear

PERIODS = (2, 3, 5, 7, 11)


# ------------------------------------------------------------- losses -------

def discriminator_loss(real_outs: Sequence[jax.Array],
                       fake_outs: Sequence[jax.Array]) -> jax.Array:
    """LSGAN: sum (1 - D(y))^2 + D(y_hat)^2 (vits_loss.rs)."""
    loss = 0.0
    for r, f in zip(real_outs, fake_outs):
        loss += jnp.mean((1.0 - r) ** 2) + jnp.mean(f ** 2)
    return loss


def generator_adv_loss(fake_outs: Sequence[jax.Array]) -> jax.Array:
    return sum(jnp.mean((1.0 - f) ** 2) for f in fake_outs)


def feature_matching_loss(real_feats: Sequence[List[jax.Array]],
                          fake_feats: Sequence[List[jax.Array]]) -> jax.Array:
    loss = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f))
    return loss * 2.0


def mel_l1_loss(wav_real: jax.Array, wav_fake: jax.Array,
                sample_rate: int = 32000, n_fft: int = 1024,
                hop: int = 256, n_mels: int = 80) -> jax.Array:
    mr = log_mel_spectrogram(wav_real, n_fft, hop, n_mels, sample_rate,
                             log_base="log", whisper_norm=False)
    mf = log_mel_spectrogram(wav_fake, n_fft, hop, n_mels, sample_rate,
                             log_base="log", whisper_norm=False)
    return jnp.mean(jnp.abs(mr - mf))


def kl_loss(z_p, logs_q, m_p, logs_p, mask) -> jax.Array:
    """Prior/posterior KL (vits_loss.rs)."""
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * (z_p - m_p) ** 2 * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ------------------------------------------------- discriminators -----------

def _norm_conv2d(p, x, stride):
    return jax.nn.leaky_relu(
        conv2d(p, x, stride=(stride, 1), padding=(2, 0)), 0.1)


def period_discriminator(p: dict, wav: jax.Array, period: int):
    """wav [B, T] -> (score, feature maps). 1D signal folded to 2D by
    period (discriminator.rs MultiPeriodDiscriminator)."""
    B, T = wav.shape
    pad = (-T) % period
    x = jnp.pad(wav, ((0, 0), (0, pad))).reshape(B, -1, period, 1)
    feats = []
    for i, conv in enumerate(p["convs"]):
        x = _norm_conv2d(conv, x, stride=3 if i < len(p["convs"]) - 1 else 1)
        feats.append(x)
    x = conv2d(p["post"], x, padding=(1, 0))
    feats.append(x)
    return x.reshape(B, -1), feats


def multi_period_discriminator(params: dict, wav: jax.Array):
    """-> (scores per period, feature maps per period)."""
    outs, feats = [], []
    for p, period in zip(params["discriminators"], PERIODS):
        o, f = period_discriminator(p, wav, period)
        outs.append(o)
        feats.append(f)
    return outs, feats


def init_mpd(key, channels=(16, 64, 256), dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * len(PERIODS)))

    def conv_p(cin, cout, k=(5, 1)):
        return {"w": jax.random.normal(next(ks), (cout, k[0], k[1], cin),
                                       dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    discs = []
    for _ in PERIODS:
        convs = []
        cin = 1
        for c in channels:
            convs.append(conv_p(cin, c))
            cin = c
        discs.append({"convs": convs, "post": conv_p(cin, 1, (3, 1))})
    return {"discriminators": discs}


# -------------------------------------------- scale discriminator -----------

# (kernel, stride, padding) per layer — DiscriminatorS channel/stride plan
# (reference gpt-sovits-mlx/src/models/discriminator.rs:30-110)
_MSD_SPECS = ((15, 1, 7), (41, 4, 20), (41, 4, 20), (41, 4, 20),
              (41, 4, 20), (5, 1, 2))


def scale_discriminator(p: dict, wav: jax.Array):
    """wav [B, T] -> (score, feature maps): strided 1D convs on the raw
    waveform (DiscriminatorS; complements the period-folded views)."""
    x = wav[:, :, None]
    feats = []
    for conv, (k, s, pad) in zip(p["convs"], _MSD_SPECS):
        x = jax.nn.leaky_relu(conv1d(conv, x, stride=s, padding=pad), 0.1)
        feats.append(x)
    x = conv1d(p["post"], x, padding=1)
    feats.append(x)
    return x.reshape(x.shape[0], -1), feats


def init_msd(key, channels=(16, 64, 256, 1024, 1024, 1024),
             dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, len(channels) + 1))

    def conv_p(cin, cout, k):
        return {"w": jax.random.normal(next(ks), (cout, k, cin),
                                       dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    convs, cin = [], 1
    for c, (k, _, _) in zip(channels, _MSD_SPECS):
        convs.append(conv_p(cin, c, k))
        cin = c
    return {"convs": convs, "post": conv_p(cin, 1, 3)}


def combined_discriminator(params: dict, wav: jax.Array):
    """DiscriminatorS + MultiPeriodDiscriminator, the reference's
    MultiPeriodDiscriminator wrapper (discriminator.rs:398)."""
    s_out, s_feats = scale_discriminator(params["msd"], wav)
    p_outs, p_feats = multi_period_discriminator(params["mpd"], wav)
    return [s_out] + p_outs, [s_feats] + p_feats


def init_combined(key, mpd_channels=(16, 64, 256),
                  msd_channels=(16, 64, 256, 1024, 1024, 1024),
                  dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"msd": init_msd(k1, msd_channels, dtype),
            "mpd": init_mpd(k2, mpd_channels, dtype)}
