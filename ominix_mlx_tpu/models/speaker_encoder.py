"""ECAPA-TDNN speaker (x-vector) encoder for Qwen3-TTS voice cloning.

TPU-native counterpart of reference qwen3-tts-mlx/src/speaker_encoder.rs
(722 LoC): TDNN -> 3x SE-Res2Net (scale 8) -> MFA concat -> attentive
statistics pooling -> fc to the talker hidden size, so the output embeds
directly as the SPK slot of the codec prefix (lib.rs:545).

All convs run channels-last [B, T, C] on the MXU; the Res2Net hierarchy is
a static python loop over channel groups (8 small convs — XLA fuses the
chain; the groups are too small to matter at speaker-mel lengths).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv1d


@dataclasses.dataclass(frozen=True)
class SpeakerEncoderConfig:
    """Defaults: speaker_encoder.rs:63-89 (enc_dim picks 0.6b/1.7b)."""
    mel_dim: int = 128
    enc_dim: int = 2048
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128


def _tdnn(p: dict, x: jax.Array, k: int, d: int) -> jax.Array:
    return jax.nn.relu(conv1d(p, x, padding=(k - 1) * d // 2, dilation=d))


def _res2net(p: dict, x: jax.Array, k: int, d: int, scale: int) -> jax.Array:
    """Hierarchical multi-scale convs over channel groups (Res2Net)."""
    chunks = jnp.split(x, scale, axis=-1)
    outs = [chunks[0]]
    y = None
    for i in range(1, scale):
        xi = chunks[i] if y is None else chunks[i] + y
        y = _tdnn(p["blocks"][i - 1], xi, k, d)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _se(p: dict, x: jax.Array) -> jax.Array:
    s = x.mean(axis=1, keepdims=True)
    s = jax.nn.relu(conv1d(p["conv1"], s))
    s = jax.nn.sigmoid(conv1d(p["conv2"], s))
    return x * s


def _se_res2net(p: dict, cfg: SpeakerEncoderConfig, x: jax.Array, k: int,
                d: int) -> jax.Array:
    res = x
    y = _tdnn(p["tdnn1"], x, 1, 1)
    y = _res2net(p["res2net"], y, k, d, cfg.enc_res2net_scale)
    y = _tdnn(p["tdnn2"], y, 1, 1)
    y = _se(p["se"], y)
    return y + res


def _attentive_stats(p: dict, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """[B, T, C] -> [B, 2C] attention-weighted mean/std
    (speaker_encoder.rs:224-289: ctx = [x, mean, std] -> tdnn -> tanh ->
    conv -> softmax over T)."""
    B, T, C = x.shape
    mean = x.mean(axis=1, keepdims=True)
    std = jnp.sqrt(((x - mean) ** 2).mean(axis=1, keepdims=True) + eps)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1)                                          # [B, T, 3C]
    a = jnp.tanh(_tdnn(p["tdnn"], ctx, 1, 1))
    a = conv1d(p["conv"], a)                              # [B, T, C]
    a = jax.nn.softmax(a, axis=1)
    mu = jnp.sum(a * x, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(a * x * x, axis=1) - mu ** 2, eps))
    return jnp.concatenate([mu, sg], axis=-1)             # [B, 2C]


def speaker_encoder(params: dict, cfg: SpeakerEncoderConfig,
                    mel: jax.Array) -> jax.Array:
    """mel [B, T, mel_dim] -> x-vector [B, enc_dim] (== talker hidden)."""
    ch, ks, ds = cfg.enc_channels, cfg.enc_kernel_sizes, cfg.enc_dilations
    x = _tdnn(params["tdnn0"], mel, ks[0], ds[0])
    feats: List[jax.Array] = []
    for i in range(1, 4):
        x = _se_res2net(params["blocks"][i - 1], cfg, x, ks[i], ds[i])
        feats.append(x)
    x = jnp.concatenate(feats, axis=-1)                   # MFA concat
    x = _tdnn(params["mfa"], x, ks[4], ds[4])             # -> 1536
    x = _attentive_stats(params["asp"], x)                # [B, 2*1536]
    return conv1d(params["fc"], x[:, None, :])[:, 0]      # [B, enc_dim]


def init_params(cfg: SpeakerEncoderConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))

    def conv_p(cin, cout, k):
        s = (cin * k) ** -0.5
        return {"w": jax.random.uniform(next(ks), (cout, k, cin), dtype,
                                        -s, s),
                "b": jnp.zeros((cout,), dtype)}

    ch, kz = cfg.enc_channels, cfg.enc_kernel_sizes
    sc = cfg.enc_res2net_scale

    def se_res2net_p(c, k):
        return {
            "tdnn1": conv_p(c, c, 1),
            "res2net": {"blocks": [conv_p(c // sc, c // sc, k)
                                   for _ in range(sc - 1)]},
            "tdnn2": conv_p(c, c, 1),
            "se": {"conv1": conv_p(c, cfg.enc_se_channels, 1),
                   "conv2": conv_p(cfg.enc_se_channels, c, 1)},
        }

    return {
        "tdnn0": conv_p(cfg.mel_dim, ch[0], kz[0]),
        "blocks": [se_res2net_p(ch[i], kz[i]) for i in range(1, 4)],
        "mfa": conv_p(ch[0] * 3, ch[4], kz[4]),
        "asp": {"tdnn": conv_p(3 * ch[4], cfg.enc_attention_channels, 1),
                "conv": conv_p(cfg.enc_attention_channels, ch[4], 1)},
        "fc": conv_p(2 * ch[4], cfg.enc_dim, 1),
    }


def params_from_flat(flat: dict, cfg: SpeakerEncoderConfig,
                     prefix: str = "speaker_encoder") -> dict:
    """Load from torch-layout weights (Conv1d [out, in, k] -> [out, k, in])."""
    def conv(name):
        w = jnp.asarray(flat[f"{prefix}.{name}.weight"])
        p = {"w": jnp.transpose(w, (0, 2, 1))}
        if f"{prefix}.{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{prefix}.{name}.bias"])
        return p

    sc = cfg.enc_res2net_scale
    return {
        "tdnn0": conv("blocks.0.conv"),
        "blocks": [{
            "tdnn1": conv(f"blocks.{i}.tdnn1.conv"),
            "res2net": {"blocks": [conv(f"blocks.{i}.res2net_block.blocks.{j}.conv")
                                   for j in range(sc - 1)]},
            "tdnn2": conv(f"blocks.{i}.tdnn2.conv"),
            "se": {"conv1": conv(f"blocks.{i}.se_block.conv1"),
                   "conv2": conv(f"blocks.{i}.se_block.conv2")},
        } for i in (1, 2, 3)],
        "mfa": conv("mfa.conv"),
        "asp": {"tdnn": conv("asp.tdnn.conv"), "conv": conv("asp.conv")},
        "fc": conv("fc"),
    }
