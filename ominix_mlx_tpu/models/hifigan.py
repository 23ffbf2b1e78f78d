"""HiFiGAN vocoder: mel (or token features) -> waveform.

TPU-native counterpart of reference step-audio2-mlx/src/tts/hifigan.rs:
upsampling transpose convs interleaved with multi-receptive-field (MRF)
ResBlocks, leaky-relu, tanh output. Shared by the Step-Audio-2 TTS backend
and reusable for any HiFiGAN checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv1d, conv_transpose1d


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    in_dim: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def resblock(p: dict, x: jax.Array, kernel: int, dilations) -> jax.Array:
    for d, c1, c2 in zip(dilations, p["convs1"], p["convs2"]):
        h = conv1d(c1, _lrelu(x), padding=(kernel - 1) * d // 2, dilation=d)
        h = conv1d(c2, _lrelu(h), padding=(kernel - 1) // 2)
        x = x + h
    return x


def vocode(params: dict, cfg: HiFiGANConfig, mel: jax.Array) -> jax.Array:
    """mel: [B, T, in_dim] -> waveform [B, T * prod(rates)]."""
    x = conv1d(params["conv_pre"], mel, padding=3)
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates,
                                      cfg.upsample_kernel_sizes)):
        x = conv_transpose1d(params["ups"][i], _lrelu(x), stride=rate,
                             padding=(k - rate) // 2)
        acc = None
        for j, (kr, dil) in enumerate(zip(cfg.resblock_kernel_sizes,
                                          cfg.resblock_dilations)):
            r = resblock(params["resblocks"][i][j], x, kr, dil)
            acc = r if acc is None else acc + r
        x = acc / len(cfg.resblock_kernel_sizes)
    x = conv1d(params["conv_post"], _lrelu(x), padding=3)
    return jnp.tanh(x)[..., 0]


def init_params(cfg: HiFiGANConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 400))

    def c(cin, cout, k):
        return {"w": jax.random.normal(next(ks), (cout, k, cin), dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    ch = cfg.upsample_initial_channel
    params = {"conv_pre": c(cfg.in_dim, ch, 7), "ups": [], "resblocks": []}
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates,
                                      cfg.upsample_kernel_sizes)):
        cout = ch // (2 ** (i + 1))
        params["ups"].append(c(ch // (2 ** i), cout, k))
        blocks = []
        for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
            blocks.append({
                "convs1": [c(cout, cout, kr) for _ in dil],
                "convs2": [c(cout, cout, kr) for _ in dil],
            })
        params["resblocks"].append(blocks)
    params["conv_post"] = c(cout, 1, 7)
    return params
