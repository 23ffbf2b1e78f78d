"""HuBERT speech encoder: waveform -> frame features / semantic units.

TPU-native counterpart of reference gpt-sovits-mlx/src/models/hubert.rs
(979 LoC): 7-layer strided conv feature extractor (16kHz -> 50Hz frames),
grouped-conv relative positional embedding, pre-norm transformer encoder.
GPT-SoVITS quantizes the layer-9-style features into semantic codes for the
T2S prompt (voice_clone.rs:398).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv1d, init_linear, layer_norm, linear

# (channels, kernel, stride) per conv layer — HuBERT-base frontend
CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
               (512, 3, 2), (512, 2, 2), (512, 2, 2))


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    conv_dim: int = 512
    eps: float = 1e-5


def feature_extractor(params: dict, wav: jax.Array) -> jax.Array:
    """wav: [B, T] -> [B, T/320, conv_dim] (group-norm on layer 0, gelu)."""
    x = wav[:, :, None]
    for i, (_, k, s) in enumerate(CONV_LAYERS):
        x = conv1d(params["convs"][i], x, stride=s, padding=0)
        if i == 0:
            g = x.astype(jnp.float32)
            mean = g.mean(axis=1, keepdims=True)
            var = g.var(axis=1, keepdims=True)
            x = ((g - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            x = x * params["gn_w"] + params["gn_b"]
        x = jax.nn.gelu(x)
    return x


def encode(params: dict, cfg: HubertConfig, wav: jax.Array,
           output_layer: int | None = None) -> jax.Array:
    """wav: [B, T] float32 16kHz -> features [B, frames, hidden]."""
    import math as _m

    from ominix_mlx_tpu.models.vit import vit_block

    x = feature_extractor(params["feat"], wav)
    x = layer_norm(params["post_conv_norm"], x, cfg.eps)
    x = linear(params["feat_proj"], x)
    # grouped-conv relative positional embedding
    K = cfg.conv_pos_kernel
    pos = conv1d(params["pos_conv"], x, padding=K // 2,
                 groups=cfg.conv_pos_groups)
    pos = jax.nn.gelu(pos[:, : x.shape[1]])
    x = x + pos
    x = layer_norm(params["pre_norm"], x, cfg.eps)
    n = output_layer if output_layer is not None else cfg.num_layers

    class _VC:
        num_heads = cfg.num_heads
        eps = cfg.eps
        hidden_act = "gelu"                  # HuBERT FFN uses exact GELU
    for lp in params["layers"][:n]:
        x = vit_block(lp, _VC, x)
    return x


def init_params(cfg: HubertConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 10 * cfg.num_layers + 20))
    D = cfg.hidden_size
    n = lambda d: {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    convs = []
    cin = 1
    for c, k, _ in CONV_LAYERS:
        s = 1.0 / math.sqrt(cin * k)
        convs.append({"w": jax.random.uniform(next(ks), (c, k, cin), dtype,
                                              -s, s)})
        cin = c
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "norm1": n(D), "norm2": n(D),
            "q": init_linear(next(ks), D, D, True, dtype),
            "k": init_linear(next(ks), D, D, True, dtype),
            "v": init_linear(next(ks), D, D, True, dtype),
            "proj": init_linear(next(ks), D, D, True, dtype),
            "fc1": init_linear(next(ks), D, cfg.ffn_dim, True, dtype),
            "fc2": init_linear(next(ks), cfg.ffn_dim, D, True, dtype),
        })
    return {
        "feat": {"convs": convs, "gn_w": jnp.ones((cfg.conv_dim,), dtype),
                 "gn_b": jnp.zeros((cfg.conv_dim,), dtype)},
        "post_conv_norm": n(cfg.conv_dim),
        "feat_proj": init_linear(next(ks), cfg.conv_dim, D, True, dtype),
        "pos_conv": {"w": jax.random.normal(
            next(ks), (D, cfg.conv_pos_kernel, D // cfg.conv_pos_groups),
            dtype) * 0.02, "b": jnp.zeros((D,), dtype)},
        "pre_norm": n(D),
        "layers": layers,
    }


def semantic_codes(features: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-codebook quantization of HuBERT features -> semantic ids
    (the k-means units GPT-SoVITS prompts T2S with)."""
    d2 = (jnp.sum(features ** 2, -1, keepdims=True)
          - 2 * features @ codebook.T
          + jnp.sum(codebook ** 2, -1)[None, None])
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)
