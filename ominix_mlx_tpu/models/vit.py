"""Generic ViT encoder covering the VLM vision towers.

TPU-native counterpart of reference moxin-vlm-mlx/src/vision.rs (557 LoC):
one parametric ViT with config switches for
  - DINOv2 ViT-L/14: CLS + 4 register tokens, LayerScale (vision.rs:40-50)
  - SigLIP ViT-SO400M/14: no CLS, no registers (vision.rs:57-66)
Patch embedding is a stride-P conv (NHWC), pre-norm blocks, GELU MLP.
Returns patch tokens (CLS/registers stripped) for the projector.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv2d, init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    has_cls_token: bool = True
    num_registers: int = 0
    layer_scale: bool = False
    eps: float = 1e-6
    hidden_act: str = "gelu"        # dinov2: exact gelu; siglip: tanh-gelu

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


DINOV2_LARGE = ViTConfig(has_cls_token=True, num_registers=4,
                         layer_scale=True)
SIGLIP_SO400M = ViTConfig(hidden_size=1152, num_layers=27, num_heads=16,
                          mlp_dim=4304, has_cls_token=False, num_registers=0,
                          hidden_act="gelu_pytorch_tanh")


def vit_block(p: dict, cfg: ViTConfig, x: jax.Array) -> jax.Array:
    B, T, D = x.shape
    H = cfg.num_heads
    hd = D // H
    h = layer_norm(p["norm1"], x, cfg.eps)
    q = linear(p["q"], h).reshape(B, T, H, hd)
    k = linear(p["k"], h).reshape(B, T, H, hd)
    v = linear(p["v"], h).reshape(B, T, H, hd)
    attn = jax.nn.softmax(
        jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v).reshape(B, T, D)
    o = linear(p["proj"], o)
    if "ls1" in p:
        o = o * p["ls1"]
    x = x + o
    h = layer_norm(p["norm2"], x, cfg.eps)
    from ominix_mlx_tpu.nn.layers import ACTIVATIONS
    act = (ACTIVATIONS[cfg.hidden_act] if cfg.hidden_act != "gelu"
           else (lambda v: jax.nn.gelu(v, approximate=False)))
    h = linear(p["fc2"], act(linear(p["fc1"], h)))
    if "ls2" in p:
        h = h * p["ls2"]
    return x + h


def encode(params: dict, cfg: ViTConfig, images: jax.Array) -> jax.Array:
    """images: [B, H, W, 3] (normalized) -> patch tokens [B, N, D]."""
    x = conv2d(params["patch_embed"], images, stride=cfg.patch_size)
    B, gh, gw, D = x.shape
    x = x.reshape(B, gh * gw, D)
    pos = params["pos_embed"]
    if pos.shape[1] == x.shape[1]:
        x = x + pos                           # pos before CLS (SigLIP)
        prefix = []
        if cfg.has_cls_token:
            prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, D)))
    else:
        prefix = []
        if cfg.has_cls_token:
            prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, D)))
            x = jnp.concatenate(prefix + [x], 1) + pos
            prefix = []
    if prefix:
        x = jnp.concatenate(prefix + [x], 1)
    if cfg.num_registers:
        regs = jnp.broadcast_to(params["register_tokens"],
                                (B, cfg.num_registers, D))
        x = jnp.concatenate([x[:, :1], regs, x[:, 1:]] if cfg.has_cls_token
                            else [regs, x], 1)
    for p in params["blocks"]:
        x = vit_block(p, cfg, x)
    x = layer_norm(params["norm"], x, cfg.eps)
    skip = (1 if cfg.has_cls_token else 0) + cfg.num_registers
    return x[:, skip:]


def init_params(cfg: ViTConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_layers + 8))
    D = cfg.hidden_size
    n = lambda: {"w": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}

    def blk():
        p = {
            "norm1": n(), "norm2": n(),
            "q": init_linear(next(ks), D, D, True, dtype),
            "k": init_linear(next(ks), D, D, True, dtype),
            "v": init_linear(next(ks), D, D, True, dtype),
            "proj": init_linear(next(ks), D, D, True, dtype),
            "fc1": init_linear(next(ks), D, cfg.mlp_dim, True, dtype),
            "fc2": init_linear(next(ks), cfg.mlp_dim, D, True, dtype),
        }
        if cfg.layer_scale:
            p["ls1"] = jnp.full((D,), 1e-5, dtype)
            p["ls2"] = jnp.full((D,), 1e-5, dtype)
        return p

    P = cfg.patch_size
    npos = cfg.num_patches + (1 if cfg.has_cls_token else 0)
    params = {
        "patch_embed": {
            "w": jax.random.normal(next(ks), (D, P, P, 3), dtype) * 0.02,
            "b": jnp.zeros((D,), dtype)},
        "pos_embed": jax.random.normal(next(ks), (1, npos, D), dtype) * 0.02,
        "blocks": [blk() for _ in range(cfg.num_layers)],
        "norm": n(),
    }
    if cfg.has_cls_token:
        params["cls_token"] = jnp.zeros((1, 1, D), dtype)
    if cfg.num_registers:
        params["register_tokens"] = jnp.zeros((1, cfg.num_registers, D), dtype)
    return params


# ------------------------------------------------------ HF weight maps ------

def _lin(sd, name):
    import numpy as np
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return p


def _nrm(sd, name):
    import numpy as np
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def params_from_hf_dinov2(sd: dict, cfg: ViTConfig) -> dict:
    """HF Dinov2Model / Dinov2WithRegistersModel state_dict -> our tree
    (reference tower: moxin-vlm-mlx/src/vision.rs:40-50)."""
    import numpy as np
    out = {
        "patch_embed": {
            "w": jnp.transpose(jnp.asarray(np.asarray(
                sd["embeddings.patch_embeddings.projection.weight"])),
                (0, 2, 3, 1)),
            "b": jnp.asarray(np.asarray(
                sd["embeddings.patch_embeddings.projection.bias"]))},
        "cls_token": jnp.asarray(np.asarray(sd["embeddings.cls_token"]))[0],
        "pos_embed": jnp.asarray(np.asarray(
            sd["embeddings.position_embeddings"])),
        "norm": _nrm(sd, "layernorm"),
        "blocks": [],
    }
    if "embeddings.register_tokens" in sd:
        out["register_tokens"] = jnp.asarray(np.asarray(
            sd["embeddings.register_tokens"]))[0]
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}"
        blk = {
            "norm1": _nrm(sd, f"{b}.norm1"),
            "norm2": _nrm(sd, f"{b}.norm2"),
            "q": _lin(sd, f"{b}.attention.attention.query"),
            "k": _lin(sd, f"{b}.attention.attention.key"),
            "v": _lin(sd, f"{b}.attention.attention.value"),
            "proj": _lin(sd, f"{b}.attention.output.dense"),
            "fc1": _lin(sd, f"{b}.mlp.fc1"),
            "fc2": _lin(sd, f"{b}.mlp.fc2"),
        }
        if f"{b}.layer_scale1.lambda1" in sd:
            blk["ls1"] = jnp.asarray(np.asarray(sd[f"{b}.layer_scale1.lambda1"]))
            blk["ls2"] = jnp.asarray(np.asarray(sd[f"{b}.layer_scale2.lambda1"]))
        out["blocks"].append(blk)
    return out


def params_from_hf_siglip(sd: dict, cfg: ViTConfig) -> dict:
    """HF SiglipVisionModel state_dict -> our tree (vision.rs:57-66).
    Names may carry a vision_model. prefix."""
    import numpy as np
    if any(k.startswith("vision_model.") for k in sd):
        sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}
    out = {
        "patch_embed": {
            "w": jnp.transpose(jnp.asarray(np.asarray(
                sd["embeddings.patch_embedding.weight"])), (0, 2, 3, 1)),
            "b": jnp.asarray(np.asarray(
                sd["embeddings.patch_embedding.bias"]))},
        "pos_embed": jnp.asarray(np.asarray(
            sd["embeddings.position_embedding.weight"]))[None],
        "norm": _nrm(sd, "post_layernorm"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = f"encoder.layers.{i}"
        out["blocks"].append({
            "norm1": _nrm(sd, f"{b}.layer_norm1"),
            "norm2": _nrm(sd, f"{b}.layer_norm2"),
            "q": _lin(sd, f"{b}.self_attn.q_proj"),
            "k": _lin(sd, f"{b}.self_attn.k_proj"),
            "v": _lin(sd, f"{b}.self_attn.v_proj"),
            "proj": _lin(sd, f"{b}.self_attn.out_proj"),
            "fc1": _lin(sd, f"{b}.mlp.fc1"),
            "fc2": _lin(sd, f"{b}.mlp.fc2"),
        })
    return out
