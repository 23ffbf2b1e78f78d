"""SAM ViT-B image encoder (DeepSeek-OCR-2's vision tower).

TPU-native counterpart of reference deepseek-ocr2-mlx/src/vision.rs
(1-611): ViT-B/16 with windowed attention (window 14, global attention at
blocks 2/5/8/11), decomposed relative position bias, absolute position
embedding, and the SAM neck (1x1 + 3x3 convs with 2D layer norms) plus
the OCR adapter downsampling convs.

TPU notes: window partition/unpartition are static reshapes (no gathers);
the decomposed rel-pos bias is two einsums; every conv is channels-last.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import conv2d, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class SamViTConfig:
    """Defaults: SAM ViT-B/16 (vision.rs:1-10)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    out_chans: int = 256
    use_rel_pos: bool = True
    # OCR adapter output dim (vision.rs net_3: 512 -> 896); None keeps the
    # legacy out_chans*4 used by small tests
    adapter_chans: int = None

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select relative position embeddings for (q, k) index deltas
    (vision.rs:182-218). rel_pos: [2*max-1, head_dim_slice]."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        # linear-resize along the first axis
        t = jnp.linspace(0.0, rel_pos.shape[0] - 1.0, max_rel)
        lo = jnp.floor(t).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, rel_pos.shape[0] - 1)
        frac = (t - lo)[:, None]
        rel_pos = rel_pos[lo] * (1 - frac) + rel_pos[hi] * frac
    qi = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    ki = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qi - ki) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]          # [q, k, C]


def _attention(p: dict, x: jax.Array, num_heads: int,
               use_rel_pos: bool) -> jax.Array:
    """Spatial attention over [B, H, W, C] with decomposed rel-pos bias
    (vision.rs:94-180)."""
    B, H, W, C = x.shape
    hd = C // num_heads
    qkv = linear(p["qkv"], x).reshape(B, H * W, 3, num_heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k)
    if use_rel_pos:
        rh = _get_rel_pos(H, H, p["rel_pos_h"])    # [H, H, hd]
        rw = _get_rel_pos(W, W, p["rel_pos_w"])
        qr = q.reshape(B, num_heads, H, W, hd)
        bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)   # [B,n,H,W,H]
        bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)   # [B,n,H,W,W]
        attn = (attn.reshape(B, num_heads, H, W, H, W)
                + bias_h[..., :, None] + bias_w[..., None, :]
                ).reshape(B, num_heads, H * W, H * W)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return linear(p["proj"], out)


def _window_partition(x: jax.Array, ws: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], padded (Hp, Wp))
    (vision.rs:271-300) — static reshapes only."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(wins: jax.Array, ws: int, pad_hw: Tuple[int, int],
                        hw: Tuple[int, int]) -> jax.Array:
    Hp, Wp = pad_hw
    H, W = hw
    C = wins.shape[-1]
    B = wins.shape[0] // (Hp * Wp // ws // ws)
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


def _block(p: dict, cfg: SamViTConfig, x: jax.Array,
           window: bool) -> jax.Array:
    h = layer_norm(p["norm1"], x)
    if window:
        hw = h.shape[1:3]
        h, pad_hw = _window_partition(h, cfg.window_size)
    h = _attention(p["attn"], h, cfg.num_heads, cfg.use_rel_pos)
    if window:
        h = _window_unpartition(h, cfg.window_size, pad_hw, hw)
    x = x + h
    h = layer_norm(p["norm2"], x)
    h = linear(p["mlp_fc2"], jax.nn.gelu(linear(p["mlp_fc1"], h)))
    return x + h


def _ln2d(p: dict, x: jax.Array) -> jax.Array:
    """Channel-wise 2D layer norm over the last axis (SAM LayerNorm2d)."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["w"] + p["b"]


def encode(params: dict, cfg: SamViTConfig, images: jax.Array) -> jax.Array:
    """images [B, H, W, 3] (normalized) -> features [B, h, w, out_chans]
    after the SAM neck (vision.rs:329-420)."""
    x = conv2d(params["patch_embed"], images,
               stride=(cfg.patch_size, cfg.patch_size))
    if "pos_embed" in params:
        pe = params["pos_embed"]
        if pe.shape[1:3] != x.shape[1:3]:
            pe = jax.image.resize(pe, (1, x.shape[1], x.shape[2],
                                       pe.shape[-1]), "bilinear")
        x = x + pe
    for i, bp in enumerate(params["blocks"]):
        x = _block(bp, cfg, x, window=i not in cfg.global_attn_indexes)
    x = conv2d(params["neck0"], x)
    x = _ln2d(params["neck_ln0"], x)
    x = conv2d(params["neck1"], x, padding=1)
    x = _ln2d(params["neck_ln1"], x)
    # OCR adapter: two stride-2 downsampling convs (vision.rs net_2/net_3)
    if "net2" in params:
        x = conv2d(params["net2"], x, stride=(2, 2), padding=1)
        x = jax.nn.gelu(x)
        x = conv2d(params["net3"], x, stride=(2, 2), padding=1)
    return x


def init_params(cfg: SamViTConfig, key, dtype=jnp.float32) -> dict:
    from ominix_mlx_tpu.nn.layers import init_linear

    ks = iter(jax.random.split(key, 8 * cfg.depth + 16))
    D = cfg.embed_dim
    hd = D // cfg.num_heads
    g = cfg.grid
    mlp = int(D * cfg.mlp_ratio)

    def c2(cin, cout, k):
        s = (cin * k * k) ** -0.5
        return {"w": jax.random.uniform(next(ks), (cout, k, k, cin), dtype,
                                        -s, s),
                "b": jnp.zeros((cout,), dtype)}

    def nrm(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    blocks = []
    for i in range(cfg.depth):
        ws = (g if i in cfg.global_attn_indexes else cfg.window_size)
        blocks.append({
            "norm1": nrm(D), "norm2": nrm(D),
            "attn": {
                "qkv": init_linear(next(ks), D, 3 * D, True, dtype),
                "proj": init_linear(next(ks), D, D, True, dtype),
                "rel_pos_h": jnp.zeros((2 * ws - 1, hd), dtype),
                "rel_pos_w": jnp.zeros((2 * ws - 1, hd), dtype),
            },
            "mlp_fc1": init_linear(next(ks), D, mlp, True, dtype),
            "mlp_fc2": init_linear(next(ks), mlp, D, True, dtype),
        })
    return {
        "patch_embed": c2(3, D, cfg.patch_size),
        "pos_embed": jnp.zeros((1, g, g, D), dtype),
        "blocks": blocks,
        "neck0": {"w": jax.random.normal(next(ks),
                                         (cfg.out_chans, 1, 1, D), dtype)
                  * 0.02},
        "neck_ln0": nrm(cfg.out_chans),
        "neck1": {"w": jax.random.normal(
            next(ks), (cfg.out_chans, 3, 3, cfg.out_chans), dtype) * 0.02},
        "neck_ln1": nrm(cfg.out_chans),
        "net2": c2(cfg.out_chans, cfg.out_chans * 2, 3),
        "net3": c2(cfg.out_chans * 2,
                   cfg.adapter_chans or cfg.out_chans * 4, 3),
    }


def params_from_flat(flat: dict, cfg: SamViTConfig,
                     prefix: str = "vision_model") -> dict:
    """Torch checkpoint map (SAM naming: patch_embed.proj, blocks.N.attn.
    qkv/proj + rel_pos_h/w, neck.0/1/2/3, net_2/net_3)."""
    def t4(w):   # torch conv2d [out, in, kh, kw] -> [out, kh, kw, in]
        return jnp.transpose(jnp.asarray(w), (0, 2, 3, 1))

    def lin(name):
        p = {"w": jnp.asarray(flat[f"{name}.weight"])}
        if f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def nrm(name):
        return {"w": jnp.asarray(flat[f"{name}.weight"]),
                "b": jnp.asarray(flat[f"{name}.bias"])}

    pe = jnp.asarray(flat[f"{prefix}.pos_embed"])
    return {
        "patch_embed": {"w": t4(flat[f"{prefix}.patch_embed.proj.weight"]),
                        "b": jnp.asarray(
                            flat[f"{prefix}.patch_embed.proj.bias"])},
        "pos_embed": pe,
        "blocks": [{
            "norm1": nrm(f"{prefix}.blocks.{i}.norm1"),
            "norm2": nrm(f"{prefix}.blocks.{i}.norm2"),
            "attn": {
                "qkv": lin(f"{prefix}.blocks.{i}.attn.qkv"),
                "proj": lin(f"{prefix}.blocks.{i}.attn.proj"),
                "rel_pos_h": jnp.asarray(
                    flat[f"{prefix}.blocks.{i}.attn.rel_pos_h"]),
                "rel_pos_w": jnp.asarray(
                    flat[f"{prefix}.blocks.{i}.attn.rel_pos_w"]),
            },
            "mlp_fc1": lin(f"{prefix}.blocks.{i}.mlp.lin1"),
            "mlp_fc2": lin(f"{prefix}.blocks.{i}.mlp.lin2"),
        } for i in range(cfg.depth)],
        "neck0": {"w": t4(flat[f"{prefix}.neck.0.weight"])},
        "neck_ln0": nrm(f"{prefix}.neck.1"),
        "neck1": {"w": t4(flat[f"{prefix}.neck.2.weight"])},
        "neck_ln1": nrm(f"{prefix}.neck.3"),
        **({"net2": {"w": t4(flat[f"{prefix}.net_2.weight"]),
                     "b": jnp.asarray(flat[f"{prefix}.net_2.bias"])},
            "net3": {"w": t4(flat[f"{prefix}.net_3.weight"]),
                     "b": jnp.asarray(flat[f"{prefix}.net_3.bias"])}}
           if f"{prefix}.net_2.weight" in flat else {}),
    }
