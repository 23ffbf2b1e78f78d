"""Z-Image (turbo): Lumina-style single-stream DiT with noise/context
refiners, 3-axis RoPE, 9-step turbo flow matching.

TPU-native counterpart of reference crate zimage-mlx (zimage_model.rs):
  - 3-axis RoPE over (t, h, w) coordinate grids, theta 256, axes [32,48,48],
    even/odd split rotation (zimage_model.rs:103-244)
  - sandwich-norm blocks: x + tanh(gate) * norm2(attn(norm1(x)*(1+scale)))
    with 4-way adaLN from a 256-d time embedding (:462-585)
  - noise refiner (modulated) on image tokens, context refiner
    (unmodulated) on caption tokens, then joint blocks on the concat (:760+)
  - reuses the FLUX.2 VAE (reference: zimage-mlx/src/lib.rs:75)
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models.dit import vae as vae_mod
from ominix_mlx_tpu.models.dit.common import (denoise,
                                              shifted_linear_schedule,
                                              timestep_embedding)
from ominix_mlx_tpu.nn.layers import (init_linear, layer_norm, linear,
                                      rms_norm)


@dataclasses.dataclass(frozen=True)
class ZImageConfig:
    """Defaults: Z-Image Turbo (zimage_model.rs:60-77)."""
    dim: int = 3840
    n_heads: int = 30
    n_layers: int = 30
    n_refiner_layers: int = 2
    in_channels: int = 16
    cap_feat_dim: int = 2560
    axes_dims: tuple = (32, 48, 48)
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    norm_eps: float = 1e-5
    patch_size: int = 2
    t_embed_dim: int = 256

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def mlp_hidden(self):
        return int(self.dim / 3.0 * 8.0)

    @property
    def patch_channels(self):
        return self.in_channels * self.patch_size ** 2


# --------------------------------------------------------------- rope -------

def coordinate_grid(size, start=(0, 0, 0)) -> np.ndarray:
    """[d0*d1*d2, 3] coordinates (zimage_model.rs:103-124)."""
    d0, d1, d2 = size
    g = np.stack(np.meshgrid(np.arange(d0) + start[0],
                             np.arange(d1) + start[1],
                             np.arange(d2) + start[2], indexing="ij"), -1)
    return g.reshape(-1, 3).astype(np.float32)


def rope_3axis(positions: jax.Array, axes_dims, theta: float):
    """positions [B, S, 3] -> (cos, sin) [B, S, 1, sum(dims)/2]
    (no duplication; even/odd split rotation)."""
    outs = []
    for axis, dim in enumerate(axes_dims):
        half = dim // 2
        inv = jnp.asarray(np.exp(-math.log(theta) * np.arange(half) / half),
                          jnp.float32)
        ang = positions[..., axis].astype(jnp.float32)[..., None, None] \
            * inv[None, None, None, :]                    # [B, S, 1, half]
        outs.append(ang)
    args = jnp.concatenate(outs, -1)
    return jnp.cos(args), jnp.sin(args)


def apply_rope_3axis(x: jax.Array, cos: jax.Array, sin: jax.Array):
    """x: [B, S, H, D]; even/odd split (zimage_model.rs:208-242)."""
    shape = x.shape
    xp = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    o0 = x1 * cos - x2 * sin
    o1 = x1 * sin + x2 * cos
    return jnp.stack([o0, o1], -1).reshape(shape).astype(x.dtype)


# ------------------------------------------------------------- blocks -------

def attention(p: dict, cfg: ZImageConfig, x, cos, sin):
    B, S, _ = x.shape
    H, hd = cfg.n_heads, cfg.head_dim
    q = linear(p["wq"], x).reshape(B, S, H, hd)
    k = linear(p["wk"], x).reshape(B, S, H, hd)
    v = linear(p["wv"], x).reshape(B, S, H, hd)
    q = rms_norm(p["q_norm"], q, cfg.norm_eps)
    k = rms_norm(p["k_norm"], k, cfg.norm_eps)
    q = apply_rope_3axis(q, cos, sin)
    k = apply_rope_3axis(k, cos, sin)
    attn = jax.nn.softmax(
        jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
    return linear(p["wo"], o.reshape(B, S, H * hd))


def ffn(p: dict, x):
    return linear(p["w2"], jax.nn.silu(linear(p["w1"], x)) * linear(p["w3"], x))


def block(p: dict, cfg: ZImageConfig, x, cos, sin, temb=None):
    """Sandwich-norm block with optional 4-way adaLN
    (zimage_model.rs:522-585)."""
    if temb is not None:
        mods = jnp.split(linear(p["ada_ln"], temb), 4, -1)
        s_msa, g_msa, s_mlp, g_mlp = [m[:, None] for m in mods]
        h = rms_norm(p["attention_norm1"], x, cfg.norm_eps) * (1 + s_msa)
        a = attention(p["attention"], cfg, h, cos, sin)
        x = x + jnp.tanh(g_msa) * rms_norm(p["attention_norm2"], a, cfg.norm_eps)
        h = rms_norm(p["ffn_norm1"], x, cfg.norm_eps) * (1 + s_mlp)
        f = ffn(p["feed_forward"], h)
        return x + jnp.tanh(g_mlp) * rms_norm(p["ffn_norm2"], f, cfg.norm_eps)
    h = rms_norm(p["attention_norm1"], x, cfg.norm_eps)
    x = x + rms_norm(p["attention_norm2"],
                     attention(p["attention"], cfg, h, cos, sin), cfg.norm_eps)
    h = rms_norm(p["ffn_norm1"], x, cfg.norm_eps)
    return x + rms_norm(p["ffn_norm2"], ffn(p["feed_forward"], h), cfg.norm_eps)


def forward(params: dict, cfg: ZImageConfig, x: jax.Array, t: jax.Array,
            cap: jax.Array, x_pos: jax.Array, cap_pos: jax.Array):
    """x: [B, S_img, patch_ch]; cap: [B, S_cap, cap_feat_dim]; t: [B].
    Returns velocity [B, S_img, patch_ch] (zimage_model.rs:760-825)."""
    Sx = x.shape[1]
    temb = timestep_embedding(t * cfg.t_scale, cfg.t_embed_dim).astype(x.dtype)
    temb = linear(params["t_mlp2"], jax.nn.silu(linear(params["t_mlp1"], temb)))
    x = linear(params["x_embedder"], x)
    cap = linear(params["cap_linear"],
                 rms_norm(params["cap_norm"], cap, cfg.norm_eps))
    xcos, xsin = rope_3axis(x_pos, cfg.axes_dims, cfg.rope_theta)
    ccos, csin = rope_3axis(cap_pos, cfg.axes_dims, cfg.rope_theta)
    for bp in params["noise_refiner"]:
        x = block(bp, cfg, x, xcos, xsin, temb)
    for bp in params["context_refiner"]:
        cap = block(bp, cfg, cap, ccos, csin)
    u = jnp.concatenate([x, cap], 1)
    ucos = jnp.concatenate([xcos, ccos], 1)
    usin = jnp.concatenate([xsin, csin], 1)
    for bp in params["layers"]:
        u = block(bp, cfg, u, ucos, usin, temb)
    img = u[:, :Sx]
    # FinalLayer: non-affine LayerNorm, SCALE-only adaLN from the 256-d
    # temb (zimage_model.rs:587-624)
    sc = linear(params["final_ada"], jax.nn.silu(temb))
    img = layer_norm({"w": None, "b": None}, img, 1e-6) * (1 + sc[:, None])
    return linear(params["final_linear"], img)


# ---------------------------------------------------------------- init ------

def init_params(cfg: ZImageConfig, key, dtype=jnp.bfloat16) -> dict:
    ks = iter(jax.random.split(key, 30 * (cfg.n_layers
                                          + 2 * cfg.n_refiner_layers) + 20))
    d, hd = cfg.dim, cfg.head_dim

    def blk(mod: bool):
        p = {
            "attention": {
                "wq": init_linear(next(ks), d, d, False, dtype),
                "wk": init_linear(next(ks), d, d, False, dtype),
                "wv": init_linear(next(ks), d, d, False, dtype),
                "wo": init_linear(next(ks), d, d, False, dtype),
                "q_norm": jnp.ones((hd,), dtype),
                "k_norm": jnp.ones((hd,), dtype),
            },
            "feed_forward": {
                "w1": init_linear(next(ks), d, cfg.mlp_hidden, False, dtype),
                "w2": init_linear(next(ks), cfg.mlp_hidden, d, False, dtype),
                "w3": init_linear(next(ks), d, cfg.mlp_hidden, False, dtype),
            },
            "attention_norm1": jnp.ones((d,), dtype),
            "attention_norm2": jnp.ones((d,), dtype),
            "ffn_norm1": jnp.ones((d,), dtype),
            "ffn_norm2": jnp.ones((d,), dtype),
        }
        if mod:
            p["ada_ln"] = init_linear(next(ks), cfg.t_embed_dim, 4 * d, True, dtype)
        return p

    return {
        "t_mlp1": init_linear(next(ks), cfg.t_embed_dim, 1024, True, dtype),
        "t_mlp2": init_linear(next(ks), 1024, cfg.t_embed_dim, True, dtype),
        "x_embedder": init_linear(next(ks), cfg.patch_channels, d, True, dtype),
        "cap_norm": jnp.ones((cfg.cap_feat_dim,), dtype),
        "cap_linear": init_linear(next(ks), cfg.cap_feat_dim, d, True, dtype),
        "noise_refiner": [blk(True) for _ in range(cfg.n_refiner_layers)],
        "context_refiner": [blk(False) for _ in range(cfg.n_refiner_layers)],
        "layers": [blk(True) for _ in range(cfg.n_layers)],
        "final_ada": init_linear(next(ks), cfg.t_embed_dim, d, True, dtype),
        "final_linear": init_linear(next(ks), d, cfg.patch_channels, True, dtype),
    }


# ------------------------------------------------------------- pipeline -----

_RUN_CACHE: dict = {}


def generate_image(params: dict, cfg: ZImageConfig, vae_params: dict,
                   vae_cfg, cap_feats: jax.Array, height: int = 1024,
                   width: int = 1024, num_steps: int = 9, shift: float = 3.0,
                   key=None) -> jax.Array:
    """9-step turbo flow matching + FLUX VAE decode (reference:
    examples/generate_zimage.rs:7-8,64+). Returns [B, H, W, 3] in [0,1]."""
    from ominix_mlx_tpu.models.flux_klein import pack_latent, unpack_latent

    if key is None:
        key = jax.random.PRNGKey(0)
    B = cap_feats.shape[0]
    vf = 2 ** (len(vae_cfg.ch_mult) - 1)
    lh, lw = height // vf, width // vf
    ph, pw = lh // cfg.patch_size, lw // cfg.patch_size
    x_pos = jnp.asarray(np.broadcast_to(
        coordinate_grid((1, ph, pw)), (B, ph * pw, 3)))
    S_cap = cap_feats.shape[1]
    cap_pos = jnp.asarray(np.broadcast_to(
        coordinate_grid((S_cap, 1, 1), start=(1, 0, 0)), (B, S_cap, 3)))
    z = jax.random.normal(key, (B, ph * pw, cfg.patch_channels), jnp.float32)
    ts = shifted_linear_schedule(num_steps, shift)

    # params as jit operands + memoized jit (see flux_klein.py)
    ck = (repr(cfg), repr(vae_cfg), B, ph, pw, num_steps,
          cap_feats.shape[1], str(cap_feats.dtype))
    run = _RUN_CACHE.get(ck)
    if run is None:
        @jax.jit
        def run(params, vae_params, z, cap_feats):
            def v_fn(zz, t):
                return forward(params, cfg, zz.astype(cap_feats.dtype),
                               jnp.full((B,), t), cap_feats, x_pos, cap_pos)
            z = denoise(v_fn, z, ts)
            lat = unpack_latent(z, ph, pw, cfg.in_channels, cfg.patch_size)
            img = vae_mod.decode(vae_params, vae_cfg,
                                 lat.astype(jnp.float32))
            return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
        _RUN_CACHE[ck] = run

    return run(params, vae_params, z, cap_feats)


# --------------------------------------------------------------- loading ----

def config_from_hf(d: dict) -> ZImageConfig:
    return ZImageConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in d.items()
                           if k in ZImageConfig.__dataclass_fields__})


def params_from_flat(flat: dict, cfg: ZImageConfig) -> dict:
    """Diffusers Z-Image names -> param tree (reference
    sanitize_zimage_weights, zimage_model.rs:884-931: t_embedder.mlp.{0,2},
    cap_embedder.{0,1}, layers/noise_refiner/context_refiner.{i}.
    {attention.{to_q,to_k,to_v,to_out.0,norm_q,norm_k}, feed_forward.
    {w1,w2,w3}, attention_norm1/2, ffn_norm1/2, adaLN_modulation.0},
    final_layer.{linear, adaLN_modulation.1})."""
    def lin(prefix):
        p = {"w": flat[f"{prefix}.weight"]}
        if f"{prefix}.bias" in flat:
            p["b"] = flat[f"{prefix}.bias"]
        return p

    def blk(prefix, mod: bool):
        p = {
            "attention": {
                "wq": lin(f"{prefix}.attention.to_q"),
                "wk": lin(f"{prefix}.attention.to_k"),
                "wv": lin(f"{prefix}.attention.to_v"),
                "wo": lin(f"{prefix}.attention.to_out.0"),
                "q_norm": flat[f"{prefix}.attention.norm_q.weight"],
                "k_norm": flat[f"{prefix}.attention.norm_k.weight"],
            },
            "feed_forward": {
                "w1": lin(f"{prefix}.feed_forward.w1"),
                "w2": lin(f"{prefix}.feed_forward.w2"),
                "w3": lin(f"{prefix}.feed_forward.w3"),
            },
            "attention_norm1": flat[f"{prefix}.attention_norm1.weight"],
            "attention_norm2": flat[f"{prefix}.attention_norm2.weight"],
            "ffn_norm1": flat[f"{prefix}.ffn_norm1.weight"],
            "ffn_norm2": flat[f"{prefix}.ffn_norm2.weight"],
        }
        if mod:
            p["ada_ln"] = lin(f"{prefix}.adaLN_modulation.0")
        return p

    return {
        "t_mlp1": lin("t_embedder.mlp.0"),
        "t_mlp2": lin("t_embedder.mlp.2"),
        "x_embedder": lin("x_embedder"),
        "cap_norm": flat["cap_embedder.0.weight"],
        "cap_linear": lin("cap_embedder.1"),
        "noise_refiner": [blk(f"noise_refiner.{i}", True)
                          for i in range(cfg.n_refiner_layers)],
        "context_refiner": [blk(f"context_refiner.{i}", False)
                            for i in range(cfg.n_refiner_layers)],
        "layers": [blk(f"layers.{i}", True) for i in range(cfg.n_layers)],
        "final_ada": lin("final_layer.adaLN_modulation.1"),
        "final_linear": lin("final_layer.linear"),
    }


def flat_from_params(params: dict, cfg: ZImageConfig) -> dict:
    """Inverse of ``params_from_flat`` (canonical save / tests)."""
    flat = {}

    def put(prefix, p):
        flat[f"{prefix}.weight"] = p["w"]
        if p.get("b") is not None:
            flat[f"{prefix}.bias"] = p["b"]

    def put_blk(prefix, bp):
        a, f = bp["attention"], bp["feed_forward"]
        put(f"{prefix}.attention.to_q", a["wq"])
        put(f"{prefix}.attention.to_k", a["wk"])
        put(f"{prefix}.attention.to_v", a["wv"])
        put(f"{prefix}.attention.to_out.0", a["wo"])
        flat[f"{prefix}.attention.norm_q.weight"] = a["q_norm"]
        flat[f"{prefix}.attention.norm_k.weight"] = a["k_norm"]
        for w in ("w1", "w2", "w3"):
            put(f"{prefix}.feed_forward.{w}", f[w])
        for nm in ("attention_norm1", "attention_norm2", "ffn_norm1",
                   "ffn_norm2"):
            flat[f"{prefix}.{nm}.weight"] = bp[nm]
        if "ada_ln" in bp:
            put(f"{prefix}.adaLN_modulation.0", bp["ada_ln"])

    put("t_embedder.mlp.0", params["t_mlp1"])
    put("t_embedder.mlp.2", params["t_mlp2"])
    put("x_embedder", params["x_embedder"])
    flat["cap_embedder.0.weight"] = params["cap_norm"]
    put("cap_embedder.1", params["cap_linear"])
    for i, bp in enumerate(params["noise_refiner"]):
        put_blk(f"noise_refiner.{i}", bp)
    for i, bp in enumerate(params["context_refiner"]):
        put_blk(f"context_refiner.{i}", bp)
    for i, bp in enumerate(params["layers"]):
        put_blk(f"layers.{i}", bp)
    put("final_layer.adaLN_modulation.1", params["final_ada"])
    put("final_layer.linear", params["final_linear"])
    return flat


# ------------------------------------------------------------- serving ------

# reference: examples/generate_zimage.rs:281 — Qwen3 chat template with an
# empty think block; features from all-but-last layer, no final norm
# (qwen3_quantized.rs:320-338)
PROMPT_TEMPLATE = ("<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
                   "<think>\n\n</think>\n\n")


def encode_prompt(text_params: dict, text_cfg, tokenizer, prompt: str):
    from ominix_mlx_tpu.models import base
    ids = tokenizer.encode(PROMPT_TEMPLATE.format(prompt))
    return base.encode_hidden(text_params, text_cfg,
                              jnp.asarray([ids], jnp.int32),
                              num_layers=text_cfg.num_layers - 1,
                              final_norm=False)


@dataclasses.dataclass
class ImageGenerator:
    """generate(prompt) -> [H, W, 3] in [0,1] (server image contract)."""
    params: dict
    cfg: ZImageConfig
    vae_params: dict
    vae_cfg: object
    text_params: dict = None
    text_cfg: object = None
    tokenizer: object = None

    def generate(self, prompt: str, height: int = 1024, width: int = 1024,
                 num_steps: int = 9, seed: int = 0) -> jax.Array:
        assert self.text_params is not None, "text encoder not loaded"
        cap = encode_prompt(self.text_params, self.text_cfg, self.tokenizer,
                            prompt).astype(jnp.bfloat16)
        img = generate_image(self.params, self.cfg, self.vae_params,
                             self.vae_cfg, cap, height, width, num_steps,
                             key=jax.random.PRNGKey(seed))
        return img[0]


def load_model(model_dir: str) -> ImageGenerator:
    """Canonical single-dir save: flat names prefixed transformer./vae./
    text_encoder. + config.json {model_type: zimage, transformer_config,
    vae_config, text_config}. The VAE is the FLUX one, exactly as the
    reference reuses flux-klein's Decoder (zimage-mlx/src/lib.rs:75,
    examples/generate_zimage.rs:16)."""
    import os

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              unflatten_params)

    raw = load_config(model_dir)
    cfg = config_from_hf(raw.get("transformer_config", {}))
    vcfg = vae_mod.VAEConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in raw.get("vae_config", {}).items()
        if k in vae_mod.VAEConfig.__dataclass_fields__})
    flat = load_safetensors(model_dir)
    t_flat = {k[len("transformer."):]: v for k, v in flat.items()
              if k.startswith("transformer.")}
    e_flat = {k[len("text_encoder."):]: v for k, v in flat.items()
              if k.startswith("text_encoder.")}
    v_flat = {k[len("vae."):]: v for k, v in flat.items()
              if k.startswith("vae.")}
    text_cfg = (base.TransformerConfig.from_hf(raw["text_config"])
                if "text_config" in raw else None)
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return ImageGenerator(
        params=params_from_flat(t_flat, cfg), cfg=cfg,
        vae_params=unflatten_params(v_flat), vae_cfg=vcfg,
        text_params=(base.params_from_flat(e_flat, text_cfg)
                     if e_flat and text_cfg else None),
        text_cfg=text_cfg, tokenizer=tok)
