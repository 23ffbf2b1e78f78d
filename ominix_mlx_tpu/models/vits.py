"""VITS / SoVITS waveform decoder for GPT-SoVITS v2 voice cloning.

TPU-native counterpart of reference gpt-sovits-mlx/src/models/vits.rs
(2891 LoC), sovits.rs (902), nn/weight_norm.rs (529). The inference path
(`sovits_decode`) maps semantic codes + phonemes + a reference spectrogram
to a waveform:

    ge   = mel_style_encoder(refer_spec)            # speaker style vector
    ssl  = rvq_decode(codes) upsampled 2x           # 25Hz -> 50Hz features
    m, s = text_encoder(ssl, phonemes, ge)          # MRTE-fused prior
    z    = flow^-1(m + noise*exp(s), ge)            # coupling flow reverse
    wav  = generator(z, ge)                         # HiFiGAN-style decoder

TPU design notes:
  - everything is channels-last [B, T, C] so convs hit the MXU directly
  - weight norm is FOLDED at load time (w = g * v / ||v||) — inference
    never pays the normalization (the reference re-computes it per forward
    unless frozen, weight_norm.rs); the GAN trainer re-applies it
  - the relative-window attention of the VITS text encoder is a static
    [T, T] bias built from the learned window embeddings — no gathers
  - the flow's WaveNet stacks are small; XLA fuses the gated-tanh chains
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.nn.layers import conv1d, conv_transpose1d, embedding


@dataclasses.dataclass(frozen=True)
class VITSConfig:
    """GPT-SoVITS v2 hyperparameters (s2 config 32k)."""
    spec_channels: int = 1025          # |rfft(n_fft=2048)|
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    n_symbols: int = 732               # v2 symbol table
    ssl_dim: int = 768
    codebook_size: int = 1024
    gin_channels: int = 512
    upsample_initial_channel: int = 512
    upsample_rates: tuple = (10, 8, 2, 2, 2)        # prod = 640 = hop
    upsample_kernel_sizes: tuple = (16, 16, 8, 2, 2)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    flow_layers: int = 4
    wn_layers: int = 4
    wn_kernel: int = 5
    sampling_rate: int = 32000


# ------------------------------------------------------------ primitives ----

def _layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _attn_rel_window(p: dict, x: jax.Array, mask: Optional[jax.Array],
                     n_heads: int, window: int = 4) -> jax.Array:
    """VITS-style self-attention with learned relative-window embeddings
    (vits attentions: emb_rel_k/emb_rel_v over a +-window band)."""
    B, T, C = x.shape
    hd = C // n_heads
    q = conv1d({"w": p["q_w"], "b": p.get("q_b")}, x)
    k = conv1d({"w": p["k_w"], "b": p.get("k_b")}, x)
    v = conv1d({"w": p["v_w"], "b": p.get("v_b")}, x)
    q = q.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3) * hd ** -0.5
    k = k.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if "emb_rel_k" in p:
        # [1, 2w+1, hd] learned band -> [T, T] banded bias per head
        rel = p["emb_rel_k"][0]                       # [2w+1, hd]
        qrel = jnp.einsum("bhqd,rd->bhqr", q, rel)    # [B,H,T,2w+1]
        idx = (jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + window)
        band = (idx >= 0) & (idx <= 2 * window)
        idx = jnp.clip(idx, 0, 2 * window)            # [T, T] -> rel slot
        # scores[q, k] += qrel[q, idx[k->]]; gather along the rel axis
        gathered = jnp.take_along_axis(
            qrel, jnp.broadcast_to(idx.T[None, None], qrel.shape[:2] + idx.shape
                                   ).transpose(0, 1, 3, 2), axis=-1)
        scores = scores + jnp.where(band[None, None].transpose(0, 1, 3, 2),
                                    gathered, 0.0)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    if "emb_rel_v" in p:
        rel_v = p["emb_rel_v"][0]                     # [2w+1, hd]
        idx = (jnp.arange(T)[None, :] - jnp.arange(T)[:, None] + window)
        band = (idx >= 0) & (idx <= 2 * window)
        w_band = jnp.where(band[None, None], probs, 0.0)
        idx_c = jnp.clip(idx, 0, 2 * window)
        # accumulate probs into rel slots: [B,H,T,2w+1]
        onehot = jax.nn.one_hot(idx_c, 2 * window + 1, dtype=probs.dtype)
        pr = jnp.einsum("bhqk,qkr->bhqr", w_band, onehot)
        out = out + jnp.einsum("bhqr,rd->bhqd", pr, rel_v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return conv1d({"w": p["o_w"], "b": p.get("o_b")}, out)


def _encoder(p: dict, cfg: VITSConfig, x: jax.Array,
             x_mask: Optional[jax.Array], n_layers: int) -> jax.Array:
    """VITS attentions.Encoder: [attn -> LN(add) -> convFFN -> LN(add)]*L."""
    attn_mask = None
    if x_mask is not None:
        attn_mask = (x_mask[:, None, :, None] * x_mask[:, None, None, :]) > 0
        x = x * x_mask[..., None]
    for i in range(n_layers):
        lp = p["layers"][i]
        h = _attn_rel_window(lp["attn"], x, attn_mask, cfg.n_heads)
        x = _layer_norm(lp["norm1"], x + h)
        h = conv1d(lp["ffn1"], x, padding=cfg.kernel_size // 2)
        h = jax.nn.relu(h)
        h = conv1d(lp["ffn2"], h, padding=cfg.kernel_size // 2)
        x = _layer_norm(lp["norm2"], x + h)
        if x_mask is not None:
            x = x * x_mask[..., None]
    return x


# ------------------------------------------------------ MelStyleEncoder -----

def mel_style_encoder(p: dict, cfg: VITSConfig, spec: jax.Array) -> jax.Array:
    """Reference speaker-style vector from a linear spectrogram.

    spec: [B, T, spec_channels] -> ge [B, gin_channels]. Structure follows
    the v2 ref_enc (MelStyleEncoder): spectral MLP (mish) -> two gated
    temporal convs -> self-attention -> temporal mean -> fc."""
    x = _mish(linear_nb(p["spectral1"], spec))
    x = _mish(linear_nb(p["spectral2"], x))
    for tp in (p["temporal1"], p["temporal2"]):      # Conv1dGLU, residual
        h = conv1d(tp, x, padding=2)                 # kernel 5
        a, b = jnp.split(h, 2, axis=-1)
        x = x + a * jax.nn.sigmoid(b)
    # plain multi-head self-attention, then mean-pool over time
    ap = p["attn"]
    B, T, C = x.shape
    H = cfg.n_heads
    q = linear_nb(ap["q"], x).reshape(B, T, H, -1).transpose(0, 2, 1, 3)
    k = linear_nb(ap["k"], x).reshape(B, T, H, -1).transpose(0, 2, 1, 3)
    v = linear_nb(ap["v"], x).reshape(B, T, H, -1).transpose(0, 2, 1, 3)
    probs = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5), -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
    x = x + linear_nb(ap["o"], o)
    x = x.mean(axis=1)                               # [B, C]
    return linear_nb(p["fc"], x)                     # [B, gin]


def linear_nb(p: dict, x: jax.Array) -> jax.Array:
    y = x @ p["w"].T
    if p.get("b") is not None:
        y = y + p["b"]
    return y


# ------------------------------------------------------------ TextEncoder ---

def rvq_decode(codebook: jax.Array, codes: jax.Array) -> jax.Array:
    """Single-codebook residual VQ decode: [B, T] ids -> [B, T, ssl_dim]."""
    return codebook[codes]


def mrte(p: dict, cfg: VITSConfig, ssl: jax.Array, text: jax.Array,
         ge: jax.Array) -> jax.Array:
    """Multi-Reference Timbre Encoder: cross-attention from ssl frames onto
    the phoneme sequence, plus the style vector."""
    B, T, C = ssl.shape
    H = cfg.n_heads
    sq = conv1d(p["c_pre"], ssl)
    tk = conv1d(p["text_pre"], text)
    q = sq.reshape(B, T, H, -1).transpose(0, 2, 1, 3)
    k = tk.reshape(B, tk.shape[1], H, -1).transpose(0, 2, 1, 3)
    v = k
    probs = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5), -1)
    cross = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    cross = cross.transpose(0, 2, 1, 3).reshape(B, T, -1)
    gevec = ge[:, None, :]
    if gevec.shape[-1] != sq.shape[-1]:
        gevec = conv1d(p["ge_proj"], gevec)
    h = cross + sq + gevec
    return conv1d(p["c_post"], h)


def text_encoder(p: dict, cfg: VITSConfig, ssl: jax.Array, text: jax.Array,
                 ge: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(quantized ssl [B,T,ssl_dim], phonemes [B,Tt], ge) -> (m, logs)
    each [B, T, inter_channels]."""
    y = conv1d(p["ssl_proj"], ssl)                         # -> hidden
    y = _encoder(p["encoder_ssl"], cfg, y, None, cfg.n_layers)
    t = embedding(p["text_embedding"], text)
    t = t * cfg.hidden_channels ** 0.5
    t = _encoder(p["encoder_text"], cfg, t, None, cfg.n_layers)
    y = mrte(p["mrte"], cfg, y, t, ge)
    y = _encoder(p["encoder2"], cfg, y, None, cfg.n_layers // 2)
    stats = conv1d(p["proj"], y)                           # [B,T,2*inter]
    m, logs = jnp.split(stats, 2, axis=-1)
    return m, logs


# ----------------------------------------------------------------- flow -----

def _wn(p: dict, cfg: VITSConfig, x: jax.Array, g: jax.Array) -> jax.Array:
    """WaveNet stack with gated tanh units + global conditioning
    (the reference folds this behind weight_norm.rs; weights pre-folded)."""
    hidden = x.shape[-1]
    out = jnp.zeros_like(x)
    cond = conv1d(p["cond"], g[:, None, :])                # [B,1,2*h*L]
    for i in range(cfg.wn_layers):
        dil = 1
        pad = (cfg.wn_kernel - 1) * dil // 2
        h = conv1d(p["in"][i], x, padding=pad, dilation=dil)
        gi = jax.lax.dynamic_slice_in_dim(cond, i * 2 * hidden, 2 * hidden,
                                          axis=2)
        h = h + gi
        a, b = jnp.split(h, 2, axis=-1)
        acts = jnp.tanh(a) * jax.nn.sigmoid(b)
        rs = conv1d(p["res_skip"][i], acts)
        if i < cfg.wn_layers - 1:
            x = x + rs[..., :hidden]
            out = out + rs[..., hidden:]
        else:
            out = out + rs
    return out


def flow_reverse(p: dict, cfg: VITSConfig, z: jax.Array,
                 g: jax.Array) -> jax.Array:
    """ResidualCouplingBlock in reverse (mean-only couplings + flips)."""
    half = cfg.inter_channels // 2
    for lp in reversed(p["flows"]):
        # undo the flip that follows each coupling in forward order
        z = z[..., ::-1]
        x0, x1 = z[..., :half], z[..., half:]
        h = conv1d(lp["pre"], x0)
        h = _wn(lp["wn"], cfg, h, g)
        m = conv1d(lp["post"], h)
        x1 = x1 - m
        z = jnp.concatenate([x0, x1], axis=-1)
    return z


def flow_forward(p: dict, cfg: VITSConfig, x: jax.Array,
                 g: jax.Array) -> jax.Array:
    """Forward direction (training / invertibility tests)."""
    half = cfg.inter_channels // 2
    for lp in p["flows"]:
        x0, x1 = x[..., :half], x[..., half:]
        h = conv1d(lp["pre"], x0)
        h = _wn(lp["wn"], cfg, h, g)
        m = conv1d(lp["post"], h)
        x1 = x1 + m
        x = jnp.concatenate([x0, x1], axis=-1)
        x = x[..., ::-1]
    return x


# ------------------------------------------------------------- generator ----

def generator(p: dict, cfg: VITSConfig, z: jax.Array,
              ge: jax.Array) -> jax.Array:
    """HiFiGAN-style decoder with speaker conditioning: [B, T, inter] ->
    [B, T*hop] waveform in [-1, 1]."""
    x = conv1d(p["conv_pre"], z, padding=3)                # kernel 7
    x = x + conv1d(p["cond"], ge[:, None, :])
    for i, (r, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, 0.1)
        x = conv_transpose1d(p["ups"][i], x, stride=r, padding=(k - r) // 2)
        acc = None
        for j, (rk, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilation_sizes)):
            rp = p["resblocks"][i * len(cfg.resblock_kernel_sizes) + j]
            h = x
            for d_i, d in enumerate(dils):
                t = jax.nn.leaky_relu(h, 0.1)
                t = conv1d(rp["convs1"][d_i], t,
                           padding=(rk - 1) * d // 2, dilation=d)
                t = jax.nn.leaky_relu(t, 0.1)
                t = conv1d(rp["convs2"][d_i], t, padding=(rk - 1) // 2)
                h = h + t
            acc = h if acc is None else acc + h
        x = acc / len(cfg.resblock_kernel_sizes)
    x = jax.nn.leaky_relu(x, 0.1)
    x = conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x[..., 0])


# ----------------------------------------------------- posterior (training) -

def posterior_encoder(p: dict, cfg: VITSConfig, spec: jax.Array,
                      g: jax.Array, key) -> Tuple[jax.Array, jax.Array,
                                                  jax.Array]:
    """enc_q: linear spectrogram -> latent z (training path only)."""
    h = conv1d(p["pre"], spec)
    h = _wn(p["wn"], cfg, h, g)
    stats = conv1d(p["proj"], h)
    m, logs = jnp.split(stats, 2, axis=-1)
    z = m + jax.random.normal(key, m.shape) * jnp.exp(logs)
    return z, m, logs


# ----------------------------------------------------------- full decode ----

_DECODE_CACHE: dict = {}


def sovits_decode(params: dict, cfg: VITSConfig, codes: jax.Array,
                  text: jax.Array, refer_spec: jax.Array,
                  noise_scale: float = 0.5,
                  key: Optional[jax.Array] = None) -> jax.Array:
    """codes [B, Tc] semantic ids, text [B, Tt] phoneme ids,
    refer_spec [B, Tr, spec_channels] -> waveform [B, Tc*2*hop].

    Reference call path: SoVITS::decode (sovits.rs) = ref_enc -> quantizer
    decode + 2x upsample -> enc_p -> flow reverse -> dec. The whole chain
    runs as ONE memoized jit (eager dispatch would pay the per-op RPC cost
    hundreds of times; params ride as operands, see flux_klein.py)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    ck = (repr(cfg), float(noise_scale))
    fn = _DECODE_CACHE.get(ck)
    if fn is None:
        @jax.jit
        def fn(params, codes, text, refer_spec, key):
            # run in the model's own dtype (bf16 checkpoints: convs need
            # matching operand dtypes)
            dtype = params["dec"]["conv_pre"]["w"].dtype
            refer_spec_ = refer_spec.astype(dtype)
            ge = mel_style_encoder(params["ref_enc"], cfg, refer_spec_)
            ssl = rvq_decode(params["quantizer"]["codebook"], codes)
            ssl = jnp.repeat(ssl, 2, axis=1)         # 25Hz -> 50Hz
            m_p, logs_p = text_encoder(params["enc_p"], cfg, ssl, text, ge)
            z_p = (m_p + jax.random.normal(key, m_p.shape, dtype)
                   * jnp.exp(logs_p) * noise_scale).astype(dtype)
            z = flow_reverse(params["flow"], cfg, z_p, ge)
            return generator(params["dec"], cfg, z, ge)
        _DECODE_CACHE[ck] = fn
    return fn(params, codes, text, refer_spec, key)


# ------------------------------------------------------------------- init ---

def _conv_p(key, cin, cout, k, bias=True, dtype=jnp.float32):
    s = (cin * k) ** -0.5
    p = {"w": jax.random.uniform(key, (cout, k, cin), dtype, -s, s)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _lin_p(key, cin, cout, dtype=jnp.float32):
    s = cin ** -0.5
    return {"w": jax.random.uniform(key, (cout, cin), dtype, -s, s),
            "b": jnp.zeros((cout,), dtype)}


def _attn_p(key, cfg: VITSConfig, c, rel=True, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    s = c ** -0.5
    p = {"q_w": jax.random.uniform(ks[0], (c, 1, c), dtype, -s, s),
         "k_w": jax.random.uniform(ks[1], (c, 1, c), dtype, -s, s),
         "v_w": jax.random.uniform(ks[2], (c, 1, c), dtype, -s, s),
         "o_w": jax.random.uniform(ks[3], (c, 1, c), dtype, -s, s)}
    if rel:
        hd = c // cfg.n_heads
        p["emb_rel_k"] = jax.random.normal(ks[4], (1, 9, hd), dtype) * hd ** -0.5
        p["emb_rel_v"] = jax.random.normal(ks[5], (1, 9, hd), dtype) * hd ** -0.5
    return p


def _encoder_p(key, cfg: VITSConfig, n_layers, dtype=jnp.float32):
    c, f = cfg.hidden_channels, cfg.filter_channels
    layers = []
    for i in range(n_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        layers.append({
            "attn": _attn_p(ks[0], cfg, c, dtype=dtype),
            "norm1": {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
            "ffn1": _conv_p(ks[1], c, f, cfg.kernel_size, dtype=dtype),
            "ffn2": _conv_p(ks[2], f, c, cfg.kernel_size, dtype=dtype),
            "norm2": {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
        })
    return {"layers": layers}


def _wn_p(key, cfg: VITSConfig, hidden, dtype=jnp.float32):
    ks = jax.random.split(key, 2 * cfg.wn_layers + 1)
    p = {"cond": _conv_p(ks[0], cfg.gin_channels,
                         2 * hidden * cfg.wn_layers, 1, dtype=dtype),
         "in": [], "res_skip": []}
    for i in range(cfg.wn_layers):
        p["in"].append(_conv_p(ks[1 + 2 * i], hidden, 2 * hidden,
                               cfg.wn_kernel, dtype=dtype))
        cout = 2 * hidden if i < cfg.wn_layers - 1 else hidden
        p["res_skip"].append(_conv_p(ks[2 + 2 * i], hidden, cout, 1,
                                     dtype=dtype))
    return p


def init_params(cfg: VITSConfig, key, dtype=jnp.float32) -> dict:
    # generous key budget: full-size config needs ~'flows + upsamples +
    # resblocks*dilations*2 + encoders' draws (64 was too few for the
    # production 5-upsample/3-resblock config)
    n_keys = (64 + 2 * cfg.flow_layers
              + len(cfg.upsample_rates) * (1 + 2 * sum(
                  len(d) for d in cfg.resblock_dilation_sizes)))
    ks = iter(jax.random.split(key, n_keys))
    half = cfg.inter_channels // 2
    hc = cfg.hidden_channels

    flows = []
    for _ in range(cfg.flow_layers):
        flows.append({
            "pre": _conv_p(next(ks), half, hc, 1, dtype=dtype),
            "wn": _wn_p(next(ks), cfg, hc, dtype),
            "post": {"w": jnp.zeros((half, 1, hc), dtype),
                     "b": jnp.zeros((half,), dtype)},
        })

    n_res = len(cfg.resblock_kernel_sizes)
    ups, resblocks = [], []
    ch = cfg.upsample_initial_channel
    for i, (r, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cout = ch // (2 ** (i + 1))
        cin = ch // (2 ** i)
        ups.append({"w": jax.random.normal(next(ks), (cout, k, cin), dtype)
                    * 0.01, "b": jnp.zeros((cout,), dtype)})
        for rk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
            resblocks.append({
                "convs1": [_conv_p(next(ks), cout, cout, rk, dtype=dtype)
                           for _ in dils],
                "convs2": [_conv_p(next(ks), cout, cout, rk, dtype=dtype)
                           for _ in dils],
            })
    ch_last = ch // (2 ** len(cfg.upsample_rates))

    enc_p = {
        "ssl_proj": _conv_p(next(ks), cfg.ssl_dim, hc, 1, dtype=dtype),
        "encoder_ssl": _encoder_p(next(ks), cfg, cfg.n_layers, dtype),
        "text_embedding": jax.random.normal(
            next(ks), (cfg.n_symbols, hc), dtype) * hc ** -0.5,
        "encoder_text": _encoder_p(next(ks), cfg, cfg.n_layers, dtype),
        "mrte": {
            "c_pre": _conv_p(next(ks), hc, hc, 1, dtype=dtype),
            "text_pre": _conv_p(next(ks), hc, hc, 1, dtype=dtype),
            "ge_proj": _conv_p(next(ks), cfg.gin_channels, hc, 1,
                               dtype=dtype),
            "c_post": _conv_p(next(ks), hc, hc, 1, dtype=dtype),
        },
        "encoder2": _encoder_p(next(ks), cfg, cfg.n_layers // 2, dtype),
        "proj": _conv_p(next(ks), hc, 2 * cfg.inter_channels, 1, dtype=dtype),
    }

    ref_enc = {
        "spectral1": _lin_p(next(ks), cfg.spec_channels, 128, dtype),
        "spectral2": _lin_p(next(ks), 128, 128, dtype),
        "temporal1": _conv_p(next(ks), 128, 256, 5, dtype=dtype),
        "temporal2": _conv_p(next(ks), 128, 256, 5, dtype=dtype),
        "attn": {"q": _lin_p(next(ks), 128, 128, dtype),
                 "k": _lin_p(next(ks), 128, 128, dtype),
                 "v": _lin_p(next(ks), 128, 128, dtype),
                 "o": _lin_p(next(ks), 128, 128, dtype)},
        "fc": _lin_p(next(ks), 128, cfg.gin_channels, dtype),
    }

    return {
        "quantizer": {"codebook": jax.random.normal(
            next(ks), (cfg.codebook_size, cfg.ssl_dim), dtype) * 0.02},
        "enc_p": enc_p,
        "ref_enc": ref_enc,
        "flow": {"flows": flows},
        "dec": {
            "conv_pre": _conv_p(next(ks), cfg.inter_channels,
                                cfg.upsample_initial_channel, 7, dtype=dtype),
            "cond": _conv_p(next(ks), cfg.gin_channels,
                            cfg.upsample_initial_channel, 1, dtype=dtype),
            "ups": ups,
            "resblocks": resblocks,
            "conv_post": _conv_p(next(ks), ch_last, 1, 7, bias=True,
                                 dtype=dtype),
        },
        "enc_q": {
            "pre": _conv_p(next(ks), cfg.spec_channels, hc, 1, dtype=dtype),
            "wn": _wn_p(next(ks), cfg, hc, dtype),
            "proj": _conv_p(next(ks), hc, 2 * cfg.inter_channels, 1,
                            dtype=dtype),
        },
    }


# -------------------------------------------------- checkpoint conversion ---

def fold_weight_norm(flat: dict) -> dict:
    """Fold torch weight-norm pairs (name.weight_g / name.weight_v) into a
    plain name.weight. Inference never re-normalizes (reference keeps WN
    live at load, nn/weight_norm.rs; folding is the TPU-friendly choice)."""
    out = {}
    for name, t in flat.items():
        if name.endswith(".weight_v"):
            base = name[:-len(".weight_v")]
            g = flat[base + ".weight_g"]
            v = t
            axes = tuple(range(1, v.ndim))
            norm = jnp.sqrt(jnp.sum(jnp.asarray(v, jnp.float32) ** 2, axes,
                                    keepdims=True)) + 1e-9
            out[base + ".weight"] = (jnp.asarray(g, jnp.float32) / norm
                                     * jnp.asarray(v, jnp.float32))
        elif name.endswith(".weight_g"):
            continue
        else:
            out[name] = t
    return out


def _tc(w) -> jax.Array:
    """torch Conv1d [out, in, k] -> our [out, k, in]."""
    return jnp.transpose(jnp.asarray(w), (0, 2, 1))


def flat_from_params(params: dict, cfg: VITSConfig) -> dict:
    """Inverse of params_from_flat: emit the published GPT-SoVITS v2 s2
    tensor names (the loader names in reference gpt-sovits-mlx/src/models/
    vits.rs:2400+). Feeds utils/onnx_export.export_vits_onnx and the
    synthetic name-map round-trip tests; weight-norm is emitted pre-folded
    (plain .weight — fold_weight_norm passes it through)."""
    import numpy as np

    out = {}

    def _ct(w):                     # our [out, k, in] -> torch [out, in, k]
        return np.asarray(w).transpose(0, 2, 1)

    def conv(name, p):
        out[f"{name}.weight"] = _ct(p["w"])
        if "b" in p:
            out[f"{name}.bias"] = np.asarray(p["b"])

    def lin(name, p):
        out[f"{name}.weight"] = np.asarray(p["w"])
        if "b" in p:
            out[f"{name}.bias"] = np.asarray(p["b"])

    def norm(name, p):
        out[f"{name}.gamma"] = np.asarray(p["w"])
        out[f"{name}.beta"] = np.asarray(p["b"])

    def enc(name, ep):
        for i, lp in enumerate(ep["layers"]):
            ap = lp["attn"]
            for nm, key in (("conv_q", "q"), ("conv_k", "k"),
                            ("conv_v", "v"), ("conv_o", "o")):
                w = ap[f"{key}_w"]
                out[f"{name}.attn_layers.{i}.{nm}.weight"] = _ct(w)
                # init_params draws bias-free attention convs; the torch
                # checkpoint always has biases — emit zeros in that case
                b = ap.get(f"{key}_b")
                out[f"{name}.attn_layers.{i}.{nm}.bias"] = (
                    np.asarray(b) if b is not None
                    else np.zeros((np.asarray(w).shape[0],), np.float32))
            for rel in ("emb_rel_k", "emb_rel_v"):
                if rel in ap:
                    out[f"{name}.attn_layers.{i}.{rel}"] = np.asarray(ap[rel])
            norm(f"{name}.norm_layers_1.{i}", lp["norm1"])
            conv(f"{name}.ffn_layers.{i}.conv_1", lp["ffn1"])
            conv(f"{name}.ffn_layers.{i}.conv_2", lp["ffn2"])
            norm(f"{name}.norm_layers_2.{i}", lp["norm2"])

    def wn(name, p):
        conv(f"{name}.cond_layer", p["cond"])
        for i, ip in enumerate(p["in"]):
            conv(f"{name}.in_layers.{i}", ip)
        for i, rp in enumerate(p["res_skip"]):
            conv(f"{name}.res_skip_layers.{i}", rp)

    for fi, fp in enumerate(params["flow"]["flows"]):
        conv(f"flow.flows.{2 * fi}.pre", fp["pre"])
        wn(f"flow.flows.{2 * fi}.enc", fp["wn"])
        conv(f"flow.flows.{2 * fi}.post", fp["post"])

    dec = params["dec"]
    conv("dec.conv_pre", dec["conv_pre"])
    conv("dec.cond", dec["cond"])
    for i, up in enumerate(dec["ups"]):
        conv(f"dec.ups.{i}", up)
    for i, rb in enumerate(dec["resblocks"]):
        for j, cp in enumerate(rb["convs1"]):
            conv(f"dec.resblocks.{i}.convs1.{j}", cp)
        for j, cp in enumerate(rb["convs2"]):
            conv(f"dec.resblocks.{i}.convs2.{j}", cp)
    conv("dec.conv_post", dec["conv_post"])

    ep = params["enc_p"]
    conv("enc_p.ssl_proj", ep["ssl_proj"])
    enc("enc_p.encoder_ssl", ep["encoder_ssl"])
    out["enc_p.text_embedding.weight"] = np.asarray(ep["text_embedding"])
    enc("enc_p.encoder_text", ep["encoder_text"])
    conv("enc_p.mrte.c_pre", ep["mrte"]["c_pre"])
    conv("enc_p.mrte.text_pre", ep["mrte"]["text_pre"])
    conv("enc_p.mrte.c_post", ep["mrte"]["c_post"])
    # no torch name for ge_proj: the reference MRTE adds the style vector
    # unprojected (vits.rs:895-923) — only configs with gin==hidden round-trip
    enc("enc_p.encoder2", ep["encoder2"])
    conv("enc_p.proj", ep["proj"])

    re = params["ref_enc"]
    lin("ref_enc.spectral.0", re["spectral1"])
    lin("ref_enc.spectral.3", re["spectral2"])
    conv("ref_enc.temporal.0.conv", re["temporal1"])
    conv("ref_enc.temporal.1.conv", re["temporal2"])
    lin("ref_enc.slf_attn.w_qs", re["attn"]["q"])
    lin("ref_enc.slf_attn.w_ks", re["attn"]["k"])
    lin("ref_enc.slf_attn.w_vs", re["attn"]["v"])
    lin("ref_enc.slf_attn.fc", re["attn"]["o"])
    lin("ref_enc.fc", re["fc"])

    out["quantizer.vq.layers.0._codebook.embed"] = np.asarray(
        params["quantizer"]["codebook"])[None]
    if "enc_q" in params:
        conv("enc_q.pre", params["enc_q"]["pre"])
        wn("enc_q.enc", params["enc_q"]["wn"])
        conv("enc_q.proj", params["enc_q"]["proj"])
    return out


def params_from_flat(flat: dict, cfg: VITSConfig) -> dict:
    """Map a GPT-SoVITS v2 s2 checkpoint (torch names, weight-norm folded)
    onto the pytree init_params() produces. Uses the public module names
    (enc_p / ref_enc / flow / dec / quantizer / enc_q)."""
    flat = fold_weight_norm(flat)

    def conv(name):
        p = {"w": _tc(flat[f"{name}.weight"])}
        if f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def lin(name):
        p = {"w": jnp.asarray(flat[f"{name}.weight"])}
        if f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def norm(name):
        return {"w": jnp.asarray(flat[f"{name}.gamma"]
                                 if f"{name}.gamma" in flat
                                 else flat[f"{name}.weight"]),
                "b": jnp.asarray(flat[f"{name}.beta"]
                                 if f"{name}.beta" in flat
                                 else flat[f"{name}.bias"])}

    def enc(name, n_layers):
        layers = []
        for i in range(n_layers):
            ap = {"q_w": _tc(flat[f"{name}.attn_layers.{i}.conv_q.weight"]),
                  "q_b": jnp.asarray(flat[f"{name}.attn_layers.{i}.conv_q.bias"]),
                  "k_w": _tc(flat[f"{name}.attn_layers.{i}.conv_k.weight"]),
                  "k_b": jnp.asarray(flat[f"{name}.attn_layers.{i}.conv_k.bias"]),
                  "v_w": _tc(flat[f"{name}.attn_layers.{i}.conv_v.weight"]),
                  "v_b": jnp.asarray(flat[f"{name}.attn_layers.{i}.conv_v.bias"]),
                  "o_w": _tc(flat[f"{name}.attn_layers.{i}.conv_o.weight"]),
                  "o_b": jnp.asarray(flat[f"{name}.attn_layers.{i}.conv_o.bias"])}
            for rel in ("emb_rel_k", "emb_rel_v"):
                if f"{name}.attn_layers.{i}.{rel}" in flat:
                    ap[rel] = jnp.asarray(flat[f"{name}.attn_layers.{i}.{rel}"])
            layers.append({
                "attn": ap,
                "norm1": norm(f"{name}.norm_layers_1.{i}"),
                "ffn1": conv(f"{name}.ffn_layers.{i}.conv_1"),
                "ffn2": conv(f"{name}.ffn_layers.{i}.conv_2"),
                "norm2": norm(f"{name}.norm_layers_2.{i}"),
            })
        return {"layers": layers}

    def wn(name):
        p = {"cond": conv(f"{name}.cond_layer"), "in": [], "res_skip": []}
        for i in range(cfg.wn_layers):
            p["in"].append(conv(f"{name}.in_layers.{i}"))
            p["res_skip"].append(conv(f"{name}.res_skip_layers.{i}"))
        return p

    flows = []
    # torch ModuleList interleaves couplings with flips: indices 0,2,4,...
    for i in range(0, 2 * cfg.flow_layers, 2):
        flows.append({
            "pre": conv(f"flow.flows.{i}.pre"),
            "wn": wn(f"flow.flows.{i}.enc"),
            "post": conv(f"flow.flows.{i}.post"),
        })

    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    dec = {
        "conv_pre": conv("dec.conv_pre"),
        "cond": conv("dec.cond"),
        "ups": [conv(f"dec.ups.{i}") for i in range(n_up)],
        "resblocks": [
            {"convs1": [conv(f"dec.resblocks.{i}.convs1.{j}")
                        for j in range(len(cfg.resblock_dilation_sizes[0]))],
             "convs2": [conv(f"dec.resblocks.{i}.convs2.{j}")
                        for j in range(len(cfg.resblock_dilation_sizes[0]))]}
            for i in range(n_up * n_res)],
        "conv_post": conv("dec.conv_post"),
    }

    enc_p = {
        "ssl_proj": conv("enc_p.ssl_proj"),
        "encoder_ssl": enc("enc_p.encoder_ssl", cfg.n_layers),
        "text_embedding": jnp.asarray(flat["enc_p.text_embedding.weight"]),
        "encoder_text": enc("enc_p.encoder_text", cfg.n_layers),
        "mrte": {"c_pre": conv("enc_p.mrte.c_pre"),
                 "text_pre": conv("enc_p.mrte.text_pre"),
                 "c_post": conv("enc_p.mrte.c_post")},
        "encoder2": enc("enc_p.encoder2", cfg.n_layers // 2),
        "proj": conv("enc_p.proj"),
    }

    ref_enc = {
        "spectral1": lin("ref_enc.spectral.0"),
        "spectral2": lin("ref_enc.spectral.3"),
        "temporal1": conv("ref_enc.temporal.0.conv"),
        "temporal2": conv("ref_enc.temporal.1.conv"),
        "attn": {"q": lin("ref_enc.slf_attn.w_qs"),
                 "k": lin("ref_enc.slf_attn.w_ks"),
                 "v": lin("ref_enc.slf_attn.w_vs"),
                 "o": lin("ref_enc.slf_attn.fc")},
        "fc": lin("ref_enc.fc"),
    }

    cb = flat.get("quantizer.vq.layers.0._codebook.embed")
    if cb is None:
        cb = flat["quantizer.codebook"]
    cb = jnp.asarray(cb)
    if cb.ndim == 3:
        cb = cb[0]

    params = {"quantizer": {"codebook": cb}, "enc_p": enc_p,
              "ref_enc": ref_enc, "flow": {"flows": flows}, "dec": dec}
    if "enc_q.pre.weight" in flat:
        params["enc_q"] = {"pre": conv("enc_q.pre"), "wn": wn("enc_q.enc"),
                           "proj": conv("enc_q.proj")}
    return params
