"""Functional NN layers over param pytrees.

TPU-native replacement for the reference's ``Module<Input>`` trait +
``ModuleParameters`` derive-macro system (reference: mlx-rs/src/module/
module.rs:28-43, mlx-macros/). JAX pytrees make the macro layer unnecessary:
parameters are plain nested dicts, layers are pure functions, and quantized
layers are the same function dispatching on the leaf type (the reference's
``MaybeQuantized`` enum becomes an isinstance check on ``QuantizedTensor``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.quant import (QuantizedTensor, dequantize,
                                       quantize_tensor)
from ominix_mlx_tpu.ops.quant_matmul import (ChannelQuantizedTensor,
                                             PackedQuantizedTensor,
                                             quantized_matmul)


# ---------------------------------------------------------------- linear ----

def linear(params: dict, x: jax.Array, norm: tuple | None = None) -> jax.Array:
    """y = x @ W^T (+ b). params: {"w": [out,in] | QuantizedTensor, "b"?}.

    Equivalent of reference nn::Linear / nn::QuantizedLinear (mlx-rs/src/nn/).

    norm (optional (weight, eps)): rmsnorm x first. Quantized decode paths
    fuse it into the Pallas kernel prologue (ops/quant_matmul.py); dense and
    prefill paths apply it inline — identical math to a separate rms_norm
    call, and XLA CSE merges the repeats when several projections of one
    layer share the same normed input."""
    w = params["w"]
    if isinstance(w, (QuantizedTensor, PackedQuantizedTensor,
                      ChannelQuantizedTensor)):
        if norm is not None:
            y = quantized_matmul(x, w, norm_w=norm[0], norm_eps=norm[1])
        else:
            y = quantized_matmul(x, w)
    else:
        if norm is not None:
            x = rms_norm(norm[0], x, norm[1])
        y = jnp.dot(x, w.T, preferred_element_type=x.dtype)
    b = params.get("b")
    if b is not None:
        y = y + b
    return y


def init_linear(key, in_features: int, out_features: int, bias: bool = False,
                dtype=jnp.bfloat16, scale: Optional[float] = None) -> dict:
    if scale is None:
        scale = 1.0 / (in_features ** 0.5)
    p = {"w": jax.random.uniform(key, (out_features, in_features), dtype,
                                 -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((out_features,), dtype)
    return p


def quantize_linear(params: dict, group_size: int = 64, bits: int = 4) -> dict:
    """Post-hoc quantize a dense linear's weight (reference
    ``QuantizedLinear::try_from_linear``)."""
    out = dict(params)
    if not isinstance(params["w"], QuantizedTensor):
        out["w"] = quantize_tensor(params["w"], group_size, bits)
    return out


# ----------------------------------------------------------------- norms ----

def rms_norm(weight: jax.Array, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Reference: nn::RmsNorm / mlx_fast_rms_norm (mlx-rs/src/fast.rs:165)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * inv).astype(dtype) * weight


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """params: {"w"?, "b"?}. Reference: nn::LayerNorm / fast.rs:197."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(dtype)
    if params.get("w") is not None:
        y = y * params["w"]
    if params.get("b") is not None:
        y = y + params["b"]
    return y


# ------------------------------------------------------------- embedding ----

def embedding(weight, tokens: jax.Array) -> jax.Array:
    """weight: [V, D], QuantizedTensor or PackedQuantizedTensor.
    Reference: nn::Embedding / nn::QuantizedEmbedding. Quantized lookups
    dequantize only the gathered rows."""
    if isinstance(weight, PackedQuantizedTensor):
        from ominix_mlx_tpu.ops.quant_matmul import gather_rows
        return gather_rows(weight, tokens)
    if isinstance(weight, ChannelQuantizedTensor):
        from ominix_mlx_tpu.ops.quant_matmul import channel_gather_rows
        return channel_gather_rows(weight, tokens)
    if isinstance(weight, QuantizedTensor):
        gs = weight.group_size
        V, K = weight.q.shape
        rows = weight.q[tokens].astype(jnp.float32)
        s = weight.scales[tokens].astype(jnp.float32)
        b = weight.biases[tokens].astype(jnp.float32)
        w = rows.reshape(*rows.shape[:-1], K // gs, gs)
        w = w * s[..., None] + b[..., None]
        return w.reshape(*rows.shape).astype(jnp.bfloat16)
    return weight[tokens]


def embedding_as_linear(weight, x: jax.Array,
                        norm: tuple | None = None) -> jax.Array:
    """Tied lm_head: x @ E^T (reference: embed.as_linear,
    qwen3-mlx/src/model.rs:478-486). norm: see ``linear``."""
    if isinstance(weight, (QuantizedTensor, PackedQuantizedTensor,
                           ChannelQuantizedTensor)):
        if norm is not None:
            return quantized_matmul(x, weight, norm_w=norm[0],
                                    norm_eps=norm[1])
        return quantized_matmul(x, weight)
    if norm is not None:
        x = rms_norm(norm[0], x, norm[1])
    return jnp.dot(x, weight.T, preferred_element_type=x.dtype)


# ----------------------------------------------------------- activations ----

def silu(x):
    return jax.nn.silu(x)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """silu(gate) * up. The reference ships a fused Metal kernel
    (mlx-rs-core/src/metal_kernels.rs:186, '10-12x faster'); on TPU, XLA
    fuses this elementwise chain into the surrounding matmuls for free."""
    return jax.nn.silu(gate) * up


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


# ------------------------------------------------------------------ conv ----

def conv1d(params: dict, x: jax.Array, stride: int = 1, padding=0,
           groups: int = 1, dilation: int = 1) -> jax.Array:
    """x: [B, T, C_in]; params["w"]: [C_out, K, C_in/groups] (MLX layout).

    Reference: nn::Conv1d. MLX and JAX both use channels-last activations;
    weight layout [out, k, in] maps to lax dimension numbers (NHC, OHI).
    """
    w = params["w"]
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NHC", "OHI", "NHC"),
        preferred_element_type=x.dtype)
    if params.get("b") is not None:
        y = y + params["b"]
    return y


def conv2d(params: dict, x: jax.Array, stride=(1, 1), padding=0,
           groups: int = 1) -> jax.Array:
    """x: [B, H, W, C_in]; params["w"]: [C_out, KH, KW, C_in/groups]."""
    w = params["w"]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple) and all(isinstance(p, int) for p in padding):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "OHWI", "NHWC"),
        preferred_element_type=x.dtype)
    if params.get("b") is not None:
        y = y + params["b"]
    return y


def conv_transpose1d(params: dict, x: jax.Array, stride: int = 1,
                     padding: int = 0) -> jax.Array:
    """x: [B, T, C_in]; params["w"]: [C_out, K, C_in] (MLX ConvTranspose1d).

    ``padding`` uses torch/MLX semantics: out = (T-1)*stride + K - 2*padding.
    lax.conv_transpose's explicit pads count output positions, so torch
    padding p maps to lo = hi = K - 1 - p.
    """
    w = params["w"]
    K = w.shape[1]
    lo = K - 1 - padding
    # with transpose_kernel=True the rhs spec names the FORWARD conv's dims:
    # its I(nput) = our C_out, its O(utput) = our C_in -> "IHO" for our
    # [C_out, K, C_in] storage
    y = jax.lax.conv_transpose(
        x, w, strides=(stride,), padding=[(lo, lo)],
        dimension_numbers=("NHC", "IHO", "NHC"),
        transpose_kernel=True)
    if params.get("b") is not None:
        y = y + params["b"]
    return y


# ------------------------------------------------------ recurrent / misc ----
#
# Recurrent and resampling layers from the reference's nn set
# (mlx-rs/src/nn/recurrent.rs, pooling.rs, upsample.rs). All are
# lax.scan-based so they stay jit-compatible; the hybrid LLM families use
# specialized kernels instead (deltanet/GLA), these cover the general API.

def rnn(params: dict, x: jax.Array, h0=None):
    """Elman RNN: x [B, T, I] -> (outputs [B, T, H], h_T [B, H]).
    params: {"wx": [H, I], "wh": [H, H], "b"?: [H]}."""
    B, T, _ = x.shape
    H = params["wx"].shape[0]
    h0 = h0 if h0 is not None else jnp.zeros((B, H), x.dtype)
    xw = jnp.einsum("bti,hi->bth", x, params["wx"])
    if params.get("b") is not None:
        xw = xw + params["b"]

    def step(h, xt):
        h = jnp.tanh(xt + h @ params["wh"].T)
        return h, h

    hT, ys = jax.lax.scan(step, h0, xw.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), hT


def gru(params: dict, x: jax.Array, h0=None):
    """GRU: params {"wx": [3H, I], "wh": [3H, H], "b"?: [3H], "bhn"?: [H]}
    (gate order r, z, n — torch convention)."""
    B, T, _ = x.shape
    H = params["wh"].shape[1]
    h0 = h0 if h0 is not None else jnp.zeros((B, H), x.dtype)
    xw = jnp.einsum("bti,hi->bth", x, params["wx"])
    if params.get("b") is not None:
        xw = xw + params["b"]

    def step(h, xt):
        hw = h @ params["wh"].T
        xr, xz, xn = jnp.split(xt, 3, -1)
        hr, hz, hn = jnp.split(hw, 3, -1)
        if params.get("bhn") is not None:
            hn = hn + params["bhn"]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1 - z) * n + z * h
        return h, h

    hT, ys = jax.lax.scan(step, h0, xw.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), hT


def lstm(params: dict, x: jax.Array, state=None):
    """LSTM: params {"wx": [4H, I], "wh": [4H, H], "b"?: [4H]} (gate order
    i, f, g, o)."""
    B, T, _ = x.shape
    H = params["wh"].shape[1]
    if state is None:
        state = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    xw = jnp.einsum("bti,hi->bth", x, params["wx"])
    if params.get("b") is not None:
        xw = xw + params["b"]

    def step(hc, xt):
        h, c = hc
        g = xt + h @ params["wh"].T
        i, f, gg, o = jnp.split(g, 4, -1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (hT, cT), ys = jax.lax.scan(step, state, xw.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), (hT, cT)


def max_pool1d(x: jax.Array, k: int, stride=None) -> jax.Array:
    """[B, T, C] -> [B, T', C]."""
    stride = stride or k
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, 1), (1, stride, 1), "VALID")


def avg_pool1d(x: jax.Array, k: int, stride=None) -> jax.Array:
    stride = stride or k
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, 1),
                              (1, stride, 1), "VALID")
    return s / k


def max_pool2d(x: jax.Array, k: int, stride=None) -> jax.Array:
    """[B, H, W, C]."""
    stride = stride or k
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        "VALID")


def avg_pool2d(x: jax.Array, k: int, stride=None) -> jax.Array:
    stride = stride or k
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, stride, stride, 1), "VALID")
    return s / (k * k)


def upsample(x: jax.Array, scale, mode: str = "nearest") -> jax.Array:
    """[B, spatial..., C] integer-factor upsampling (nearest/linear)."""
    if isinstance(scale, int):
        scale = (scale,) * (x.ndim - 2)
    shape = (x.shape[0],
             *(int(d * s) for d, s in zip(x.shape[1:-1], scale)),
             x.shape[-1])
    method = "nearest" if mode == "nearest" else "bilinear"
    return jax.image.resize(x, shape, method)


def group_norm(params: dict, x: jax.Array, groups: int,
               eps: float = 1e-5) -> jax.Array:
    """Channels-last group norm over any spatial rank."""
    C = x.shape[-1]
    g = x.reshape(*x.shape[:-1], groups, C // groups)
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mu = g.mean(axes, keepdims=True)
    var = ((g - mu) ** 2).mean(axes, keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(x.shape) * params["w"] + params["b"]
