"""Pallas fused quantized matmuls: x @ W^T with group-quantized W.

TPU-native equivalent of the reference's ``quantized_matmul`` (reference:
mlx-rs/src/ops/quantization.rs:92). Decode is HBM-bandwidth-bound, so the
win comes from streaming int8/int4 codes instead of bf16 — but naive
per-element dequant on the VPU is ~5-10x slower than the DMA, so the group
structure must ride the MXU instead. Three kernels:

1. **P-kernel, w8a8** (decode, int8 codes): per-group partial sums
   ``P[n, g*M+m] = sum_e codes[n,k] * x_q[m,k]`` computed as ONE int8 MXU
   matmul ``codes @ blockdiag(x_q)``; scales applied on the 40x-smaller
   [TN, G*M] array; the group-bias term is ``(group-sums of x) @ biases^T``.
   Zero per-element VPU work: pure DMA-bound. Activations are quantized
   per-row to int8 (the only approximation; weights exact).
2. **P-kernel, w8a16** (decode, exact): same shape but codes are converted
   to bf16 (1 VPU op/element) and P uses the bf16 MXU. Use when activation
   quantization is not acceptable.
3. **VPU kernel, w4a16** (decode, int4): nibble-unpack + dequant on the VPU,
   scale broadcast via a 0/1 expansion matmul (Mosaic cannot reshape or
   repeat along the lane axis). 4x memory at ~bf16-matmul latency.

Prefill (large M) uses XLA dequant + dense matmul (compute-bound there).

4-bit codes pack as byte j = elem[j] | elem[j + K/2] << 4, so the in-kernel
unpack ``concat([lo, hi], axis=1)`` lands in natural column order.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ominix_mlx_tpu.core.quant import QuantizedTensor, dequantize

DECODE_M_MAX = 16   # up to this many rows, use the decode kernels


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedQuantizedTensor:
    """Kernel-ready quantized weight (nibble-packed for 4-bit)."""

    data: jax.Array      # int8 [N, K/2] (bits=4, nibble pairs) or [N, K] (bits=8, centered)
    scales: jax.Array    # [N, G]
    biases: jax.Array    # [N, G] (center offset already folded in)
    group_size: int = dataclasses.field(metadata=dict(static=True), default=64)
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)
    in_features: int = dataclasses.field(metadata=dict(static=True), default=0)
    # 8 = quantize activations to int8 for the pure-int8 MXU path (fastest);
    # None = exact bf16 activations
    act_bits: int | None = dataclasses.field(metadata=dict(static=True),
                                             default=8)

    @property
    def shape(self):
        return (self.data.shape[0], self.in_features)


def prepare(qt: QuantizedTensor, act_bits: int | None = 8) -> PackedQuantizedTensor:
    """One-time load-side conversion QuantizedTensor -> kernel layout."""
    N, K = qt.q.shape
    gs, bits = qt.group_size, qt.bits
    if bits == 4:
        half = K // 2
        lo = (qt.q[:, :half] + 8).astype(jnp.uint8)    # unsigned 0..15
        hi = (qt.q[:, half:] + 8).astype(jnp.uint8)
        data = (lo | (hi << 4)).view(jnp.int8)
    else:
        data = qt.q                                     # centered int8
    return PackedQuantizedTensor(
        data=data, scales=qt.scales, biases=qt.biases,
        group_size=gs, bits=bits, in_features=K, act_bits=act_bits)


def unpack(pqt: PackedQuantizedTensor) -> QuantizedTensor:
    """Inverse of prepare (testing / CPU fallback / prefill dequant)."""
    if pqt.bits == 4:
        b = pqt.data.view(jnp.uint8).astype(jnp.int16)
        lo = (b & 15) - 8
        hi = ((b >> 4) & 15) - 8
        q = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)
    else:
        q = pqt.data
    return QuantizedTensor(q=q, scales=pqt.scales, biases=pqt.biases,
                           group_size=pqt.group_size, bits=pqt.bits)


def gather_rows(pqt: PackedQuantizedTensor, tokens: jax.Array) -> jax.Array:
    """Dequantize only the gathered rows (quantized embedding lookup,
    reference: nn::QuantizedEmbedding). Returns [..., K] bf16."""
    K, gs, bits = pqt.in_features, pqt.group_size, pqt.bits
    G = K // gs
    rows = pqt.data[tokens]                      # [..., Kd] int8
    if bits == 4:
        b = rows.astype(jnp.int32)
        codes = jnp.concatenate([(b & 15) - 8, ((b >> 4) & 15) - 8], axis=-1)
    else:
        codes = rows.astype(jnp.int32)
    s_rows = pqt.scales[tokens].astype(jnp.float32)   # [..., G]
    b_rows = pqt.biases[tokens].astype(jnp.float32)
    grp = jnp.asarray(np.arange(K) // gs, jnp.int32)
    w = (codes.astype(jnp.float32) * jnp.take(s_rows, grp, axis=-1)
         + jnp.take(b_rows, grp, axis=-1))
    return w.astype(jnp.bfloat16)


# ------------------------------------------------ P-kernel (8-bit codes) ----

def _p_kernel(xg_ref, Xg_ref, data_ref, scales_ref, biases_ref, e2_ref,
              rm_ref, out_ref, *, int8_mxu: bool):
    if int8_mxu:
        P = jax.lax.dot_general(
            data_ref[:], Xg_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        P = jax.lax.dot_general(
            data_ref[:].astype(jnp.bfloat16), Xg_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    S = jax.lax.dot_general(
        scales_ref[:].astype(jnp.bfloat16), e2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    T = S * P                                            # [TN, G*M]
    out = jax.lax.dot_general(
        rm_ref[:], T, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [M, TN]
    out = out + jax.lax.dot_general(
        xg_ref[:], biases_ref[:].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("gs", "K", "act8", "out_dtype"))
def _qmm_p8(x, data, scales, biases, gs: int, K: int, act8: bool, out_dtype):
    M = x.shape[0]
    N = data.shape[0]
    G = K // gs
    GM = G * M
    xf = x.astype(jnp.float32)
    xg = jnp.sum(xf.reshape(M, G, gs), -1).astype(jnp.bfloat16)  # exact group sums
    mask = (jnp.arange(K, dtype=jnp.int32)[:, None] // gs
            == jnp.arange(G, dtype=jnp.int32)[None, :])          # [K, G]
    if act8:
        s_x = jnp.max(jnp.abs(xf), axis=1) / 127.0 + 1e-12       # [M]
        cx = jnp.round(xf / s_x[:, None]).astype(jnp.int8)       # [M, K]
        Xg = jnp.where(mask[:, :, None], cx.T[:, None, :], 0)
        Xg = Xg.reshape(K, GM).astype(jnp.int8)
        rm_vals = s_x
    else:
        Xg = jnp.where(mask[:, :, None], x.T.astype(jnp.bfloat16)[:, None, :],
                       jnp.bfloat16(0)).reshape(K, GM)
        rm_vals = jnp.ones((M,), jnp.float32)
    E2 = (jnp.arange(G, dtype=jnp.int32)[:, None]
          == jnp.arange(GM, dtype=jnp.int32)[None, :] // M).astype(jnp.bfloat16)
    Rm = jnp.where(
        (jnp.arange(GM, dtype=jnp.int32)[:, None] % M)
        == jnp.arange(M, dtype=jnp.int32)[None, :],
        rm_vals.astype(jnp.float32)[None, :], 0.0)               # [GM, M]
    TN = 512 if K <= 4096 else 256   # measured best; VMEM-bounded
    while N % TN:
        TN //= 2
    out = pl.pallas_call(
        functools.partial(_p_kernel, int8_mxu=act8),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, G), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, GM), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, G), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, G), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, GM), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GM, M), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * GM, bytes_accessed=N * K + K * GM + M * N * 4,
            transcendentals=0),
    )(xg, Xg, data, scales, biases, E2, Rm)
    return out.astype(out_dtype)


# ------------------------------------------- VPU dequant kernel (4-bit) -----

def _vpu_kernel(x_ref, xg_ref, data_ref, scales_ref, biases_ref, e_ref,
                out_ref, *, bits: int):
    if bits == 4:
        b = data_ref[:].astype(jnp.int32)
        lo = (b & 15) - 8
        hi = ((b >> 4) & 15) - 8
        codes = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)
    else:
        codes = data_ref[:].astype(jnp.bfloat16)
    s_exp = jax.lax.dot_general(
        scales_ref[:].astype(jnp.bfloat16), e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    w = codes * s_exp
    acc = jax.lax.dot_general(
        x_ref[:], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        xg_ref[:], biases_ref[:].astype(xg_ref.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("gs", "bits", "K", "out_dtype"))
def _qmm_vpu(x, data, scales, biases, gs: int, bits: int, K: int, out_dtype):
    M = x.shape[0]
    N, Kd = data.shape
    G = K // gs
    x = x.astype(jnp.bfloat16)
    xg = jnp.sum(x.reshape(M, G, gs).astype(jnp.float32), axis=-1)
    xg = xg.astype(jnp.bfloat16)
    E = (jnp.arange(K, dtype=jnp.int32)[None, :] // gs
         == jnp.arange(G, dtype=jnp.int32)[:, None]).astype(jnp.bfloat16)
    TM = min(256, max(8, M))
    TN = 256 if K <= 4096 else 128
    while N % TN:
        TN //= 2
    Mp = ((M + TM - 1) // TM) * TM
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        xg = jnp.pad(xg, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_vpu_kernel, bits=bits),
        grid=(Mp // TM, N // TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, G), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, Kd), lambda m, n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, G), lambda m, n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, G), lambda m, n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K), lambda m, n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, n: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=N * Kd + Mp * K * 2 + Mp * N * 4 + 2 * N * G * 2,
            transcendentals=0),
    )(x, xg, data, scales, biases, E)
    return out[:M].astype(out_dtype)


# ----------------------------------------------------------- dispatch -------

def supported(pqt: PackedQuantizedTensor) -> bool:
    N, Kd = pqt.data.shape
    K = pqt.in_features
    return (pqt.bits in (4, 8) and K % pqt.group_size == 0
            and Kd % 128 == 0 and N % 128 == 0
            and jax.default_backend() == "tpu")


def quantized_matmul(x: jax.Array, w) -> jax.Array:
    """x [..., K] @ W^T -> [..., N].

    w: PackedQuantizedTensor (Pallas paths on TPU) or QuantizedTensor (XLA
    dequant fallback). Decode-size M routes to the fused kernels; prefill
    dequantizes once and uses the dense MXU path.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if isinstance(w, PackedQuantizedTensor) and supported(w):
        if w.bits == 8 and M <= DECODE_M_MAX:
            y = _qmm_p8(x2, w.data, w.scales, w.biases, w.group_size, K,
                        w.act_bits == 8, x.dtype)
        elif w.bits == 4 and M <= 64:
            y = _qmm_vpu(x2, w.data, w.scales, w.biases,
                         w.group_size, w.bits, K, x.dtype)
        else:
            wd = dequantize(unpack(w), jnp.bfloat16)
            y = jnp.dot(x2.astype(jnp.bfloat16), wd.T,
                        preferred_element_type=x.dtype)
    else:
        if isinstance(w, PackedQuantizedTensor):
            w = unpack(w)
        wd = dequantize(w, x.dtype)
        y = jnp.dot(x2, wd.T, preferred_element_type=x.dtype)
    return y.reshape(*lead, w.shape[0])
