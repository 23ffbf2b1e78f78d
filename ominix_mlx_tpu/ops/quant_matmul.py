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
import os

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
    scales: jax.Array    # [N, G + g_pad]
    biases: jax.Array    # [N, G + g_pad] (center offset already folded in)
    group_size: int = dataclasses.field(metadata=dict(static=True), default=64)
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)
    in_features: int = dataclasses.field(metadata=dict(static=True), default=0)
    # 8 = quantize activations to int8 for the pure-int8 MXU path (fastest);
    # None = exact bf16 activations
    act_bits: int | None = dataclasses.field(metadata=dict(static=True),
                                             default=8)
    # group-axis zero-padding to a 128-lane multiple (large-N weights whose
    # scales stream per chunk inside the kernel; DMA slices must tile-align)
    g_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    # row (out-feature) zero-padding so huge-N weights (lm_head) get a
    # 2048-row panel size instead of whatever tiny divisor N happens to have
    n_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    # route decode M>1 through the dense-dequant dq kernel (serving at
    # batch > 1; prepare(..., batched=True))
    batched: bool = dataclasses.field(metadata=dict(static=True),
                                      default=False)
    # transposed-panel layout (to_panels_t): data is [NCH, Kd, tn] with each
    # [Kd, tn] panel a pre-transposed CONTIGUOUS row-tile of the row-major
    # [N, Kd] matrix. 0 = row-major. The M=1 decode kernel (_qmm_pt) wants
    # this: its matmuls put the 512-wide output-row tile on the MXU lanes
    # instead of the ~40 padded-to-128 group lanes (3-6x less MXU work),
    # while the DMA stays fully contiguous (the round-2 transposed-WHOLE
    # layout lost to strided lane-slice DMA; per-panel pre-transposition
    # removes the stride).
    tn: int = dataclasses.field(metadata=dict(static=True), default=0)
    # padded group rows per scales/biases panel half (bits=4: each K-half's
    # G/2 groups padded to a 32-row multiple so in-kernel sublane slices
    # stay tile-aligned; bits=8: the whole G padded once)
    g2p: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def shape(self):
        if self.tn:
            return (self.data.shape[0] * self.tn - self.n_pad,
                    self.in_features)
        return (self.data.shape[0] - self.n_pad, self.in_features)


def prepare(qt: QuantizedTensor, act_bits: int | None = 8,
            batched: bool = False) -> PackedQuantizedTensor:
    """One-time load-side conversion QuantizedTensor -> kernel layout.

    batched=True marks the tensor for the batched-decode dq kernel at
    M>1 (a dispatch flag only — the data layout is identical row-major
    [N, Kd] panels; an earlier transposed-panel layout lost to it because
    the lane-strided slice of a [Kd, N] array only streams at ~274 GB/s,
    measured round 2)."""
    N, K = qt.q.shape
    gs, bits = qt.group_size, qt.bits
    if bits == 4:
        half = K // 2
        lo = (qt.q[:, :half] + 8).astype(jnp.uint8)    # unsigned 0..15
        hi = (qt.q[:, half:] + 8).astype(jnp.uint8)
        data = (lo | (hi << 4)).view(jnp.int8)
    else:
        data = qt.q                                     # centered int8
    # bf16 scales/biases: the kernels compute S in bf16 anyway, and this
    # halves the side-band stream (and skips a per-call cast of big arrays)
    scales = qt.scales.astype(jnp.bfloat16)
    biases = qt.biases.astype(jnp.bfloat16)
    g_pad = 0
    G = K // gs
    if N > _SB_VMEM_MAX_N and G % 128:
        g_pad = 128 - G % 128
        scales = jnp.pad(scales, ((0, 0), (0, g_pad)))
        biases = jnp.pad(biases, ((0, 0), (0, g_pad)))
    n_pad = 0
    if N > _SB_VMEM_MAX_N and N % 2048:
        n_pad = 2048 - N % 2048
        data = jnp.pad(data, ((0, n_pad), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad), (0, 0)))
        biases = jnp.pad(biases, ((0, n_pad), (0, 0)))
    return PackedQuantizedTensor(
        data=data, scales=scales, biases=biases,
        group_size=gs, bits=bits, in_features=K, act_bits=act_bits,
        g_pad=g_pad, n_pad=n_pad, batched=batched)


def to_panels_t(pqt: PackedQuantizedTensor) -> PackedQuantizedTensor:
    """Re-tile a row-major packed tensor into the transposed-panel layout
    consumed by the M=1 decode kernel (_qmm_pt). One-time load-side cost;
    returns the input unchanged if the shape is ineligible.

    data [N, Kd] -> [NCH, Kd, TN] (each panel transposed in place, HBM
    stream stays contiguous). scales/biases [N, G] -> [NCH, Gs, TN] with
    the group axis split per K-half (bits=4) and padded to 32-row
    multiples; the 4-bit +8-code bias correction (b - 8s) is folded here
    instead of per panel in the kernel."""
    if pqt.tn or pqt.batched:
        return pqt
    N, Kd = pqt.data.shape
    K, gs, bits = pqt.in_features, pqt.group_size, pqt.bits
    G = K // gs
    if bits == 4:
        kc = K // 2
        if kc % 128 or kc % gs or G % 2:
            return pqt
    elif bits != 8 or K % 128:
        return pqt
    TN = _pick_tn(N, Kd)
    if TN < 128:
        return pqt
    NCH = N // TN
    data_t = pqt.data.reshape(NCH, TN, Kd).transpose(0, 2, 1)
    sc = pqt.scales[:, :G]                     # drop row-major g_pad
    bs = pqt.biases[:, :G]
    if bits == 4:
        bs = (bs.astype(jnp.float32)
              - 8.0 * sc.astype(jnp.float32)).astype(jnp.bfloat16)
        G2 = G // 2
        g2p = -(-G2 // 32) * 32
        pad = ((0, 0), (0, g2p - G2))
        sc = jnp.concatenate([jnp.pad(sc[:, :G2], pad),
                              jnp.pad(sc[:, G2:], pad)], axis=1)
        bs = jnp.concatenate([jnp.pad(bs[:, :G2], pad),
                              jnp.pad(bs[:, G2:], pad)], axis=1)
    else:
        g2p = -(-G // 32) * 32
        sc = jnp.pad(sc, ((0, 0), (0, g2p - G)))
        bs = jnp.pad(bs, ((0, 0), (0, g2p - G)))
    Gs = sc.shape[1]
    sc_t = sc.reshape(NCH, TN, Gs).transpose(0, 2, 1)
    bs_t = bs.reshape(NCH, TN, Gs).transpose(0, 2, 1)
    if bits == 4:
        # tn-layout invariant: 4-bit bytes are stored PRE-XORed with 0x80
        # (int8 value = packed byte - 128). The pt kernel's hi-nibble
        # reconstruction needs bx = byte ^ 0x80 as its matmul operand;
        # storing bx directly drops the per-element XOR from the kernel's
        # streamed-data path (2 -> 1 VPU int8 ops/elem, which is the HBM
        # stream rate). Consumers (_pt_kernel, gather_rows, _from_panels_t)
        # all decode this form.
        data_t = data_t ^ jnp.int8(-128)
    return PackedQuantizedTensor(
        data=data_t, scales=sc_t, biases=bs_t, group_size=gs, bits=bits,
        in_features=K, act_bits=pqt.act_bits, g_pad=0, n_pad=pqt.n_pad,
        batched=False, tn=TN, g2p=g2p)


def _dense_tn(x2, w: "PackedQuantizedTensor", out_dtype) -> jax.Array:
    """Dense matmul straight off the transposed-panel layout: dequantize
    each [Kd, TN] panel in place (one XLA elementwise fusion, no transpose
    of the packed bytes) and contract with a batched dot over the panel
    axis. Output [M, NCH*TN] (n_pad garbage rows included -- caller
    slices)."""
    NCH, Kd, TN = w.data.shape
    K, gs, bits = w.in_features, w.group_size, w.bits
    G = K // gs
    b = w.data.astype(jnp.int32)
    if bits == 4:
        hi = ((b >> 4) & 15) ^ 8          # undo the tn pre-XOR on bit 3
        codes = jnp.concatenate([(b & 15) - 8, hi - 8], 1)  # [NCH, K, TN]
        G2 = G // 2
        sc = jnp.concatenate(
            [w.scales[:, :G2], w.scales[:, w.g2p:w.g2p + G2]], 1)
        bs = jnp.concatenate(
            [w.biases[:, :G2], w.biases[:, w.g2p:w.g2p + G2]], 1)
        sc = sc.astype(jnp.float32)
        bs = bs.astype(jnp.float32) + 8.0 * sc      # un-fold b - 8s
    else:
        codes = b
        sc = w.scales[:, :G].astype(jnp.float32)
        bs = w.biases[:, :G].astype(jnp.float32)
    cg = codes.reshape(NCH, G, gs, TN).astype(jnp.float32)
    wd = (cg * sc[:, :, None, :] + bs[:, :, None, :]).astype(jnp.bfloat16)
    y = jnp.einsum("mk,pkt->mpt", x2.astype(jnp.bfloat16),
                   wd.reshape(NCH, K, TN),
                   preferred_element_type=out_dtype)
    return y.reshape(x2.shape[0], NCH * TN)


def _from_panels_t(pqt: PackedQuantizedTensor) -> PackedQuantizedTensor:
    """Inverse re-tiling (CPU fallback / prefill dequant / tests)."""
    NCH, Kd, TN = pqt.data.shape
    N = NCH * TN
    K, gs = pqt.in_features, pqt.group_size
    G = K // gs
    data = pqt.data.transpose(0, 2, 1).reshape(N, Kd)
    if pqt.bits == 4:
        data = data ^ jnp.int8(-128)   # undo the tn-layout pre-XOR
    sc = pqt.scales.transpose(0, 2, 1).reshape(N, -1)
    bs = pqt.biases.transpose(0, 2, 1).reshape(N, -1)
    if pqt.bits == 4:
        G2 = G // 2
        sc = jnp.concatenate([sc[:, :G2], sc[:, pqt.g2p:pqt.g2p + G2]], 1)
        bs = jnp.concatenate([bs[:, :G2], bs[:, pqt.g2p:pqt.g2p + G2]], 1)
        bs = (bs.astype(jnp.float32)
              + 8.0 * sc.astype(jnp.float32)).astype(jnp.bfloat16)
    else:
        sc, bs = sc[:, :G], bs[:, :G]
    return PackedQuantizedTensor(
        data=data, scales=sc, biases=bs, group_size=gs, bits=pqt.bits,
        in_features=K, act_bits=pqt.act_bits, g_pad=0, n_pad=pqt.n_pad,
        batched=False)


def unpack(pqt: PackedQuantizedTensor) -> QuantizedTensor:
    """Inverse of prepare (testing / CPU fallback / prefill dequant)."""
    if pqt.tn:
        pqt = _from_panels_t(pqt)
    if pqt.bits == 4:
        b = pqt.data.view(jnp.uint8).astype(jnp.int16)
        lo = (b & 15) - 8
        hi = ((b >> 4) & 15) - 8
        q = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)
    else:
        q = pqt.data
    G = pqt.in_features // pqt.group_size
    N = pqt.data.shape[0] - pqt.n_pad
    return QuantizedTensor(q=q[:N], scales=pqt.scales[:N, :G],
                           biases=pqt.biases[:N, :G],
                           group_size=pqt.group_size, bits=pqt.bits)


def gather_rows(pqt: PackedQuantizedTensor, tokens: jax.Array) -> jax.Array:
    """Dequantize only the gathered rows (quantized embedding lookup,
    reference: nn::QuantizedEmbedding). Returns [..., K] bf16."""
    K, gs, bits = pqt.in_features, pqt.group_size, pqt.bits
    G = K // gs
    if pqt.tn:
        # transposed-panel layout: row r lives at data[r // tn, :, r % tn]
        p, l = tokens // pqt.tn, tokens % pqt.tn
        if int(np.prod(tokens.shape)) <= 64:
            # decode-size lookups: extract the lane with a one-hot
            # CONTRACTION instead of a lane-axis gather. The gather makes
            # XLA prefer a Kd-minor layout for the table, which conflicts
            # with the Pallas matmul's default layout on the SAME (tied)
            # tensor — measured as a 196MB relayout copy of the whole
            # lm_head INSIDE the decode scan body (693us/token, 14% of the
            # step). The one-hot dot is layout-neutral and reads only the
            # gathered panels (~0.8MB/token).
            # int8 x int8 MXU contraction: exact (|codes| < 128, one-hot
            # rhs), and never materializes a bf16 copy of the 655KB panel
            # (the bf16-cast variant measured 2x 14.7us/token in the r5
            # decode trace -- the single most expensive non-qmm decode op).
            oh = (l[..., None] == jnp.arange(pqt.tn)).astype(jnp.int8)
            dp = pqt.data[p]                           # [..., Kd, TN] int8
            rows = jnp.einsum("...kt,...t->...k", dp, oh,
                              preferred_element_type=jnp.int32)
            ohf = oh.astype(jnp.float32)
            s_rows = jnp.einsum("...gt,...t->...g",
                                pqt.scales[p].astype(jnp.float32), ohf)
            b_rows = jnp.einsum("...gt,...t->...g",
                                pqt.biases[p].astype(jnp.float32), ohf)
        else:
            rows = pqt.data[p, :, l]                 # [..., Kd] int8
            s_rows = pqt.scales[p, :, l].astype(jnp.float32)
            b_rows = pqt.biases[p, :, l].astype(jnp.float32)
        if bits == 4:
            g2 = G // 2
            s_rows = jnp.concatenate(
                [s_rows[..., :g2], s_rows[..., pqt.g2p:pqt.g2p + g2]], -1)
            b_rows = (jnp.concatenate(
                [b_rows[..., :g2], b_rows[..., pqt.g2p:pqt.g2p + g2]], -1)
                + 8.0 * s_rows)                  # un-fold b - 8s
        else:
            s_rows, b_rows = s_rows[..., :G], b_rows[..., :G]
    else:
        rows = pqt.data[tokens]                  # [..., Kd] int8
        s_rows = pqt.scales[tokens].astype(jnp.float32)   # [..., G]
        b_rows = pqt.biases[tokens].astype(jnp.float32)
    if bits == 4:
        b = rows.astype(jnp.int32)
        hi = (b >> 4) & 15
        if pqt.tn:
            hi = hi ^ 8   # tn pre-XOR (byte - 128) flips the hi bit 3
        codes = jnp.concatenate([(b & 15) - 8, hi - 8], axis=-1)
    else:
        codes = rows.astype(jnp.int32)
    # apply per-group scale/bias by [..., G, gs] reshape -- a jnp.take with
    # a K-long index vector lowers to a pred-select chain (measured 14.7us
    # per take per token in the r5 decode trace).
    lead = codes.shape[:-1]
    cg = codes.astype(jnp.float32).reshape(*lead, G, gs)
    w = cg * s_rows[..., None] + b_rows[..., None]
    return w.reshape(*lead, K).astype(jnp.bfloat16)


# ----------------------------------- P-kernel (manual DMA pipeline) ---------
#
# Mosaic's automatic grid pipelining does NOT overlap the weight-panel DMA
# with the in-kernel compute here (measured: DMA-only 19us, +1 matmul 23us,
# full kernel 35us for the Qwen3-4B gate shape — purely additive). The
# production kernel therefore hand-rolls a double-buffered pipeline:
# grid=(), one fori_loop over TN-row panels, pltpu.make_async_copy streaming
# panel i+1 into the spare VMEM slot while panel i computes. Measured:
# 24.5us / 508 GB/s on the gate shape (vs 35.7us auto, 19us DMA floor).
# Small operands (scales/biases/Xg) load whole into VMEM once.

_NBUF = int(os.environ.get("OMINIX_QMM_NBUF", "2"))  # 2 measured best r2
_SB_VMEM_MAX_N = 32768   # above this N, scales/biases stream per chunk
# M=1 path: quantize the activation vector inside the kernel prologue
# (saves the XLA-side abs-max/round/group-sum/Rm ops per projection call).
# Measured on v5e (benchmarks/qmm_bench.py --act-ik, M=1): 4-bit wins big
# (gate 46->35us, down 50->35, qkv 36->27, identical numerics) but 8-bit
# REGRESSES (qkv 18.5->24.7) — the f32 [K, G] prologue pass serializes
# against the first panel's compute while the 8-bit path was already
# DMA-bound. Applied to bits==4 only.
_ACT_IN_KERNEL = True
# 4-bit pt-kernel: reconstruct the hi-nibble partials on the MXU instead of
# the per-element int32 unpack round-trip (see _pt_kernel body). Read once
# here; threaded as a static jit arg so A/B probes can flip it per call.
_UNPACK_I8 = os.environ.get("OMINIX_QMM_UNPACK_I8", "1") == "1"


def _pm_kernel(*refs, bits: int, int8_mxu: bool, m1: bool, split: bool,
               stream_sb: bool, gs: int, K: int, Gp: int, M: int, TN: int,
               NCH: int, act_ik: bool = False):
    """Unified manual-pipeline P-kernel body. Static layout flags decide the
    operand list (see _qmm_p for the matching assembly):

      m1:        M == 1 — Xg is built in-kernel from cxT [K, 1] (saves the
                 3-11us XLA-side block-diagonal build per call) and E2 is
                 the identity (S == scales).
      split:     G > 128 — two half-K matmuls against [K/2, G/2] Xg halves,
                 so the MXU lane padding stays <= 128 groups (down-proj
                 shapes would otherwise pad G=152 -> 256 lanes, doubling
                 MXU passes). scales/biases/xg arrive pre-split.
      stream_sb: N too large for VMEM-resident scales/biases (lm_head) —
                 they stream per chunk alongside the data panel.
    """
    Kc = K // 2                       # contraction length per half (split)
    G2 = (K // gs) // 2               # Gp covers lane padding for stream_sb
    idx = 0
    if m1:
        cxT = refs[0]
        idx = 1
    elif split:
        XgL_ref, XgH_ref = refs[0], refs[1]
        idx = 2
    else:
        XgL_ref = refs[0]
        idx = 1
    xg_lo = xg_hi = rm = None
    if split:
        s_lo, s_hi, b_lo, b_hi = refs[idx:idx + 4]
        idx += 4
        if not act_ik:
            xg_lo, xg_hi = refs[idx:idx + 2]
            idx += 2
    else:
        s_lo, b_lo = refs[idx:idx + 2]
        idx += 2
        if not act_ik:
            xg_lo = refs[idx]
            idx += 1
    if not act_ik:
        rm = refs[idx]
        idx += 1
    if not m1:
        e2 = refs[idx]
        idx += 1
    data = refs[idx]
    out_ref = refs[idx + 1]
    scratch = list(refs[idx + 2:])
    dbuf = scratch.pop(0)
    sems = scratch.pop(0)
    if stream_sb:
        sbuf = scratch.pop(0)
        bbuf = scratch.pop(0)
        sbsems = scratch.pop(0)
    mxu_dt = jnp.int8 if int8_mxu else jnp.bfloat16
    acc_dt = jnp.int32 if int8_mxu else jnp.float32

    # ---- prologue: build the block-diagonal Xg from cxT (M == 1) ----------
    xg_val_lo = xg_val_hi = rm_val = None
    if m1 and act_ik:
        # activation quantization inside the kernel: xT is the RAW bf16
        # vector; abs-max scale, int8 rounding, f32 group sums and the Rm
        # scale column all happen here (one tiny VPU pass instead of 4-5
        # XLA ops + their launches per projection call)
        xf = cxT[:].astype(jnp.float32)                    # [K, 1]
        if int8_mxu:
            sxm = (jnp.max(jnp.abs(xf), axis=0, keepdims=True)
                   / 127.0 + 1e-12)                        # [1, 1]
            cxq = jnp.round(xf / sxm)
        else:
            sxm = jnp.ones((1, 1), jnp.float32)
            cxq = xf

        def build(xq_part, xraw_part, Kpart, Gpart, scratch_ref):
            """Write blockdiag(xq_part) into scratch; return the raw-x f32
            group sums [1, Gpart] (the bias-term operand)."""
            kk = jax.lax.broadcasted_iota(jnp.int32, (Kpart, Gpart), 0) // gs
            gg = jax.lax.broadcasted_iota(jnp.int32, (Kpart, Gpart), 1)
            sel = kk == gg
            xgq = jnp.where(sel, xq_part, 0.0)             # [Kpart, Gpart]
            # f32 -> int32 -> int8 (direct f32->int8 and int8 elementwise
            # arith are illegal in Mosaic)
            scratch_ref[...] = (xgq.astype(jnp.int32).astype(jnp.int8)
                                if int8_mxu else xgq.astype(jnp.bfloat16))
            return jnp.sum(jnp.where(sel, xraw_part, 0.0), axis=0,
                           keepdims=True).astype(jnp.bfloat16)

        if split:
            xgl_s, xgh_s = scratch.pop(0), scratch.pop(0)
            xg_val_lo = build(cxq[:Kc], xf[:Kc], Kc, G2, xgl_s)
            xg_val_hi = build(cxq[Kc:], xf[Kc:], Kc, G2, xgh_s)
        else:
            xg_s = scratch.pop(0)
            xg_val_lo = build(cxq, xf, K, Gp, xg_s)
        rm_val = jnp.broadcast_to(sxm, (G2 if split else Gp, 1)
                                  ).astype(jnp.float32)
    elif m1:
        cx = cxT[:]                                        # [K, 1]
        if split:
            kk = jax.lax.broadcasted_iota(jnp.int32, (Kc, G2), 0) // gs
            gg = jax.lax.broadcasted_iota(jnp.int32, (Kc, G2), 1)
            sel = kk == gg
            xgl_s, xgh_s = scratch.pop(0), scratch.pop(0)
            if int8_mxu:
                xgl_s[...] = jnp.where(sel, cx[:Kc].astype(jnp.int32),
                                       0).astype(jnp.int8)
                xgh_s[...] = jnp.where(sel, cx[Kc:].astype(jnp.int32),
                                       0).astype(jnp.int8)
            else:
                xgl_s[...] = jnp.where(sel, cx[:Kc].astype(jnp.float32),
                                       0.0).astype(jnp.bfloat16)
                xgh_s[...] = jnp.where(sel, cx[Kc:].astype(jnp.float32),
                                       0.0).astype(jnp.bfloat16)
        else:
            kk = jax.lax.broadcasted_iota(jnp.int32, (K, Gp), 0) // gs
            gg = jax.lax.broadcasted_iota(jnp.int32, (K, Gp), 1)
            sel = kk == gg
            xg_s = scratch.pop(0)
            if int8_mxu:
                xg_s[...] = jnp.where(sel, cx.astype(jnp.int32),
                                      0).astype(jnp.int8)
            else:
                xg_s[...] = jnp.where(sel, cx.astype(jnp.float32),
                                      0.0).astype(jnp.bfloat16)

    def dma(slot, i):
        ops = [pltpu.make_async_copy(
            data.at[pl.ds(i * TN, TN)], dbuf.at[slot], sems.at[slot])]
        if stream_sb:
            ops.append(pltpu.make_async_copy(
                s_lo.at[pl.ds(i * TN, TN)], sbuf.at[slot], sbsems.at[slot, 0]))
            ops.append(pltpu.make_async_copy(
                b_lo.at[pl.ds(i * TN, TN)], bbuf.at[slot], sbsems.at[slot, 1]))
        return ops

    for j in range(min(_NBUF - 1, NCH)):
        for op in dma(j, j):
            op.start()

    def body(i, _):
        slot = jax.lax.rem(i, _NBUF)

        @pl.when(i + _NBUF - 1 < NCH)
        def _():
            for op in dma(jax.lax.rem(i + _NBUF - 1, _NBUF), i + _NBUF - 1):
                op.start()

        for op in dma(slot, i):
            op.wait()
        blk = dbuf[slot]
        if bits == 4:
            # unpack ONLY the [TN, K/2] byte panel; the nibble planes feed
            # two MXU matmuls (same total MXU work as one K-contraction,
            # half the HBM stream of the 8-bit path)
            b32 = blk.astype(jnp.int32)
            A = (b32 & 15).astype(mxu_dt)          # w columns 0..K/2-1
            B = ((b32 >> 4) & 15).astype(mxu_dt)   # w columns K/2..K-1
        else:
            A = blk[:, :Kc] if split else blk
            B = blk[:, Kc:] if split else None
            if not int8_mxu:
                A = A.astype(jnp.bfloat16)
                B = B.astype(jnp.bfloat16) if B is not None else None
        if split:
            XgLv = xgl_s[:] if m1 else XgL_ref[:]
            XgHv = xgh_s[:] if m1 else XgH_ref[:]
            P_l = jax.lax.dot_general(A, XgLv, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt
                                      ).astype(jnp.float32)
            P_h = jax.lax.dot_general(B, XgHv, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt
                                      ).astype(jnp.float32)
        else:
            Xgv = xg_s[:] if m1 else XgL_ref[:]
            if bits == 4:
                P = jax.lax.dot_general(A, Xgv[:Kc], (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc_dt)
                P = (P + jax.lax.dot_general(
                    B, Xgv[Kc:], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)).astype(jnp.float32)
            else:
                P = jax.lax.dot_general(A, Xgv, (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc_dt
                                        ).astype(jnp.float32)

        rmv = rm_val if act_ik else rm[:]

        def half(P, s_ref, b_ref, xg, streamed_s=None, streamed_b=None):
            s = (streamed_s if streamed_s is not None
                 else s_ref[pl.ds(i * TN, TN), :]).astype(jnp.bfloat16)
            if m1:  # E2 is the identity at M == 1
                S = s.astype(jnp.float32)
            else:
                S = jax.lax.dot_general(s, e2[:], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(rmv, S * P, (((0,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            b = (streamed_b if streamed_b is not None
                 else b_ref[pl.ds(i * TN, TN), :]).astype(jnp.bfloat16)
            if bits == 4:
                # codes stored as q+8 unsigned: w = s*(u-8)+b -> bias b-8s
                b = b - jnp.bfloat16(8) * s
            return o + jax.lax.dot_general(
                xg, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if split:
            out = (half(P_l, s_lo, b_lo,
                        xg_val_lo if act_ik else xg_lo[:])
                   + half(P_h, s_hi, b_hi,
                          xg_val_hi if act_ik else xg_hi[:]))
        elif stream_sb:
            out = half(P, None, None,
                       xg_val_lo if act_ik else xg_lo[:],
                       sbuf[slot], bbuf[slot])
        else:
            out = half(P, s_lo, b_lo, xg_val_lo if act_ik else xg_lo[:])
        out_ref[:, pl.ds(i * TN, TN)] = out
        return ()

    jax.lax.fori_loop(0, NCH, body, ())


def _qmm_p(x, data, scales, biases, gs: int, K: int, bits: int, act8: bool,
           out_dtype):
    """Fused group-dequant matmul for decode M: x [M,K] @ W^T -> [M,N].

    The group structure rides the MXU: P[n, g*M+m] = sum_{k in g}
    codes[n,k]*x_q[m,k] computed as ``codes @ blockdiag(x_q)`` (int8 MXU
    matmuls), scales applied on the gs-times-smaller [TN, G*M] result.
    Zero per-element dequant work on the VPU beyond the 4-bit nibble
    unpack. See _pm_kernel for the manual DMA pipeline."""
    M = x.shape[0]
    N = data.shape[0]
    G = K // gs
    Gp = scales.shape[1]               # G plus lane padding (stream_sb)
    split = G > 128
    stream_sb = N > _SB_VMEM_MAX_N
    m1 = M == 1
    act_ik = m1 and _ACT_IN_KERNEL and bits == 4
    G2 = G // 2
    Kd = data.shape[1]                 # K (8-bit) or K/2 (nibble-packed)
    mxu_dt = jnp.int8 if act8 else jnp.bfloat16
    if not act_ik:
        xf = x.astype(jnp.float32)
        xg = jnp.sum(xf.reshape(M, G, gs), -1).astype(jnp.bfloat16)
        if act8:
            s_x = jnp.max(jnp.abs(xf), axis=1) / 127.0 + 1e-12   # [M]
            cx = jnp.round(xf / s_x[:, None]).astype(jnp.int8)   # [M, K]
            rm_vals = s_x
        else:
            cx = x.astype(jnp.bfloat16)
            rm_vals = jnp.ones((M,), jnp.float32)
        if Gp > G:                     # pad the activation-side arrays too
            xg = jnp.pad(xg, ((0, 0), (0, Gp - G)))
    Gr = G2 if split else Gp           # groups per matmul half
    if not act_ik:
        Rm = jnp.where(
            (jnp.arange(Gr * M, dtype=jnp.int32)[:, None] % M)
            == jnp.arange(M, dtype=jnp.int32)[None, :],
            rm_vals.astype(jnp.float32)[None, :], 0.0)           # [GrM, M]
    sc = scales.astype(jnp.bfloat16)
    bs = biases.astype(jnp.bfloat16)

    ops = []
    scratch = [pltpu.VMEM((_NBUF, TN_ := _pick_tn(N, Kd), Kd), jnp.int8),
               pltpu.SemaphoreType.DMA((_NBUF,))]
    in_specs = []

    def add(arr, space=pltpu.VMEM):
        ops.append(arr)
        in_specs.append(pl.BlockSpec(memory_space=space))

    if stream_sb:
        scratch += [pltpu.VMEM((_NBUF, TN_, Gp), jnp.bfloat16),
                    pltpu.VMEM((_NBUF, TN_, Gp), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((_NBUF, 2))]
    if act_ik:
        add(x.astype(jnp.bfloat16).T)                # RAW xT [K, 1]
        scratch += ([pltpu.VMEM((K // 2, G2), mxu_dt)] * 2 if split
                    else [pltpu.VMEM((K, Gp), mxu_dt)])
    elif m1:
        add(cx.T)                                    # cxT [K, 1]
        scratch += ([pltpu.VMEM((K // 2, G2), mxu_dt)] * 2 if split
                    else [pltpu.VMEM((K, Gp), mxu_dt)])
    else:
        # block-diagonal Xg built XLA-side for batched decode
        mask = (jnp.arange(K, dtype=jnp.int32)[:, None] // gs
                == jnp.arange(Gp, dtype=jnp.int32)[None, :])     # [K, Gp]
        Xg = jnp.where(mask[:, :, None], cx.T[:, None, :],
                       jnp.zeros((), mxu_dt)).reshape(K, Gp * M).astype(mxu_dt)
        if split:
            add(Xg[:K // 2, :G2 * M])
            add(Xg[K // 2:, G2 * M:])
        else:
            add(Xg)
    if split:
        for arr in (sc[:, :G2], sc[:, G2:], bs[:, :G2], bs[:, G2:]):
            add(arr)
        if not act_ik:
            add(xg[:, :G2])
            add(xg[:, G2:])
    else:
        add(sc, pl.ANY if stream_sb else pltpu.VMEM)
        add(bs, pl.ANY if stream_sb else pltpu.VMEM)
        if not act_ik:
            add(xg)
    if not act_ik:
        add(Rm)
    if not m1:
        E2 = (jnp.arange(Gr, dtype=jnp.int32)[:, None]
              == jnp.arange(Gr * M, dtype=jnp.int32)[None, :] // M
              ).astype(jnp.bfloat16)
        add(E2)
    add(data, pl.ANY)

    TN = TN_
    NCH = N // TN
    kern = functools.partial(
        _pm_kernel, bits=bits, int8_mxu=act8, m1=m1, split=split,
        stream_sb=stream_sb, gs=gs, K=K, Gp=Gp, M=M, TN=TN, NCH=NCH,
        act_ik=act_ik)
    out = pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * Gr * M, bytes_accessed=N * Kd + M * N * 4,
            transcendentals=0),
    )(*ops)
    return out.astype(out_dtype)


# ------------------- transposed-panel M=1 P-kernel (_qmm_pt) ----------------
#
# The row-major P-kernel is COMPUTE-bound at M=1: its per-panel matmul
# [TN, Kc] @ [Kc, G-pad-128] pays 128 output lanes for ~20-76 useful groups
# (0.85us vs the 0.8us DMA), and the 4-bit nibble unpack adds an int32
# VPU round-trip on top — measured 422-440 GB/s vs the w8 kernel's 849.
# This kernel flips the matmul: weights are stored as pre-transposed
# CONTIGUOUS panels [Kd, TN] (to_panels_t), so the group matmul becomes
# [G2p, Kc] @ [Kc, TN] — output lanes = the full 512-row tile, sublane
# padding only to 32 (3-6x less MXU work) — and the DMA pattern is
# unchanged. Everything stays standard-orientation (lhs lanes x rhs
# sublanes; the round-3 Mosaic-stall rule).

def _rms_norm_xla(x, w, eps: float):
    """Same op order as nn.layers.rms_norm (kept local: ops must not import
    nn). Used when a caller passes norm_w but the fused-prologue path
    doesn't apply (prefill M>1, CPU, act-quant disabled)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype) * w


def _pt_kernel(*refs, bits: int, int8_mxu: bool, stream_sb: bool, gs: int,
               K: int, G2p: int, TN: int, NCH: int, act_ik: bool,
               unpack_i8: bool = False, fuse_norm: bool = False,
               eps: float = 1e-6):
    Kc = K // 2 if bits == 4 else K
    idx = 0
    if bits == 4:
        x_lo, x_hi = refs[0], refs[1]          # [1, Kc] (raw bf16 if act_ik)
        idx = 2
        if fuse_norm:
            nw_lo, nw_hi = refs[2], refs[3]    # rmsnorm weight halves, bf16
            idx = 4
    else:
        cx = refs[0]                           # [1, K] quantized (XLA-side)
        idx = 1
    if not act_ik:
        xg = refs[idx]                         # [1, Gs] raw-x group sums
        rm = refs[idx + 1]                     # [1, 1] activation scale
        idx += 2
    scales_t = refs[idx]
    biases_t = refs[idx + 1]
    data = refs[idx + 2]
    out_ref = refs[idx + 3]
    scratch = list(refs[idx + 4:])
    dbuf = scratch.pop(0)
    sems = scratch.pop(0)
    if stream_sb:
        sbuf = scratch.pop(0)
        bbuf = scratch.pop(0)
        sbsems = scratch.pop(0)
    mxu_dt = jnp.int8 if int8_mxu else jnp.bfloat16

    # ---- prologue: blockdiag^T halves + raw-x group sums -------------------
    # sel[g, k] = 1 iff lane k belongs to group row g; both K-halves share
    # it (global group of k+Kc is k//gs + G/2, i.e. local row k//gs again)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G2p, Kc), 1) // gs
    gg = jax.lax.broadcasted_iota(jnp.int32, (G2p, Kc), 0)
    sel = kk == gg
    rm_val = None
    if bits == 4:
        if unpack_i8:
            # single stacked scratch [2*G2p, Kc]: rows 0..G2p-1 = xga, rows
            # G2p.. = xgb. The body's lo-plane matmul then computes xga@A
            # and xgb@A in ONE MXU pass over A (2 rhs streams per panel
            # instead of 3; lhs rows 2*G2p still fit one 128-row tile for
            # model K<=8k shapes).
            xgab_s = scratch.pop(0)
            xga_s = xgab_s.at[pl.ds(0, G2p)]
            xgb_s = xgab_s.at[pl.ds(G2p, G2p)]
        else:
            xga_s, xgb_s = scratch.pop(0), scratch.pop(0)
        if act_ik:
            xlf = x_lo[:].astype(jnp.float32)              # [1, Kc]
            xhf = x_hi[:].astype(jnp.float32)
            if fuse_norm:
                # fused rmsnorm: same op order as nn.layers.rms_norm
                # ((x*inv).astype(bf16) * w, w bf16) so the fused and
                # unfused paths round identically
                inv = jax.lax.rsqrt(
                    (jnp.sum(xlf * xlf) + jnp.sum(xhf * xhf)) / K + eps)
                xlf = ((xlf * inv).astype(jnp.bfloat16)
                       * nw_lo[:]).astype(jnp.float32)
                xhf = ((xhf * inv).astype(jnp.bfloat16)
                       * nw_hi[:]).astype(jnp.float32)
            if int8_mxu:
                mx = jnp.maximum(
                    jnp.max(jnp.abs(xlf), axis=1, keepdims=True),
                    jnp.max(jnp.abs(xhf), axis=1, keepdims=True))  # [1, 1]
                sxm = mx[0, 0] / 127.0 + 1e-12
                cxl, cxh = jnp.round(xlf / sxm), jnp.round(xhf / sxm)
                rm_val = sxm
            else:
                cxl, cxh = xlf, xhf
                rm_val = jnp.float32(1.0)
        else:
            cxl = x_lo[:].astype(jnp.float32)
            cxh = x_hi[:].astype(jnp.float32)
        xga_s[...] = (jnp.where(sel, jnp.broadcast_to(cxl, (G2p, Kc)), 0.0)
                      .astype(jnp.int32).astype(mxu_dt) if int8_mxu else
                      jnp.where(sel, jnp.broadcast_to(cxl, (G2p, Kc)), 0.0)
                      .astype(mxu_dt))
        xgb_s[...] = (jnp.where(sel, jnp.broadcast_to(cxh, (G2p, Kc)), 0.0)
                      .astype(jnp.int32).astype(mxu_dt) if int8_mxu else
                      jnp.where(sel, jnp.broadcast_to(cxh, (G2p, Kc)), 0.0)
                      .astype(mxu_dt))
        if unpack_i8:
            # 128 * rowsum(xgb_s): the constant term of the MXU-side
            # hi-nibble reconstruction (see body). [G2p, 1], broadcast
            # along lanes against each [G2p, TN] panel product.
            rsum_b = jnp.sum(
                xgb_s[:].astype(jnp.int32 if int8_mxu else jnp.float32),
                axis=1, keepdims=True) * (128 if int8_mxu
                                          else jnp.float32(128.0))
        if act_ik:
            # raw-x group sums as ONE [1, 2*G2p] row: xl @ selL + xh @ selH
            # (selL hits columns 0..G2p-1, selH the G2p-offset block)
            cc = jax.lax.broadcasted_iota(jnp.int32, (Kc, 2 * G2p), 1)
            rr = jax.lax.broadcasted_iota(jnp.int32, (Kc, 2 * G2p), 0) // gs
            selL = (cc == rr).astype(jnp.bfloat16)
            selH = (cc == rr + G2p).astype(jnp.bfloat16)
            xg_val = (jax.lax.dot_general(
                xlf.astype(jnp.bfloat16), selL, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    xhf.astype(jnp.bfloat16), selH, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))   # [1, 2*G2p]
        else:
            xg_val = xg[:].astype(jnp.float32)
            rm_val = rm[0, 0]
    else:
        xq_s = scratch.pop(0)
        cxv = cx[:]
        if int8_mxu:
            xq_s[...] = (jnp.where(sel, jnp.broadcast_to(
                cxv.astype(jnp.int32), (G2p, Kc)), 0).astype(jnp.int8))
        else:
            xq_s[...] = jnp.where(sel, jnp.broadcast_to(
                cxv.astype(jnp.float32), (G2p, Kc)), 0.0).astype(mxu_dt)
        xg_val = xg[:].astype(jnp.float32)
        rm_val = rm[0, 0]
    xg_bf = xg_val.astype(jnp.bfloat16)

    def dma(slot, i):
        ops = [pltpu.make_async_copy(data.at[i], dbuf.at[slot],
                                     sems.at[slot])]
        if stream_sb:
            ops.append(pltpu.make_async_copy(
                scales_t.at[i], sbuf.at[slot], sbsems.at[slot, 0]))
            ops.append(pltpu.make_async_copy(
                biases_t.at[i], bbuf.at[slot], sbsems.at[slot, 1]))
        return ops

    for j in range(min(_NBUF - 1, NCH)):
        for op in dma(j, j):
            op.start()

    def body(i, _):
        slot = jax.lax.rem(i, _NBUF)

        @pl.when(i + _NBUF - 1 < NCH)
        def _():
            for op in dma(jax.lax.rem(i + _NBUF - 1, _NBUF), i + _NBUF - 1):
                op.start()

        for op in dma(slot, i):
            op.wait()
        blk = dbuf[slot]                                   # [Kd, TN] int8
        pan_s = (sbuf[slot] if stream_sb else scales_t[i]) # [Gs, TN] bf16
        pan_b = bbuf[slot] if stream_sb else biases_t[i]
        if bits == 4:
            # nibble planes: lo = w columns 0..Kc-1, hi = Kc..K-1 (codes
            # stored +8 unsigned; the -8 is folded into biases_t)
            acc_dt = jnp.int32 if int8_mxu else jnp.float32
            if unpack_i8:
                # MXU-side hi-nibble reconstruction: Mosaic bans shifts on
                # i8/i16 vectors (arith.shrsi fails to legalize), so the hi
                # plane is never materialized. bx = byte XOR 0x80 equals the
                # unsigned packed byte minus 128 = lo + 16*hi - 128, hence
                # xgb @ bx = 16*P_B + P_A' - 128*rowsum(xgb): one extra int8
                # matmul replaces the per-element int32 unpack round-trip.
                # The tn layout stores bx PRE-XORed (to_panels_t), so the
                # streamed panel is the matmul operand as-is and the only
                # per-element VPU work left is the lo-nibble AND (1 int8
                # op/elem = the HBM stream rate).
                bx = blk
                A = bx & jnp.int8(15)
                if not int8_mxu:
                    A = A.astype(mxu_dt)
                    bx = bx.astype(mxu_dt)
                # one stacked pass over A yields xga@A (rows :G2p) and
                # xgb@A (rows G2p:) — 2 rhs streams per panel, not 3
                P_AA = jax.lax.dot_general(
                    xgab_s[:], A, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
                P_A = P_AA[:G2p]
                P_bx = jax.lax.dot_general(
                    xgb_s[:], bx, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
                num = P_bx - P_AA[G2p:] + rsum_b  # = 16 * P_B, exactly
                if int8_mxu:
                    P_B = jax.lax.shift_right_arithmetic(num, 4)
                else:
                    P_B = num * jnp.float32(0.0625)
            else:
                # blk holds byte - 128 (tn pre-XOR): the low nibble is
                # unaffected; the hi nibble comes back with bit 3 flipped
                b32 = blk.astype(jnp.int32)
                A = (b32 & 15).astype(mxu_dt)
                B = (((b32 >> 4) & 15) ^ 8).astype(mxu_dt)
                P_A = jax.lax.dot_general(
                    xga_s[:], A, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
                P_B = jax.lax.dot_general(
                    xgb_s[:], B, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
            SP = (pan_s[:G2p].astype(jnp.float32) * P_A.astype(jnp.float32)
                  + pan_s[G2p:].astype(jnp.float32) * P_B.astype(jnp.float32))
        else:
            acc_dt = jnp.int32 if int8_mxu else jnp.float32
            rhs = blk if int8_mxu else blk.astype(jnp.bfloat16)
            P = jax.lax.dot_general(xq_s[:], rhs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dt)
            SP = pan_s[:].astype(jnp.float32) * P.astype(jnp.float32)
        ones = jnp.ones((1, SP.shape[0]), jnp.float32)
        o = jax.lax.dot_general(ones, SP, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * rm_val
        ob = jax.lax.dot_general(xg_bf, pan_b, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[:, pl.ds(i * TN, TN)] = o + ob
        return ()

    jax.lax.fori_loop(0, NCH, body, ())


def _qmm_pt(x, data, scales, biases, gs: int, K: int, bits: int, act8: bool,
            g2p: int, out_dtype, unpack_i8: bool = False, norm_w=None,
            norm_eps: float = 1e-6):
    """M=1 decode matmul over transposed panels: x [1, K] @ W^T -> [1, N].
    data [NCH, Kd, TN] / scales / biases from to_panels_t.

    norm_w (optional [K] rmsnorm weight): fused into the kernel prologue on
    the act-in-kernel 4-bit path (saves one XLA fusion launch per
    projection at decode — ~4us each, 2-3 per layer); other paths apply it
    XLA-side with identical rounding."""
    NCH, Kd, TN = data.shape
    N = NCH * TN
    Gs = scales.shape[1]
    act_ik = _ACT_IN_KERNEL and bits == 4
    fuse_norm = norm_w is not None and act_ik
    if norm_w is not None and not fuse_norm:
        x = _rms_norm_xla(x, norm_w, norm_eps)
    stream_sb = N > _SB_VMEM_MAX_N
    mxu_dt = jnp.int8 if act8 else jnp.bfloat16

    ops, in_specs = [], []

    def add(arr, space=pltpu.VMEM):
        ops.append(arr)
        in_specs.append(pl.BlockSpec(memory_space=space))

    if bits == 4:
        Kc = K // 2
        xb = x.astype(jnp.bfloat16)
        if act_ik:
            add(xb[:, :Kc])
            add(xb[:, Kc:])
            if fuse_norm:
                nwb = norm_w.astype(jnp.bfloat16).reshape(1, K)
                add(nwb[:, :Kc])
                add(nwb[:, Kc:])
        else:
            xf = x.astype(jnp.float32)
            if act8:
                s_x = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
                cxq = jnp.round(xf / s_x)
            else:
                s_x = jnp.float32(1.0)
                cxq = xf
            add(cxq[:, :Kc].astype(jnp.bfloat16))
            add(cxq[:, Kc:].astype(jnp.bfloat16))
    else:
        xf = x.astype(jnp.float32)
        if act8:
            s_x = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
            add(jnp.round(xf / s_x).astype(jnp.int8))
        else:
            s_x = jnp.float32(1.0)
            add(x.astype(jnp.bfloat16))
    if not act_ik:
        # raw-x group sums, laid out to match the scales/biases panel rows
        G = K // gs
        xg = jnp.sum(x.astype(jnp.float32).reshape(1, G, gs), -1)
        if bits == 4:
            G2 = G // 2
            pad = ((0, 0), (0, g2p - G2))
            xg = jnp.concatenate([jnp.pad(xg[:, :G2], pad),
                                  jnp.pad(xg[:, G2:], pad)], axis=1)
        else:
            xg = jnp.pad(xg, ((0, 0), (0, Gs - G)))
        add(xg.astype(jnp.bfloat16))
        add(jnp.full((1, 1), s_x, jnp.float32))
    sb_space = pl.ANY if stream_sb else pltpu.VMEM
    add(scales, sb_space)
    add(biases, sb_space)
    add(data, pl.ANY)

    scratch = [pltpu.VMEM((_NBUF, Kd, TN), jnp.int8),
               pltpu.SemaphoreType.DMA((_NBUF,))]
    if stream_sb:
        scratch += [pltpu.VMEM((_NBUF, Gs, TN), jnp.bfloat16),
                    pltpu.VMEM((_NBUF, Gs, TN), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((_NBUF, 2))]
    if bits == 4:
        if unpack_i8:
            # stacked [xga; xgb] scratch — one lo-plane MXU pass (kernel)
            scratch += [pltpu.VMEM((2 * g2p, K // 2), mxu_dt)]
        else:
            scratch += [pltpu.VMEM((g2p, K // 2), mxu_dt)] * 2
    else:
        scratch += [pltpu.VMEM((Gs, K), mxu_dt)]

    kern = functools.partial(
        _pt_kernel, bits=bits, int8_mxu=act8, stream_sb=stream_sb, gs=gs,
        K=K, G2p=g2p, TN=TN, NCH=NCH, act_ik=act_ik,
        unpack_i8=unpack_i8 and bits == 4, fuse_norm=fuse_norm,
        eps=norm_eps)
    out = pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * Gs // (2 if bits == 4 else 1),
            bytes_accessed=NCH * Kd * TN + N * 4, transcendentals=0),
    )(*ops)
    return out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("gs", "K", "bits", "act8", "g2p",
                                    "out_dtype", "unpack_i8", "norm_eps"))
def _qmm_pt_jit(x, data, scales, biases, gs, K, bits, act8, g2p, out_dtype,
                unpack_i8=False, norm_w=None, norm_eps=1e-6):
    return _qmm_pt(x, data, scales, biases, gs, K, bits, act8, g2p,
                   out_dtype, unpack_i8, norm_w, norm_eps)


# -------------------------- dq kernel (batched decode, M > 1) ---------------
#
# The P-kernel's MXU work scales with G*M output lanes, so it loses to bf16
# past M~2-4. The dq kernel instead DEQUANTIZES each weight panel in-kernel
# and runs a DENSE bf16 matmul: per-panel cost is one scale-expansion
# matmul (s_panel [TN, G] @ one-hot [G, K] — Mosaic cannot broadcast along
# lanes) plus an M-column dense pass, both M-independent in panel count.
# Same row-major [N, Kd] panels and hand-rolled DMA pipeline as the
# P-kernel; every matmul is standard-orientation (contraction = lhs lanes
# x rhs sublanes); the output is [N, M] and transposed XLA-side.
# Activations stay exact bf16 (w4a16/w8a16 — no a8 approximation).


def _dq_kernel(xT, xgT, scales, biases, R_lo, R_hi, data, out_ref, *scratch,
               bits: int, gs: int, K: int, Gp: int, M: int,
               TN: int, NCH: int, stream_sb: bool):
    Kc = K // 2
    scratch = list(scratch)
    dbuf = scratch.pop(0)
    sems = scratch.pop(0)
    if stream_sb:
        # huge-N weights (lm_head): scales/biases don't fit VMEM whole —
        # stream their row panels alongside the data panel (same pattern
        # as the P-kernel's stream_sb; Gp is 128-lane padded at prepare()
        # so the DMA slices stay tile-aligned)
        sbuf = scratch.pop(0)
        bbuf = scratch.pop(0)
        sbsems = scratch.pop(0)

    def dma(slot, i):
        ops = [pltpu.make_async_copy(
            data.at[pl.ds(i * TN, TN)], dbuf.at[slot], sems.at[slot])]
        if stream_sb:
            ops.append(pltpu.make_async_copy(
                scales.at[pl.ds(i * TN, TN)], sbuf.at[slot],
                sbsems.at[slot, 0]))
            ops.append(pltpu.make_async_copy(
                biases.at[pl.ds(i * TN, TN)], bbuf.at[slot],
                sbsems.at[slot, 1]))
        return ops

    for j in range(min(_NBUF - 1, NCH)):
        for op in dma(j, j):
            op.start()

    xT_lo = xT[:Kc].astype(jnp.bfloat16)      # [Kc, M]
    xT_hi = xT[Kc:].astype(jnp.bfloat16)

    def body(i, _):
        slot = jax.lax.rem(i, _NBUF)

        @pl.when(i + _NBUF - 1 < NCH)
        def _():
            for op in dma(jax.lax.rem(i + _NBUF - 1, _NBUF), i + _NBUF - 1):
                op.start()

        for op in dma(slot, i):
            op.wait()
        s_panel = (sbuf[slot] if stream_sb
                   else scales[pl.ds(i * TN, TN), :])     # [TN, Gp]

        def S(R_half):                                    # -> [TN, Kc] bf16
            return jax.lax.dot_general(
                s_panel, R_half[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        blk = dbuf[slot]                                  # [TN, Kd] int8
        if bits == 4:
            b32 = blk.astype(jnp.int32)
            lo = ((b32 & 15) - 8).astype(jnp.bfloat16)    # cols 0..Kc-1
            hi = (((b32 >> 4) & 15) - 8).astype(jnp.bfloat16)
        else:
            lo = blk[:, :Kc].astype(jnp.bfloat16)
            hi = blk[:, Kc:].astype(jnp.bfloat16)
        Y = jax.lax.dot_general(
            lo * S(R_lo), xT_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TN, M]
        Y = Y + jax.lax.dot_general(
            hi * S(R_hi), xT_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b_panel = (bbuf[slot] if stream_sb
                   else biases[pl.ds(i * TN, TN), :])     # [TN, Gp]
        Y = Y + jax.lax.dot_general(
            b_panel.astype(jnp.bfloat16), xgT[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(i * TN, TN), :] = Y
        return ()

    jax.lax.fori_loop(0, NCH, body, ())


def _qmm_dq(x, data, scales, biases, gs: int, K: int, bits: int, out_dtype):
    """Batched decode x [M, K] @ W^T -> [M, N] via the dq kernel (exact
    bf16 activations; M padded to 8)."""
    M = x.shape[0]
    N = data.shape[0]
    G = K // gs
    Gp = scales.shape[1]
    Kc = K // 2
    Mp = max(8, -(-M // 8) * 8)
    xf = x.astype(jnp.float32)
    if Mp > M:
        xf = jnp.pad(xf, ((0, Mp - M), (0, 0)))
    xg = jnp.sum(xf.reshape(Mp, G, gs), -1)
    if Gp > G:
        xg = jnp.pad(xg, ((0, 0), (0, Gp - G)))
    if bits == 4:
        # stored as q+8 unsigned, kernel subtracts 8 after unpack -> bias
        # applies unchanged; 8-bit codes are already centered
        pass
    # one-hot expansion matrices for the two column halves: R_lo[g, k] = 1
    # iff column k of the LO half belongs to group g (k in [0, Kc))
    gidx = jax.lax.broadcasted_iota(jnp.int32, (Gp, Kc), 0)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (Gp, Kc), 1)
    R_lo = (gidx == kcol // gs).astype(jnp.bfloat16)
    R_hi = (gidx == (kcol + Kc) // gs).astype(jnp.bfloat16)
    TN = _pick_tn(N, data.shape[1])
    NCH = N // TN
    stream_sb = N > _SB_VMEM_MAX_N
    kern = functools.partial(
        _dq_kernel, bits=bits, gs=gs, K=K, Gp=Gp, M=Mp, TN=TN, NCH=NCH,
        stream_sb=stream_sb)
    sb_space = pl.ANY if stream_sb else pltpu.VMEM
    scratch = [pltpu.VMEM((_NBUF, TN, data.shape[1]), jnp.int8),
               pltpu.SemaphoreType.DMA((_NBUF,))]
    if stream_sb:
        scratch += [pltpu.VMEM((_NBUF, TN, Gp), jnp.bfloat16),
                    pltpu.VMEM((_NBUF, TN, Gp), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((_NBUF, 2))]
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=sb_space)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Mp), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * (G + Mp),
            bytes_accessed=N * data.shape[1] + Mp * N * 4,
            transcendentals=0),
    )(xf.astype(jnp.bfloat16).T, xg.astype(jnp.bfloat16).T, scales, biases,
      R_lo, R_hi, data)
    return out.T[:M].astype(out_dtype)


def _pick_tn(N: int, Kd: int = 0) -> int:
    """Panel row count. Measured (v5e, r4 sweep): TN=512 best for small-N
    (qkv/o/down — 256 regressed ~20%, per-panel overhead) and for huge-N
    (lm_head — 1024/2048 regressed 5-10%); TN=1024 wins ~4% on mid-N
    gateup-class shapes (fewer per-panel fixed costs, panels still small
    enough not to disturb the VMEM working set). OMINIX_QMM_TN overrides
    for probes (layout is prepare-time, so set before quantize_params)."""
    env = os.environ.get("OMINIX_QMM_TN")
    TN = int(env) if env else (1024 if 8192 <= N <= _SB_VMEM_MAX_N else 512)
    while N % TN:
        TN //= 2
    return TN


@functools.partial(jax.jit, static_argnames=("gs", "K", "act8", "out_dtype"))
def _qmm_p8(x, data, scales, biases, gs: int, K: int, act8: bool, out_dtype):
    return _qmm_p(x, data, scales, biases, gs, K, 8, act8, out_dtype)


@functools.partial(jax.jit, static_argnames=("gs", "K", "act8", "out_dtype"))
def _qmm_p4(x, data, scales, biases, gs: int, K: int, act8: bool, out_dtype):
    """4-bit decode matmul via the manual-pipeline P-kernel.

    data: [N, K/2] packed bytes (prepare() layout: byte j = elem[j] |
    elem[j + K/2] << 4, both nibbles stored as code+8 unsigned)."""
    return _qmm_p(x, data, scales, biases, gs, K, 4, act8, out_dtype)


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


def _p_shape_ok(N: int, K: int, gs: int) -> bool:
    """Shape constraints of the manual-pipeline P-kernel (_qmm_p)."""
    G = K // gs
    if G > 128:
        # split variant: half-K matmuls need 128-aligned half panels and
        # <= 128 groups per half; scales stay VMEM-resident (split arrays)
        return (K % (2 * gs) == 0 and (K // 2) % 128 == 0 and G <= 256
                and N <= _SB_VMEM_MAX_N)
    return True


def quantized_matmul(x: jax.Array, w, norm_w=None,
                     norm_eps: float = 1e-6) -> jax.Array:
    """x [..., K] @ W^T -> [..., N].

    w: PackedQuantizedTensor (Pallas paths on TPU) or QuantizedTensor (XLA
    dequant fallback). Decode-size M routes to the fused kernels; prefill
    dequantizes once and uses the dense MXU path.

    norm_w (optional [K]): rmsnorm the activation first — fused into the
    pt-kernel prologue at M=1 (one fewer XLA launch per projection per
    decode step), applied XLA-side with identical op order everywhere else.
    """
    if norm_w is not None and not (isinstance(w, PackedQuantizedTensor)
                                   and w.tn):
        x = _rms_norm_xla(x, norm_w, norm_eps)
        norm_w = None
    if isinstance(w, ChannelQuantizedTensor):
        return channel_matmul(x, w)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if isinstance(w, PackedQuantizedTensor) and w.tn:
        # transposed-panel layout (to_panels_t): M=1 decode rides _qmm_pt;
        # decode-size M>1 (speculative verify) reconstructs the row-major
        # PACKED view (int8 transpose+XOR only — never the bf16 weights,
        # which would be ~4x the bytes) and rides the dq kernel; prefill /
        # CPU reconstruct and go dense.
        N_out = w.data.shape[0] * w.tn - w.n_pad
        if M == 1 and jax.default_backend() == "tpu":
            y = _qmm_pt_jit(x2, w.data, w.scales, w.biases, w.group_size,
                            K, w.bits, w.act_bits == 8, w.g2p, x.dtype,
                            unpack_i8=_UNPACK_I8, norm_w=norm_w,
                            norm_eps=norm_eps)
        elif 1 < M <= DECODE_M_MAX and jax.default_backend() == "tpu" \
                and (w.bits != 4 or K % 2 == 0):
            if norm_w is not None:
                x2 = _rms_norm_xla(x2, norm_w, norm_eps)
            wr = _from_panels_t(w)
            sc, bs = wr.scales, wr.biases
            N_all = wr.data.shape[0]
            G = K // w.group_size
            if N_all > _SB_VMEM_MAX_N and G % 128:
                pad = ((0, 0), (0, 128 - G % 128))
                sc, bs = jnp.pad(sc, pad), jnp.pad(bs, pad)
            y = _qmm_dq(x2, wr.data, sc, bs, w.group_size, K, w.bits,
                        x.dtype)
        else:
            # prefill: per-panel dequant + batched dot straight off the tn
            # layout. Reconstructing the row-major view here (unpack ->
            # dequantize -> dot) costs pure layout copies -- measured
            # ~60ms per 128-token w4 prefill in the r5 decode trace (two
            # 196MB s8 transposes for the tied embed/lm_head alone).
            if norm_w is not None:
                x2 = _rms_norm_xla(x2, norm_w, norm_eps)
            y = _dense_tn(x2, w, x.dtype)
        return y[:, :N_out].reshape(*lead, N_out)
    if isinstance(w, PackedQuantizedTensor) and supported(w):
        N = w.data.shape[0]
        p_ok = _p_shape_ok(N, K, w.group_size)
        if 1 < M <= DECODE_M_MAX and N % 128 == 0 and K % 2 == 0 \
                and w.batched:
            # batched decode: dense-dequant dq kernel (M-independent MXU
            # cost; the P-kernel's G*M lanes lose past M~2). Huge-N
            # weights (lm_head) stream scales/biases per panel; n_pad
            # rows compute garbage that the [:N_out] slice drops.
            y = _qmm_dq(x2, w.data, w.scales, w.biases, w.group_size, K,
                        w.bits, x.dtype)
        elif w.bits == 8 and M <= DECODE_M_MAX and p_ok:
            y = _qmm_p8(x2, w.data, w.scales, w.biases, w.group_size, K,
                        w.act_bits == 8, x.dtype)
        elif w.bits == 4 and M <= DECODE_M_MAX and w.act_bits == 8 and p_ok:
            y = _qmm_p4(x2, w.data, w.scales, w.biases, w.group_size, K,
                        True, x.dtype)
        elif w.bits == 4 and M <= 64 and w.g_pad == 0 and w.n_pad == 0:
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
    N_out = w.shape[0] if not isinstance(w, PackedQuantizedTensor) \
        else w.data.shape[0] - w.n_pad
    return y[:, :N_out].reshape(*lead, N_out)

# ------------------------------------- channelwise w8a8 (batched serving) ---
#
# Group-quantized decode cannot beat bf16 at batch M>=4 on v5e: the group
# dequant costs either ~5 VPU ops per weight element (dq kernel) or G*M MXU
# output lanes (P-kernel), eating the 4x/2x HBM-stream advantage (measured
# round 3: gateup M=8 dq=172us P=86us vs bf16 ~142us wall). Per-OUTPUT-
# CHANNEL symmetric int8 removes the group structure entirely: the matmul
# is a PURE int8 MXU contraction (XLA-native, no Pallas) plus a rank-1
# rescale that XLA fuses. Measured v5e M=8: down-proj 839 GB/s (speed of
# light), lm_head 683 GB/s — half bf16's bytes at full stream rate.
# This scheme has no reference counterpart (the reference is group-quant
# only, mlx-rs/src/ops/quantization.rs); it is the standard w8a8 dynamic-
# activation serving scheme on MXU-class hardware.


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChannelQuantizedTensor:
    """Per-output-channel symmetric int8 weight: w[n, k] ~ data[n, k] *
    scale[n]. Used for batched serving (w8a8); activations are quantized
    per token at runtime (dynamic symmetric int8)."""

    data: jax.Array   # int8 [N, K]
    scale: jax.Array  # f32 [N]

    @property
    def shape(self):
        return self.data.shape


def channel_quantize(w: jax.Array) -> ChannelQuantizedTensor:
    """bf16/f32 [N, K] -> per-row symmetric int8."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=1) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(wf / s[:, None]), -127, 127).astype(jnp.int8)
    return ChannelQuantizedTensor(data=q, scale=s)


def channel_dequantize(w: ChannelQuantizedTensor, dtype=jnp.bfloat16):
    return (w.data.astype(jnp.float32) * w.scale[:, None]).astype(dtype)


def channel_matmul(x: jax.Array, w: ChannelQuantizedTensor) -> jax.Array:
    """x [..., K] @ W^T -> [..., N] with dynamic per-token int8 activations.
    Valid at any M (decode and prefill): int8 MXU runs at 2x bf16 rate."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    xf = x.reshape(-1, K).astype(jnp.float32)
    xq, sx = quantize_act_channel(xf)
    acc = jax.lax.dot_general(xq, w.data, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)   # [M, N]
    y = acc.astype(jnp.float32) * sx[:, None] * w.scale[None, :]
    return y.astype(x.dtype).reshape(*lead, w.data.shape[0])


def channel_gather_rows(w: ChannelQuantizedTensor,
                        tokens: jax.Array) -> jax.Array:
    """Embedding lookup on a channel-quantized table."""
    rows = w.data[tokens].astype(jnp.float32)
    return (rows * w.scale[tokens][..., None]).astype(jnp.bfloat16)


def quantize_act_channel(xf: jax.Array):
    """Dynamic per-row symmetric int8 activation quantization.

    xf [..., K] float32 -> (int8 codes [..., K], scale [...]). Shared by
    channel_matmul and the MoE channelwise paths so activations are
    quantized ONCE per layer invocation, not once per expert."""
    sx = jnp.max(jnp.abs(xf), axis=-1) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / sx[..., None]), -127, 127).astype(jnp.int8)
    return xq, sx


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChannelQuantizedExperts:
    """Stacked per-expert channelwise-int8 weights (w8a8 MoE). Same scheme
    as ChannelQuantizedTensor, batched over the expert axis: w[e, n, k] ~
    data[e, n, k] * scale[e, n]. The batched-serving quantization for MoE
    models (reference ships group-quant MoE only — QuantizedSwitchLinear,
    qwen3-mlx/src/qwen3_moe.rs:304-425; channelwise is the MXU-native
    w8a8 serving variant, see the channelwise section header above)."""

    data: jax.Array   # int8 [E, N, K]
    scale: jax.Array  # f32 [E, N]

    @property
    def shape(self):
        return self.data.shape


def channel_quantize_experts(w: jax.Array) -> ChannelQuantizedExperts:
    """bf16/f32 stacked experts [E, N, K] -> per-(expert, row) int8."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(wf / s[..., None]), -127, 127).astype(jnp.int8)
    return ChannelQuantizedExperts(data=q, scale=s)


def channel_dequantize_expert(w: ChannelQuantizedExperts, e,
                              dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize ONE expert slab [N, K] (prefill scan path)."""
    data = jax.lax.dynamic_index_in_dim(w.data, e, 0, keepdims=False)
    s = jax.lax.dynamic_index_in_dim(w.scale, e, 0, keepdims=False)
    return (data.astype(jnp.float32) * s[:, None]).astype(dtype)


def channel_expert_matmul_q(xq: jax.Array, sx: jax.Array,
                            w: ChannelQuantizedExperts, e) -> jax.Array:
    """Pre-quantized activations against ONE expert: int8 MXU dot + rank-1
    rescale. xq [M, K] int8, sx [M] -> f32 [M, N]. Used inside the prefill
    all-expert scan (activations quantized once outside the scan)."""
    data = jax.lax.dynamic_index_in_dim(w.data, e, 0, keepdims=False)
    s = jax.lax.dynamic_index_in_dim(w.scale, e, 0, keepdims=False)
    acc = jax.lax.dot_general(xq, data, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx[:, None] * s[None, :]


def channel_gather_qmm(x: jax.Array, w: ChannelQuantizedExperts,
                       ids: jax.Array) -> jax.Array:
    """Decode-path expert-gathered w8a8 matmul: x [T, K], ids [T, k] ->
    f32 [T, k, N]. The int8 gather IS the HBM traffic (half of bf16); the
    contraction is a batched int8 MXU dot (reference gather_qmm semantics,
    mlx-rs/src/ops/quantization.rs:186-226, at the channelwise scheme)."""
    xq, sx = quantize_act_channel(x.astype(jnp.float32))
    wq = w.data[ids]                                  # [T, k, N, K] int8
    acc = jnp.einsum("td,tknd->tkn", xq, wq,
                     preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx[:, None, None] * w.scale[ids]


# ------------------------------------------ MoE expert weights (gather_qmm) --

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedQuantizedExperts:
    """Stacked per-expert quantized weights [E, N, K] in kernel layout
    (reference: QuantizedSwitchLinear + gather_qmm,
    qwen3-mlx/src/qwen3_moe.rs:304-425, mlx-rs/src/ops/quantization.rs:186).
    """

    data: jax.Array      # int8 [E, N, K/2] (bits=4) or [E, N, K] (bits=8)
    scales: jax.Array    # bf16 [E, N, G]
    biases: jax.Array    # bf16 [E, N, G]
    group_size: int = dataclasses.field(metadata=dict(static=True), default=64)
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)
    in_features: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def shape(self):
        return (self.data.shape[0], self.data.shape[1], self.in_features)


def quantize_experts(w: jax.Array, group_size: int = 64,
                     bits: int = 4) -> PackedQuantizedExperts:
    """Quantize stacked expert weights [E, N, K] (load-time)."""
    from ominix_mlx_tpu.core.quant import quantize_tensor

    qts = [prepare(quantize_tensor(w[e].astype(jnp.float32), group_size,
                                   bits))
           for e in range(w.shape[0])]
    return PackedQuantizedExperts(
        data=jnp.stack([q.data for q in qts]),
        scales=jnp.stack([q.scales for q in qts]),
        biases=jnp.stack([q.biases for q in qts]),
        group_size=group_size, bits=bits, in_features=w.shape[-1])


def experts_from_quantized(qts: list) -> PackedQuantizedExperts:
    """Stack per-expert QuantizedTensors (from a checkpoint) into the
    gather_qmm layout."""
    pts = [prepare(q) if isinstance(q, QuantizedTensor) else q for q in qts]
    return PackedQuantizedExperts(
        data=jnp.stack([p.data for p in pts]),
        scales=jnp.stack([p.scales for p in pts]),
        biases=jnp.stack([p.biases for p in pts]),
        group_size=pts[0].group_size, bits=pts[0].bits,
        in_features=pts[0].in_features)


def dequantize_expert(pqe: PackedQuantizedExperts, e) -> jax.Array:
    """Dequantize ONE expert slab to bf16 [N, K] (prefill scan path)."""
    data = jax.lax.dynamic_index_in_dim(pqe.data, e, 0, keepdims=False)
    if pqe.bits == 4:
        b = data.astype(jnp.int32)
        codes = jnp.concatenate([(b & 15) - 8, ((b >> 4) & 15) - 8], axis=-1)
    else:
        codes = data.astype(jnp.int32)
    N = data.shape[0]
    G = pqe.in_features // pqe.group_size
    s = jax.lax.dynamic_index_in_dim(pqe.scales, e, 0, False).astype(jnp.float32)
    bi = jax.lax.dynamic_index_in_dim(pqe.biases, e, 0, False).astype(jnp.float32)
    w = (codes.astype(jnp.float32).reshape(N, G, pqe.group_size)
         * s[..., None] + bi[..., None])
    if pqe.bits == 4:
        # codes were stored centered via the concat above only for bits=8;
        # 4-bit nibbles come back centered already (see unpack())
        pass
    return w.reshape(N, pqe.in_features).astype(jnp.bfloat16)


def _gq_kernel(ids_ref, cxT_ref, xg_ref, rm_ref, ssel_ref, bsel_ref,
               data_hbm, out_ref, dbuf, dsems, xg_s, *,
               bits: int, gs: int, K: int, k: int, N: int):
    """Decode-step gather_qmm: ONE token, k selected experts, streaming only
    their weight slabs. Expert ids come from SMEM; each expert's data slab
    ([N, Kd], ~0.5MB at MoE shapes) is DMA'd WHOLE, double-buffered at the
    expert level — sub-slab panels would need a dynamic-LANE output store,
    which Mosaic rejects ("dynamic store with unaligned indices"); whole
    slabs keep every lane index static and the per-expert store is the
    proven dynamic-leading-index pattern (ops/paged_attention.py:206).
    The selected experts' scales/biases are XLA-gathered OUTSIDE the kernel
    and arrive as whole-VMEM 2-D inputs [k*N, G]: a [E, N, G] side-band
    cannot be DMA- or load-sliced per expert because its G-lane minor dim
    is not 128-aligned once tiled (Mosaic memref_slice check; CLAUDE.md
    round-2 DMA fact)."""
    Kc = K // 2
    G = K // gs

    # block-diagonal Xg from the token's quantized activations (as _pm_kernel)
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, G), 0) // gs
    gg = jax.lax.broadcasted_iota(jnp.int32, (K, G), 1)
    xg_s[...] = jnp.where(kk == gg, cxT_ref[:].astype(jnp.int32),
                          0).astype(jnp.int8)

    def dma_data(slot, j):
        e = ids_ref[0, j]
        return pltpu.make_async_copy(
            data_hbm.at[e], dbuf.at[slot], dsems.at[slot])

    dma_data(0, 0).start()

    def body(j, _):
        slot = jax.lax.rem(j, _NBUF)

        @pl.when(j + 1 < k)
        def _():
            dma_data(jax.lax.rem(j + 1, _NBUF), j + 1).start()

        dma_data(slot, j).wait()

        blk = dbuf[slot]
        if bits == 4:
            b32 = blk.astype(jnp.int32)
            A = (b32 & 15).astype(jnp.int8)
            B = ((b32 >> 4) & 15).astype(jnp.int8)
            P = jax.lax.dot_general(A, xg_s[:Kc], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            P = (P + jax.lax.dot_general(
                B, xg_s[Kc:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)).astype(jnp.float32)
        else:
            P = jax.lax.dot_general(blk, xg_s[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32)
        s = ssel_ref[pl.ds(j * N, N), :]
        o = jax.lax.dot_general(rm_ref[:], s.astype(jnp.float32) * P,
                                (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [1, N]
        b = bsel_ref[pl.ds(j * N, N), :]
        if bits == 4:
            b = b - jnp.bfloat16(8) * s
        o = o + jax.lax.dot_general(xg_ref[:], b, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        out_ref[j] = o[0]
        return ()

    jax.lax.fori_loop(0, k, body, ())


@functools.partial(jax.jit, static_argnames=("gs", "K", "bits"))
def _gather_qmm_decode(x, ids, data, scales, biases, gs: int, K: int,
                       bits: int):
    """x [1, K], ids [1, k] -> [k, N] f32 (one output row per expert)."""
    E, N, Kd = data.shape
    k = ids.shape[1]
    G = K // gs
    xf = x.astype(jnp.float32)
    xg = jnp.sum(xf.reshape(1, G, gs), -1).astype(jnp.bfloat16)
    s_x = jnp.max(jnp.abs(xf), axis=1) / 127.0 + 1e-12
    cx = jnp.round(xf / s_x[:, None]).astype(jnp.int8)
    Rm = s_x.astype(jnp.float32).reshape(1, 1) * jnp.ones((G, 1), jnp.float32)
    # XLA-gather the k selected experts' side bands (tiny: k*N*G bf16) and
    # flatten to 2-D so the kernel slices them with the proven sublane-ds
    # pattern; a 3-D [E, N, G] ref cannot be sliced per expert (unaligned
    # G-lane minor dim, see _gq_kernel docstring)
    ssel = scales[ids[0]].reshape(k * N, G).astype(jnp.bfloat16)
    bsel = biases[ids[0]].reshape(k * N, G).astype(jnp.bfloat16)
    kern = functools.partial(_gq_kernel, bits=bits, gs=gs, K=K, k=k, N=N)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ids [1, k]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cxT [K, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xg [1, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Rm [G, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ssel [k*N, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bsel [k*N, G]
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # data
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, N, Kd), jnp.int8),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.VMEM((K, G), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * N * K * G, bytes_accessed=k * N * Kd + k * N * 4,
            transcendentals=0),
    )(ids, cx.T, xg, Rm, ssel, bsel, data)
    return out


def gather_qmm(x: jax.Array, w: PackedQuantizedExperts,
               ids: jax.Array) -> jax.Array:
    """Per-token expert-gathered quantized matmul (reference ``gather_qmm``,
    mlx-rs/src/ops/quantization.rs:186-226).

    x [T, K], ids [T, k] -> [T, k, N]. On TPU decode (T small) this streams
    ONLY the selected experts' slabs from HBM via the Pallas kernel; the
    fallback dequantizes gathered rows (CPU/tests).
    """
    T, K = x.shape
    k = ids.shape[1]
    E, N, Kd = w.data.shape
    G = K // w.group_size
    kernel_ok = (jax.default_backend() == "tpu" and w.bits in (4, 8)
                 and G <= 128 and Kd % 128 == 0 and N % 128 == 0
                 and K % (2 * w.group_size) == 0
                 # whole-slab DMA (see _gq_kernel): bound the double buffer
                 and _NBUF * N * Kd <= 8 * 1024 * 1024)
    if kernel_ok:
        def per_token(xi_idsi):
            xi, idsi = xi_idsi
            return _gather_qmm_decode(xi[None], idsi[None], w.data, w.scales,
                                      w.biases, w.group_size, K, w.bits)
        if T == 1:
            out = per_token((x[0], ids[0]))[None]
        else:
            out = jax.lax.map(per_token, (x, ids))
        return out.astype(x.dtype)
    # fallback: dequantize the gathered rows (memory: T*k slabs in bf16)
    data = w.data[ids]                               # [T, k, N, Kd]
    if w.bits == 4:
        b = data.astype(jnp.int32)
        codes = jnp.concatenate([(b & 15) - 8, ((b >> 4) & 15) - 8], axis=-1)
    else:
        codes = data.astype(jnp.int32)
    s = w.scales[ids].astype(jnp.float32)            # [T, k, N, G]
    bi = w.biases[ids].astype(jnp.float32)
    wd = (codes.astype(jnp.float32).reshape(T, k, N, G, w.group_size)
          * s[..., None] + bi[..., None]).reshape(T, k, N, K)
    return jnp.einsum("tknd,td->tkn", wd, x.astype(jnp.float32)).astype(x.dtype)
