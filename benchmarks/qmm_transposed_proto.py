"""Prototype: transposed-P 4-bit decode kernel (lane axis = output panel).

The production P-kernel computes P = codes @ blockdiag(x) with the GROUP
axis on MXU lanes — G=40 groups pad to 128 lanes, wasting ~3.2x MXU passes
on gate/qkv shapes. This transposed formulation puts the 512-wide row
panel on lanes instead:

    P^T [G, TN] = XgT_lo [G, K/2] @ codes_lo [K/2, TN]
                + XgT_hi [G, K/2] @ codes_hi [K/2, TN]
    out [1, TN] = s_x * colsum(S * P^T) + colsum(xgT * biasT)

Weights/scales/biases are stored TRANSPOSED ([K/2, N] / [G, N]); panels
are lane-slices (128-aligned). Double-buffered DMA as in the production
kernel. M=1, bits=4, G<=128 only.

Usage: python benchmarks/qmm_transposed_proto.py [--shapes gate,qkv]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ominix_mlx_tpu.core.quant import quantize_tensor
from ominix_mlx_tpu.ops import quant_matmul as qm

NBUF = 2


def _pt_kernel(xlo_ref, xhi_ref, sT, bT, dataT, out_ref, dbuf, sems, xgl_s,
               xgh_s, *, gs: int, K: int, G: int, TN: int, NCH: int):
    Kc = K // 2

    # ---- prologue: quantize x, build transposed blockdiag halves ---------
    # (the two K/2 halves arrive as separate operands: lane-offset slices
    # of one [1, K] vector cannot be broadcast along sublanes in Mosaic)
    xf_lo = xlo_ref[:].astype(jnp.float32)             # [1, Kc] lanes
    xf_hi = xhi_ref[:].astype(jnp.float32)
    sxm = (jnp.maximum(jnp.max(jnp.abs(xf_lo), axis=1, keepdims=True),
                       jnp.max(jnp.abs(xf_hi), axis=1, keepdims=True))
           / 127.0 + 1e-12)
    cxq_lo = jnp.round(xf_lo / sxm)
    cxq_hi = jnp.round(xf_hi / sxm)

    G2 = G // 2

    def build(xq_part, xraw_part, scratch_ref):
        """[G2, Kc] scratch: row g holds quantized x of this half's g-th
        group. Returns raw-x group sums [G2, 1] for the bias term."""
        kk = jax.lax.broadcasted_iota(jnp.int32, (G2, Kc), 1) // gs
        gg = jax.lax.broadcasted_iota(jnp.int32, (G2, Kc), 0)
        sel = kk == gg
        xq = jnp.where(sel, xq_part, 0.0)
        scratch_ref[...] = xq.astype(jnp.int32).astype(jnp.int8)
        return jnp.sum(jnp.where(sel, xraw_part, 0.0), axis=1,
                       keepdims=True)

    xg_lo = build(cxq_lo, xf_lo, xgl_s)                    # [G2, 1]
    xg_hi = build(cxq_hi, xf_hi, xgh_s)

    def dma(slot, i):
        return pltpu.make_async_copy(
            dataT.at[:, pl.ds(i * TN, TN)], dbuf.at[slot], sems.at[slot])

    for j in range(min(NBUF - 1, NCH)):
        dma(j, j).start()

    def body(i, _):
        slot = jax.lax.rem(i, NBUF)

        @pl.when(i + NBUF - 1 < NCH)
        def _():
            dma(jax.lax.rem(i + NBUF - 1, NBUF), i + NBUF - 1).start()

        dma(slot, i).wait()
        blk = dbuf[slot]                               # [Kc, TN] packed
        b32 = blk.astype(jnp.int32)
        A = (b32 & 15).astype(jnp.int8)                # w^T rows 0..Kc-1
        B = ((b32 >> 4) & 15).astype(jnp.int8)         # w^T rows Kc..K-1
        Pt_lo = jax.lax.dot_general(xgl_s[...], A, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        Pt_hi = jax.lax.dot_general(xgh_s[...], B, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        Ptf = jnp.concatenate([Pt_lo, Pt_hi], axis=0).astype(jnp.float32)
        s = sT[:, pl.ds(i * TN, TN)].astype(jnp.float32)
        b = bT[:, pl.ds(i * TN, TN)].astype(jnp.float32)
        # nibbles stored as code+8: fold -8 into bias side
        b = b - 8.0 * s
        xg = jnp.concatenate([xg_lo, xg_hi], axis=0)   # [G, 1]
        out = jnp.sum(s * Ptf, axis=0, keepdims=True) * sxm \
            + jnp.sum(xg * b, axis=0, keepdims=True)
        out_ref[:, pl.ds(i * TN, TN)] = out
        return ()

    jax.lax.fori_loop(0, NCH, body, ())


def prepare_t(qt):
    N, K = qt.q.shape
    half = K // 2
    lo = (qt.q[:, :half] + 8).astype(jnp.uint8)
    hi = (qt.q[:, half:] + 8).astype(jnp.uint8)
    dataT = (lo | (hi << 4)).view(jnp.int8).T          # [K/2, N]
    return (jnp.asarray(dataT), jnp.asarray(qt.scales.T, jnp.bfloat16),
            jnp.asarray(qt.biases.T, jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("gs", "K"))
def qmm_p4t(x, dataT, sT, bT, gs: int, K: int):
    Kc, N = dataT.shape
    G = K // gs
    TN = 512
    while N % TN:
        TN //= 2
    NCH = N // TN
    kern = functools.partial(_pt_kernel, gs=gs, K=K, G=G, TN=TN, NCH=NCH)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # x_lo [1, K/2]
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # x_hi [1, K/2]
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # sT [G, N]
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # bT [G, N]
                  pl.BlockSpec(memory_space=pl.ANY)],      # dataT
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NBUF, Kc, TN), jnp.int8),
                        pltpu.SemaphoreType.DMA((NBUF,)),
                        pltpu.VMEM((G // 2, Kc), jnp.int8),
                        pltpu.VMEM((G // 2, Kc), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(flops=2 * N * K * G,
                                      bytes_accessed=N * Kc + N * 4,
                                      transcendentals=0),
    )(x[:, :Kc].astype(jnp.bfloat16), x[:, Kc:].astype(jnp.bfloat16),
      sT, bT, dataT)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="gate,qkv")
    args = ap.parse_args()
    shapes = {"gate": (2560, 9728), "qkv": (2560, 6144), "o": (4096, 2560)}
    for name in args.shapes.split(","):
        K, N = shapes[name]
        w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32) \
            * 0.02
        x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)
        qt = quantize_tensor(w, 64, 4)
        dataT, sT, bT = prepare_t(qt)

        # numeric check vs the production kernel
        pqt = qm.prepare(qt)
        ref = qm.quantized_matmul(x, pqt).astype(jnp.float32)
        got = qmm_p4t(x, dataT, sT, bT, 64, K)
        err = float(jnp.max(jnp.abs(got - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"{name}: rel_err_vs_production={err:.4f}")

        def timed(fn):
            def run(x, n):
                def step(x, _):
                    y = fn(x)
                    return (x + (jnp.sum(y) * 1e-30).astype(x.dtype), ())
                x, _ = jax.lax.scan(step, x, length=n)
                return jnp.sum(x.astype(jnp.float32))
            runs = {}
            for n in (64, 320):
                r = jax.jit(lambda xx: run(xx, n))
                float(r(x))                   # compile + warm
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(r(x))
                    ts.append(time.perf_counter() - t0)
                runs[n] = min(ts)
            return (runs[320] - runs[64]) / 256

        t_new = timed(lambda xx: qmm_p4t(xx, dataT, sT, bT, 64, K))
        t_old = timed(lambda xx: qm.quantized_matmul(xx, pqt))
        nbytes = N * K // 2
        print(f"{name}: transposed {t_new * 1e6:7.1f} us "
              f"({nbytes / t_new / 1e9:6.1f} GB/s) | production "
              f"{t_old * 1e6:7.1f} us ({nbytes / t_old / 1e9:6.1f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
