"""Microbenchmark: decode-shape quantized matmuls on the real TPU.

Timing methodology (CLAUDE.md): block_until_ready is a no-op through the
device tunnel, so every measurement runs a long on-device lax.scan whose
carry consumes each iteration's output (XLA cannot DCE the work), and the
per-call time is the difference quotient between two loop lengths (dispatch
and fetch overheads cancel).

Usage: python benchmarks/qmm_bench.py [--shapes gate,down] [--variants bf16,w8a8,w4a8,w4a16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.quant import quantize_tensor
from ominix_mlx_tpu.ops import quant_matmul as qm

# Qwen3-4B decode-projection shapes: (K=in_features, N=out_features)
SHAPES = {
    "gate": (2560, 9728),
    "down": (9728, 2560),
    "gateup": (2560, 19456),   # fused gate+up (the shape the model runs)
    "qkv": (2560, 6144),
    "o": (4096, 2560),
    "lmhead": (2560, 151936),
}


def make_variant(name, key, K, N, M):
    """Returns (fn(x, wop), x0, wop, nbytes). The weight is an EXPLICIT jit
    operand — a closed-over weight is baked into the lowering as a constant
    (CLAUDE.md hazard: giant compile requests, and XLA may hoist it to VMEM
    across the timing scan, inflating small shapes past the HBM roofline)."""
    wk, xk = jax.random.split(key)
    w = jax.random.normal(wk, (N, K), jnp.float32) * 0.02
    x0 = jax.random.normal(xk, (M, K), jnp.bfloat16)
    nbytes = N * K * bits_of(name) // 8 + 2 * N * (K // 64) * 2
    if name == "bf16":
        wop = w.astype(jnp.bfloat16)
        fn = lambda x, wd: jnp.dot(x, wd.T,
                                   preferred_element_type=jnp.bfloat16)
        nbytes = N * K * 2
    elif name.endswith("dq"):             # batched dq kernel (w4dq/w8dq)
        wop = qm.prepare(quantize_tensor(w, 64, bits_of(name)), batched=True)
        fn = qm.quantized_matmul
    elif name.rstrip("0").endswith("pt"):  # transposed-panel M=1
        # w4pt/w8pt = module default unpack mode; trailing "0" (w4pt0)
        # forces the int32 unpack round-trip for A/B against the MXU
        # hi-nibble reconstruction in ONE process (shared tunnel noise).
        unpack = qm._UNPACK_I8 and not name.endswith("0")
        wop = qm.to_panels_t(qm.prepare(quantize_tensor(w, 64,
                                                        bits_of(name)),
                                        act_bits=8))
        assert wop.tn, (name, K, N, "to_panels_t declined the shape")

        def fn(x, wd, _u=unpack):
            old = qm._UNPACK_I8
            qm._UNPACK_I8 = _u
            try:
                return qm.quantized_matmul(x, wd)
            finally:
                qm._UNPACK_I8 = old
    else:
        act = None if name.endswith("a16") else 8
        wop = qm.prepare(quantize_tensor(w, 64, bits_of(name)), act_bits=act)
        fn = qm.quantized_matmul
    return fn, x0, wop, nbytes


def bits_of(name):
    return 8 if name.startswith("w8") else 4


def timed(fn, x0, wop, loops=(64, 320)):
    """Difference quotient between two scan lengths. The default (64, 320)
    gives a ~4ms signal for a 16us kernel — fine when the tunnel RPC time
    is stable, but swamped on jittery days (measured negative/impossible
    rates). Use --loops 640,3200 to push the signal over the jitter."""
    def run(x, w, n):
        def step(x, _):
            y = fn(x, w)
            return (x + (jnp.sum(y) * 1e-30).astype(x.dtype), ())
        x, _ = jax.lax.scan(step, x, length=n)
        return jnp.sum(x.astype(jnp.float32))

    n_lo, n_hi = loops
    runs = {}
    for n in (n_lo, n_hi):
        r = jax.jit(lambda x, w: run(x, w, n))
        float(r(x0, wop))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(x0, wop))
            ts.append(time.perf_counter() - t0)
        runs[n] = min(ts)
    return (runs[n_hi] - runs[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="gate,down")
    ap.add_argument("--variants", default="bf16,w8a8,w4a8")
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--act-ik", action="store_true",
                    help="in-kernel activation quantization variant")
    ap.add_argument("--check", action="store_true",
                    help="numeric check vs XLA dequant reference")
    ap.add_argument("--loops", default="64,320",
                    help="scan lengths for the difference quotient")
    args = ap.parse_args()
    loops = tuple(int(v) for v in args.loops.split(","))
    if args.act_ik:
        qm._ACT_IN_KERNEL = True
    print(f"backend={jax.default_backend()} M={args.m} "
          f"act_ik={qm._ACT_IN_KERNEL}")
    for sname in args.shapes.split(","):
        K, N = SHAPES[sname]
        for vname in args.variants.split(","):
            fn, x0, wop, nbytes = make_variant(vname, jax.random.PRNGKey(0),
                                               K, N, args.m)
            if args.check and vname != "bf16":
                import numpy as np

                from ominix_mlx_tpu.core.quant import dequantize
                wk, _ = jax.random.split(jax.random.PRNGKey(0))
                w = jax.random.normal(wk, (N, K), jnp.float32) * 0.02
                bits = 8 if vname.startswith("w8") else 4
                qt = quantize_tensor(w, 64, bits)
                ref = x0.astype(jnp.float32) @ dequantize(
                    qt, jnp.float32).T
                got = fn(x0, wop).astype(jnp.float32)
                err = float(jnp.max(jnp.abs(got - ref))
                            / (jnp.max(jnp.abs(ref)) + 1e-9))
                print(f"{sname:5s} {vname:6s} rel_err={err:.4f}")
            t = timed(fn, x0, wop, loops)
            print(f"{sname:5s} K={K:5d} N={N:5d} {vname:6s} "
                  f"{t * 1e6:8.1f} us  {nbytes / t / 1e9:7.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
