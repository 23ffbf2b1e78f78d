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
    "qkv": (2560, 6144),
    "o": (4096, 2560),
    "lmhead": (2560, 151936),
}


def make_variant(name, key, K, N, M):
    wk, xk = jax.random.split(key)
    w = jax.random.normal(wk, (N, K), jnp.float32) * 0.02
    x0 = jax.random.normal(xk, (M, K), jnp.bfloat16)
    if name == "bf16":
        wd = w.astype(jnp.bfloat16)
        fn = lambda x: jnp.dot(x, wd.T, preferred_element_type=jnp.bfloat16)
        nbytes = N * K * 2
    elif name.endswith("dq"):             # batched dq kernel (w4dq/w8dq)
        bits = 8 if name.startswith("w8") else 4
        pqt = qm.prepare(quantize_tensor(w, 64, bits), batched=True)
        fn = lambda x: qm.quantized_matmul(x, pqt)
        nbytes = N * K * bits // 8 + 2 * N * (K // 64) * 2
    elif name.endswith("pt"):             # transposed-panel M=1 (w4pt/w8pt)
        bits = 8 if name.startswith("w8") else 4
        pqt = qm.to_panels_t(qm.prepare(quantize_tensor(w, 64, bits),
                                        act_bits=8))
        assert pqt.tn, (name, K, N, "to_panels_t declined the shape")
        fn = lambda x: qm.quantized_matmul(x, pqt)
        nbytes = N * K * bits // 8 + 2 * N * (K // 64) * 2
    else:
        bits = 8 if name.startswith("w8") else 4
        act = None if name.endswith("a16") else 8
        pqt = qm.prepare(quantize_tensor(w, 64, bits), act_bits=act)
        fn = lambda x: qm.quantized_matmul(x, pqt)
        nbytes = N * K * bits // 8 + 2 * N * (K // 64) * 2
    return fn, x0, nbytes


def timed(fn, x0, iters):
    def run(x, n):
        def step(x, _):
            y = fn(x)
            return (x + (jnp.sum(y) * 1e-30).astype(x.dtype), ())
        x, _ = jax.lax.scan(step, x, length=n)
        return jnp.sum(x.astype(jnp.float32))

    runs = {}
    for n in (64, 320):
        r = jax.jit(lambda x: run(x, n))
        float(r(x0))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(x0))
            ts.append(time.perf_counter() - t0)
        runs[n] = min(ts)
    return (runs[320] - runs[64]) / (320 - 64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="gate,down")
    ap.add_argument("--variants", default="bf16,w8a8,w4a8")
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--act-ik", action="store_true",
                    help="in-kernel activation quantization variant")
    ap.add_argument("--check", action="store_true",
                    help="numeric check vs XLA dequant reference")
    args = ap.parse_args()
    if args.act_ik:
        qm._ACT_IN_KERNEL = True
    print(f"backend={jax.default_backend()} M={args.m} "
          f"act_ik={qm._ACT_IN_KERNEL}")
    for sname in args.shapes.split(","):
        K, N = SHAPES[sname]
        for vname in args.variants.split(","):
            fn, x0, nbytes = make_variant(vname, jax.random.PRNGKey(0),
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
                got = fn(x0).astype(jnp.float32)
                err = float(jnp.max(jnp.abs(got - ref))
                            / (jnp.max(jnp.abs(ref)) + 1e-9))
                print(f"{sname:5s} {vname:6s} rel_err={err:.4f}")
            t = timed(fn, x0, 320)
            print(f"{sname:5s} K={K:5d} N={N:5d} {vname:6s} "
                  f"{t * 1e6:8.1f} us  {nbytes / t / 1e9:7.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
