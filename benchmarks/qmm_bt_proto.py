"""bt-kernel (batched decode) benchmark: w4/w8 bt vs P-kernel vs bf16 at
M = 1/4/8 on the Qwen3-4B projection shapes.

Usage: python benchmarks/qmm_bt_proto.py [--ms 1,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.quant import QuantizedTensor, dequantize
from ominix_mlx_tpu.ops import quant_matmul as qm

SHAPES = {"gate_up": (4864 * 2, 2560), "down": (2560, 9728),
          "qkv": (4096 + 1024, 2560), "o": (2560, 4096)}


def qt_random(N, K, bits, key):
    gs = 64
    q = jax.random.randint(key, (N, K), -(2 ** (bits - 1)),
                           2 ** (bits - 1), jnp.int8)
    scales = jax.random.uniform(key, (N, K // gs), jnp.float32, 0.01, 0.02)
    biases = jnp.zeros((N, K // gs), jnp.float32)
    return QuantizedTensor(q=q, scales=scales, biases=biases,
                           group_size=gs, bits=bits)


def make_loop(call, w, x):
    """On-device repeat loop: each iteration's output feeds a negligible
    scalar back into x (forces sequential execution; block_until_ready is
    a no-op through the tunnel and per-dispatch RPC costs ~2.5ms)."""
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(x, w, steps):
        def body(i, x):
            y = call(x, w)
            return x + (jnp.sum(y) * 1e-30).astype(x.dtype)
        return jax.lax.fori_loop(0, steps, body, x)

    def run(steps):
        t0 = time.perf_counter()
        float(jnp.sum(loop(x, w, steps)))
        return time.perf_counter() - t0

    return run


def timeit_loop(call, w, x, lo=40, hi=120):
    run = make_loop(call, w, x)
    run(lo); run(hi)
    t_lo = min(run(lo) for _ in range(2))
    t_hi = min(run(hi) for _ in range(2))
    return (t_hi - t_lo) / (hi - lo) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", default="1,4,8")
    ap.add_argument("--shapes", default="gate_up,down")
    args = ap.parse_args()
    for name in args.shapes.split(","):
        N, K = SHAPES[name]
        for bits in (4, 8):
            qt = qt_random(N, K, bits, jax.random.PRNGKey(0))
            w_bt = qm.prepare(qt, act_bits=8, batched=True)
            w_p = qm.prepare(qt, act_bits=8)
            wd = dequantize(qt, jnp.bfloat16)
            for M in map(int, args.ms.split(",")):
                x = jax.random.normal(jax.random.PRNGKey(1), (M, K),
                                      jnp.bfloat16)
                t_bt = timeit_loop(
                    lambda x, w: qm._qmm_bt(x, w, jnp.bfloat16), w_bt, x)
                t_p = timeit_loop(qm.quantized_matmul, w_p, x)
                t_bf = timeit_loop(lambda x, w: x @ w.T, wd, x)
                # numerics
                y_bt = np.asarray(
                    jax.jit(lambda x, w: qm._qmm_bt(x, w, jnp.bfloat16))(
                        x, w_bt), np.float32)
                y_ref = np.asarray(x.astype(jnp.float32)
                                   @ dequantize(qt, jnp.float32).T)
                rel = np.abs(y_bt - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
                print(f"{name} w{bits} M={M}: bt={t_bt:7.1f}us "
                      f"P={t_p:7.1f}us bf16={t_bf:7.1f}us rel={rel:.4f}",
                      flush=True)


if __name__ == "__main__":
    main()
