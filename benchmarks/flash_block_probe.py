"""Flash-attention BlockSizes sweep on v5e (VERDICT r4 #3).

Times ONE attention call at qwen3-4B shapes for the two prefill regimes:

  fresh:  causal self-attention, T = S = 8192 (first chunk / one-shot 8k)
  chunk:  continuation chunk T=2048 against a pos=30720 prefix (32k tail)
          — the GQA-folded prefix call that dominates 32k prefill

for a grid of (block_q, block_k_major) tile sizes. Each config is a fresh
remote Mosaic compile (30-90s), so the grid is small. Timing runs the
kernel inside a fori_loop whose carry feeds o back into q (dispatch
amortized; XLA cannot DCE the chain).

Usage: python benchmarks/flash_block_probe.py [--loops 16] [--case both]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, HKV, D = 1, 32, 8, 128


@functools.partial(jax.jit, static_argnames=("causal", "bq", "bkm", "loops"))
def timed_flash(q, k, v, causal: bool, bq: int, bkm: int, loops: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, _flash_attention_impl)

    bs = BlockSizes(block_q=min(bq, q.shape[2]),
                    block_k_major=min(bkm, k.shape[2]),
                    block_k=min(bkm, k.shape[2]), block_b=1)

    def body(i, x):
        o, l, m = _flash_attention_impl(
            x, k, v, None, None, True, causal, 1.0,
            bs.block_b, bs.block_q, bs.block_k_major, bs.block_k, False)
        return (o * 1e-3 + x * 0.999).astype(x.dtype)

    return jax.lax.fori_loop(0, loops, body, q).sum()


def run_case(name, Tq, S, causal, grid, loops):
    key = jax.random.PRNGKey(0)
    # GQA-folded prefix call: kernel sees matching head counts
    Hq = HKV if not causal else H
    fold = H // Hq
    q = jax.random.normal(key, (B, Hq, fold * Tq, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, Hq, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, Hq, S, D), jnp.bfloat16)
    if causal:
        k, v = k[:, :, :Tq], v[:, :, :Tq]
    print(f"== {name}: q[{B},{Hq},{fold * Tq},{D}] kv S={k.shape[2]} "
          f"causal={causal}", flush=True)
    best = None
    for bq, bkm in grid:
        try:
            float(timed_flash(q, k, v, causal, bq, bkm, 2))   # compile
            t0 = time.perf_counter()
            float(timed_flash(q, k, v, causal, bq, bkm, loops))
            dt = (time.perf_counter() - t0) / loops * 1e3
            print(f"  bq={bq:5d} bkm={bkm:5d}: {dt:8.2f} ms/call", flush=True)
            if best is None or dt < best[0]:
                best = (dt, bq, bkm)
        except Exception as e:
            print(f"  bq={bq:5d} bkm={bkm:5d}: FAIL {str(e)[:120]}",
                  flush=True)
    if best:
        print(f"  BEST {name}: bq={best[1]} bkm={best[2]} {best[0]:.2f} ms",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=16)
    ap.add_argument("--case", default="both")
    ap.add_argument("--refine", action="store_true")
    args = ap.parse_args()
    grid = [(128, 128), (256, 512), (512, 512), (512, 1024), (512, 2048),
            (1024, 1024), (2048, 1024)]
    if args.refine:
        # round-5 measured: (256, 512) won both cases; probe its hull
        grid = [(256, 512), (128, 512), (256, 256), (256, 1024), (384, 512),
                (192, 512), (256, 768)]
    if args.case in ("both", "chunk"):
        # 32k tail chunk: T=2048 queries x 30720 prefix keys, GQA folded
        run_case("chunk32k-prefix", 2048, 30720, False, grid, args.loops)
    if args.case in ("both", "fresh"):
        run_case("fresh8k-causal", 8192, 8192, True, grid, args.loops)


if __name__ == "__main__":
    main()
