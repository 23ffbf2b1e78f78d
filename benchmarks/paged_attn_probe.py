"""Is XLA's paged-view decode attention slower than dense? Measures a scan
of decode-attention steps (B rows, GQA) over (a) a dense [B, n_kv, S, D]
cache and (b) the PagedKVCache gathered view, on the real TPU.

Run: python benchmarks/paged_attn_probe.py [--steps 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.paged_cache import PagedKVCache

B, H, NKV, S, D = 8, 32, 8, 2048, 128
PS = 128


def attn(q, k, v, length):
    # q [B, H, D]; k/v [B, NKV, S, D] — the production sdpa (bf16 operands,
    # f32 logits) with a per-row validity mask
    from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
    mask = jnp.where(jnp.arange(S)[None, None, :]
                     < length[:, None, None], 0.0, NEG_INF)  # [B, 1, S]
    o = sdpa(q[:, :, None, :], k, v, scale=D ** -0.5,
             mask=mask.astype(jnp.float32))
    return o[:, :, 0]


def run(kind, steps):
    key = jax.random.PRNGKey(0)
    lengths = jnp.full((B,), S - 1, jnp.int32)
    if kind == "dense":
        k = jax.random.normal(key, (B, NKV, S, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, NKV, S, D), jnp.bfloat16)

        def step(carry, q):
            o = attn(q, k, v, lengths)
            return carry + jnp.sum(o.astype(jnp.float32)), None
    else:
        num_pages = B * (S // PS) + 1
        pc = PagedKVCache.init(B, NKV, num_pages, PS, D, S // PS,
                               jnp.bfloat16)
        pool_shape = pc.k_pool.shape
        pc = PagedKVCache(
            k_pool=jax.random.normal(key, pool_shape, jnp.bfloat16),
            v_pool=jax.random.normal(key, pool_shape, jnp.bfloat16),
            page_table=jnp.arange(1, num_pages, dtype=jnp.int32).reshape(
                B, S // PS))
        if kind == "kernel":
            from ominix_mlx_tpu.ops.paged_attention import (
                paged_decode_attention)

            def step(carry, q):
                o = paged_decode_attention(q, pc.k_pool, pc.v_pool,
                                           pc.page_table, lengths, D ** -0.5)
                return carry + jnp.sum(o.astype(jnp.float32)), None
        else:
            def step(carry, q):
                o = attn(q, pc.k, pc.v, lengths)
                return carry + jnp.sum(o.astype(jnp.float32)), None

    qs = jax.random.normal(jax.random.PRNGKey(1), (steps, B, H, D),
                           jnp.bfloat16)

    @jax.jit
    def loop(qs):
        tot, _ = jax.lax.scan(step, jnp.float32(0.0), qs)
        return tot

    float(loop(qs))  # compile
    t0 = time.perf_counter()
    float(loop(qs))
    dt = time.perf_counter() - t0
    print(f"{kind}: {dt/steps*1e6:.1f} us/step", flush=True)
    return dt / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()
    d = run("dense", args.steps)
    p = run("paged", args.steps)
    k = run("kernel", args.steps)
    print(f"paged/dense ratio: {p/d:.2f}; kernel speedup vs XLA: {p/k:.2f}x")


if __name__ == "__main__":
    main()
