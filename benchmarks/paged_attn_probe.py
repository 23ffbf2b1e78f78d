"""Is XLA's paged-view decode attention slower than dense? Measures a scan
of decode-attention steps (B rows, GQA) over (a) a dense [B, n_kv, S, D]
cache, (b) the PagedKVCache gathered view, (c) the fused Pallas kernel
(ops/paged_attention.py), and (d) the kernel over int8 pages, on the real
TPU.

Run: python benchmarks/paged_attn_probe.py [--steps 200] [--only kind]

IMPORTANT: every pool/cache array is a jit OPERAND. An earlier version
closed the 134MB pools over the jit (XLA bakes closures in as CONSTANTS);
the resulting giant lowerings wedged the remote compile service for hours
(CLAUDE.md round-3 notes). Never close over big arrays, even in probes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.paged_cache import PagedKVCache, quantize_kv_tokens

B, H, NKV, S, D = 8, 32, 8, 2048, 128
PS = 128
CP = 0       # kernel pages-per-chunk override (0 = library default)
FILL = 1.0   # fraction of S actually written (kernel skips unwritten pages;
             # the XLA paged view always pays O(capacity))


def attn(q, k, v, length):
    # q [B, H, D]; k/v [B, NKV, S, D] — the production sdpa (bf16 operands,
    # f32 logits) with a per-row validity mask
    from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
    mask = jnp.where(jnp.arange(S)[None, None, :]
                     < length[:, None, None], 0.0, NEG_INF)  # [B, 1, S]
    o = sdpa(q[:, :, None, :], k, v, scale=D ** -0.5,
             mask=mask.astype(jnp.float32))
    return o[:, :, 0]


def _paged(key):
    num_pages = B * (S // PS) + 1
    table = jnp.arange(1, num_pages, dtype=jnp.int32).reshape(B, S // PS)
    kp = jax.random.normal(key, (NKV, num_pages, D, PS), jnp.bfloat16)
    vp = jax.random.normal(jax.random.fold_in(key, 1),
                           (NKV, num_pages, PS, D), jnp.bfloat16)
    return kp, vp, table


def run(kind, steps):
    key = jax.random.PRNGKey(0)
    lengths = jnp.full((B,), max(int(S * FILL) - 1, 1), jnp.int32)
    qs = jax.random.normal(jax.random.PRNGKey(1), (steps, B, H, D),
                           jnp.bfloat16)

    if kind == "dense":
        k = jax.random.normal(key, (B, NKV, S, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, NKV, S, D), jnp.bfloat16)

        @jax.jit
        def loop(qs, k, v):
            def step(carry, q):
                o = attn(q, k, v, lengths)
                return carry + jnp.sum(o.astype(jnp.float32)), None
            return jax.lax.scan(step, jnp.float32(0.0), qs)[0]

        args = (qs, k, v)
    elif kind == "paged":
        kp, vp, table = _paged(key)

        @jax.jit
        def loop(qs, kp, vp, table):
            pc = PagedKVCache(k_pool=kp, v_pool=vp, page_table=table)

            def step(carry, q):
                o = attn(q, pc.k, pc.v, lengths)
                return carry + jnp.sum(o.astype(jnp.float32)), None
            return jax.lax.scan(step, jnp.float32(0.0), qs)[0]

        args = (qs, kp, vp, table)
    elif kind == "kernel":
        from ominix_mlx_tpu.ops.paged_attention import paged_decode_attention
        kp, vp, table = _paged(key)

        @jax.jit
        def loop(qs, kp, vp, table):
            def step(carry, q):
                o = paged_decode_attention(q, kp, vp, table, lengths,
                                           D ** -0.5, pages_per_chunk=CP)
                return carry + jnp.sum(o.astype(jnp.float32)), None
            return jax.lax.scan(step, jnp.float32(0.0), qs)[0]

        args = (qs, kp, vp, table)
    elif kind == "kernel8":
        from ominix_mlx_tpu.ops.paged_attention import paged_decode_attention
        kp, vp, table = _paged(key)
        # quantize per (head, page, token): k pages are [NKV, P, D, PS] —
        # transpose to token-last for the per-token scale, then back
        kq, ks = quantize_kv_tokens(jnp.transpose(kp, (0, 1, 3, 2)))
        vq, vs = quantize_kv_tokens(vp)
        kq = jnp.transpose(kq, (0, 1, 3, 2))

        @jax.jit
        def loop(qs, kq, vq, ks, vs, table):
            def step(carry, q):
                o = paged_decode_attention(q, kq, vq, table, lengths,
                                           D ** -0.5, k_scale=ks, v_scale=vs)
                return carry + jnp.sum(o.astype(jnp.float32)), None
            return jax.lax.scan(step, jnp.float32(0.0), qs)[0]

        args = (qs, kq, vq, ks.astype(jnp.float32), vs.astype(jnp.float32),
                table)
    else:
        raise ValueError(kind)

    float(loop(*args))  # compile
    t0 = time.perf_counter()
    float(loop(*args))
    dt = time.perf_counter() - t0
    print(f"{kind}: {dt/steps*1e6:.1f} us/step", flush=True)
    return dt / steps


def main():
    global CP
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--only", default=None,
                    choices=("dense", "paged", "kernel", "kernel8"))
    ap.add_argument("--cp", type=int, default=0,
                    help="kernel pages per DMA chunk (0 = default)")
    args = ap.parse_args()
    CP = args.cp
    if args.only:
        run(args.only, args.steps)
        return
    d = run("dense", args.steps)
    p = run("paged", args.steps)
    k = run("kernel", args.steps)
    k8 = run("kernel8", args.steps)
    print(f"paged/dense ratio: {p/d:.2f}; kernel vs XLA: {p/k:.2f}x; "
          f"int8 kernel vs XLA: {p/k8:.2f}x")


if __name__ == "__main__":
    main()
