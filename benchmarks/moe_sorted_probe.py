"""TPU probe: sorted expert dispatch vs dense all-expert MoE prefill.

Measures one MoE layer's prefill (M tokens) three ways:
  dense   — all-expert einsum + one-hot combine (the old default)
  gmm     — sorted dispatch via megablox Pallas grouped matmul
  ragged  — sorted dispatch via jax.lax.ragged_dot (XLA lowering)

Shapes default to a GLM4-MoE-class layer (E=64 here to fit comfortably,
top-8). VERDICT r3 #4 target: sorted >= 2x dense at E>=64.

All params are jit OPERANDS (never closures); timing fetches a value.
Run each variant standalone first (Mosaic stall hazard: lane-lane dots
inside loops) — this script keeps every variant in its own jit with NO
scan, timing over repeated dispatches (work per call is ~ms, so the
~25ms RPC is amortized by the difference quotient between reps).

Usage: python benchmarks/moe_sorted_probe.py [--variant dense|gmm|ragged]
       [--E 64] [--M 2048] [--topk 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="dense,ragged,gmm")
    ap.add_argument("--E", type=int, default=64)
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--topk", type=int, default=8)
    ap.add_argument("--D", type=int, default=2048)
    ap.add_argument("--I", type=int, default=1536)
    args = ap.parse_args()

    from ominix_mlx_tpu.models import moe
    from ominix_mlx_tpu.nn.layers import ACTIVATIONS

    E, M, k, D, I = args.E, args.M, args.topk, args.D, args.I
    act = ACTIVATIONS["silu"]
    mcfg = moe.MoEConfig(num_experts=E, top_k=k, moe_intermediate_size=I)

    def _mark(msg):
        print(f"[probe] {msg} t={time.monotonic() - T0:.0f}s",
              file=sys.stderr, flush=True)

    T0 = time.monotonic()
    # first allocation poll-retries: the tunnel holds the previous client's
    # HBM ~1-2 min after exit (CLAUDE.md round-2)
    deadline = time.monotonic() + 240
    while True:
        try:
            lp = moe.init_moe_params(jax.random.PRNGKey(0), D, mcfg,
                                     jnp.bfloat16)
            jax.tree.map(lambda x: x.block_until_ready(), lp)
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or \
                    time.monotonic() > deadline:
                raise
            _mark("HBM busy, retrying")
            time.sleep(10)
    _mark("params ready")
    ex = lp["experts"]
    xt = jax.random.normal(jax.random.PRNGKey(1), (M, D), jnp.bfloat16)
    w, idx = jax.jit(lambda lp, xt: moe.route(lp, mcfg, xt))(lp, xt)
    w = w.astype(jnp.bfloat16)
    _mark("routing done")

    def dense_fn(ex, xt, w, idx):
        comb = jnp.zeros((M, E), jnp.float32)
        comb = jax.vmap(lambda c, i, ww: c.at[i].add(ww))(
            comb, idx, w.astype(jnp.float32))
        g = jnp.einsum("md,eid->mei", xt, ex["gate_proj"])
        u = jnp.einsum("md,eid->mei", xt, ex["up_proj"])
        h = act(g) * u
        ye = jnp.einsum("mei,edi->med", h, ex["down_proj"])
        return jnp.einsum("med,me->md", ye.astype(jnp.float32), comb).sum()

    def dense_scan_fn(ex, xt, w, idx):
        # per-expert scan variant (bounded memory, what quant prefill does)
        comb = jnp.zeros((M, E), jnp.float32)
        comb = jax.vmap(lambda c, i, ww: c.at[i].add(ww))(
            comb, idx, w.astype(jnp.float32))

        def step(acc, e):
            wg = ex["gate_proj"][e]
            wu = ex["up_proj"][e]
            wd = ex["down_proj"][e]
            h = act(xt @ wg.T) * (xt @ wu.T)
            return acc + (h @ wd.T).astype(jnp.float32) * comb[:, e][:, None], None
        y, _ = jax.lax.scan(step, jnp.zeros((M, D), jnp.float32),
                            jnp.arange(E))
        return y.sum()

    def make_sorted(use_gmm, tm=128):
        def f(ex, xt, w, idx):
            flat_e = idx.reshape(-1)
            order = jnp.argsort(flat_e)
            tok = order // k
            xs = jnp.take(xt, tok, axis=0)
            gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
            g = moe._group_matmul(xs, ex["gate_proj"], gs, use_gmm, tm)
            u = moe._group_matmul(xs, ex["up_proj"], gs, use_gmm, tm)
            h = (act(g) * u).astype(xt.dtype)
            ys = moe._group_matmul(h, ex["down_proj"], gs, use_gmm, tm)
            wf = jnp.take(w.reshape(-1).astype(jnp.float32), order)
            return jnp.zeros((M, D), jnp.float32).at[tok].add(
                ys * wf[:, None]).sum()
        return f

    fns = {"dense": dense_fn, "dense_scan": dense_scan_fn,
           "ragged": make_sorted(False), "gmm": make_sorted(True, 512),
           "gmm128": make_sorted(True, 128),
           "gmm256": make_sorted(True, 256)}

    for name in args.variant.split(","):
        fn = jax.jit(fns[name])
        try:
            _mark(f"compiling {name}")
            t0 = time.perf_counter()
            float(fn(ex, xt, w, idx))
            compile_s = time.perf_counter() - t0
            _mark(f"{name} compiled in {compile_s:.0f}s")

            def reps(n):
                t0 = time.perf_counter()
                vals = [fn(ex, xt, w, idx) for _ in range(n)]
                float(vals[-1])
                return time.perf_counter() - t0

            reps(2)
            t2 = min(reps(2) for _ in range(2))
            t8 = min(reps(8) for _ in range(2))
            per_call = (t8 - t2) / 6
            print(json.dumps({
                "variant": name, "E": E, "M": M, "k": k,
                "ms_per_layer": round(per_call * 1e3, 3),
                "prefill_tok_per_s": round(M / per_call, 1),
                "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
