"""Long-context decode cost vs offset: the incremental-InfLLMv2 contract.

The point of sparse attention is that a decode step at offset 128k costs
the same as at 4k (only the gathered top-k blocks + local window are
read; compressed keys update incrementally on append). This bench decodes
a MiniCPM-SALA-class hybrid at several cache offsets and prints
ms/token per offset — flat-ness IS the result.

Usage: python benchmarks/longcontext_bench.py [--offsets 4096,16384,65536]
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
    ap.add_argument("--offsets", default="4096,16384,65536")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()
    offsets = [int(x) for x in args.offsets.split(",")]
    max_len = max(offsets) + args.iters + 8

    from ominix_mlx_tpu.models import minicpm_sala as mc

    # MiniCPM-SALA 9B-class layer geometry, depth scaled by --layers;
    # mixer pattern: 3 lightning (GLA) per 1 sparse-attention layer
    cfg = mc.MiniCPMConfig(
        vocab_size=73448, hidden_size=4096, num_layers=args.layers,
        num_heads=32, num_kv_heads=2, head_dim=128,
        intermediate_size=11264,
        mixer_types=tuple(
            ("lightning-attn" if i % 4 != 3 else "minicpm4")
            for i in range(args.layers)))
    params = mc.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    @jax.jit
    def decode_n(params, cache, tok, n_arr):
        def step(carry, _):
            tok, cache = carry
            logits, cache = mc.forward(params, cfg, tok, cache)
            return (jnp.argmax(logits[:, -1:], -1).astype(jnp.int32),
                    cache), logits.sum()
        (_, _), outs = jax.lax.scan(step, (tok, cache),
                                    length=args.iters)
        return outs.sum()

    results = {}
    for off in offsets:
        from ominix_mlx_tpu.core.cache import ModelCache
        cache = mc.init_cache(cfg, 1, max_len, jnp.bfloat16)
        # jump the cache to `off` (values are garbage; cost is shape-driven)
        cache = ModelCache(layers=cache.layers,
                           offset=jnp.asarray(off, jnp.int32))
        tok = jnp.ones((1, 1), jnp.int32)
        n_arr = jnp.int32(args.iters)
        float(decode_n(params, cache, tok, n_arr))          # compile+warm
        t0 = time.perf_counter()
        float(decode_n(params, cache, tok, n_arr))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        results[off] = dt
        print(json.dumps({"metric": f"sala_decode_ms_at_{off}",
                          "value": round(dt, 3), "unit": "ms/token",
                          "vs_baseline": round(results[offsets[0]] / dt, 3)}),
              flush=True)
    flat = results[offsets[-1]] / results[offsets[0]]
    print(json.dumps({"metric": "sala_decode_flatness_last_over_first",
                      "value": round(flat, 3), "unit": "ratio(~1=flat)",
                      "vs_baseline": round(1.0 / flat, 3)}), flush=True)


if __name__ == "__main__":
    main()
