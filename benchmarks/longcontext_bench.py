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
import numpy as np


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


def needle_accuracy(S: int, trials: int = 16, scfg=None,
                    Hkv: int = 2, H: int = 8, D: int = 128, seed: int = 0,
                    dtype=jnp.bfloat16):
    """Needle-in-haystack retrieval through the InfLLMv2 sparse decode
    gather (reference: minicpm-sala-mlx/examples/needle_test.rs — the
    reference checks the generated answer of a real checkpoint; with no
    egress this measures the same property at the attention level).

    Plants one distinctive K (unit vector, amplified) with a random unit
    payload V at a random position in the sparse MIDDLE region of an
    S-token cache, per trial (trials ride the batch axis — one jit, no
    per-trial dispatch). A query aligned with the needle key must pull the
    payload through compressed-score top-k block selection. Returns
    (sparse_acc, dense_acc, rel_err): accuracy = fraction of trials whose
    output cosine-matches the payload > 0.8, dense = same query through
    full dense attention (the upper bound), rel_err = median relative
    error of sparse vs dense outputs."""
    from ominix_mlx_tpu.core.attention import sdpa
    from ominix_mlx_tpu.models.sparse_attention import (SparseConfig,
                                                        SparseKVCache,
                                                        compress_keys,
                                                        sparse_decode_attention)

    scfg = scfg or SparseConfig()
    ks = scfg.kernel_size
    total = S - 8                       # valid length (cache cap minus slack)
    rng = np.random.default_rng(seed)
    B = trials
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, dtype)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, dtype)
    # needle positions: strictly inside the middle region (beyond the init
    # blocks, before the sliding window), block-unaligned on purpose
    init_end = scfg.init_blocks * scfg.block_size
    lo = init_end + ks
    hi = total - scfg.window_size - ks
    pos = rng.integers(lo, hi, size=(B,))
    needle = rng.normal(size=(B, D))
    needle = needle / np.linalg.norm(needle, axis=-1, keepdims=True)
    payload = rng.normal(size=(B, D))
    payload = payload / np.linalg.norm(payload, axis=-1, keepdims=True)
    # amplitudes: the needle logit must beat ln(S)+noise for softmax to
    # concentrate (q_amp*k_amp*scale >> ln S), and the MEAN-POOLED needle
    # (k_amp/ks) must beat the compressed-score noise for top-k to select
    # its block — k_amp ~ ks/2 keeps the pooled amplitude ~0.5 at any ks
    q_amp, k_amp = 24.0, min(max(ks / 2.0, 8.0), 32.0)
    needle_q = needle * q_amp
    nk = jnp.asarray(needle * k_amp, dtype)
    pv = jnp.asarray(payload, dtype)
    bidx = jnp.arange(B)
    k = k.at[bidx, :, jnp.asarray(pos)].set(nk[:, None, :])
    v = v.at[bidx, :, jnp.asarray(pos)].set(pv[:, None, :])
    cache = SparseKVCache(k=k, v=v, comp=compress_keys(k, ks),
                          kernel_size=ks)
    q = jnp.broadcast_to(jnp.asarray(needle_q, dtype)[:, None, None],
                         (B, H, 1, D))
    offset = jnp.full((B,), total - 1, jnp.int32)
    scale = D ** -0.5

    @jax.jit
    def run(q, cache, k, v):
        out_s = sparse_decode_attention(q, cache, offset, scfg, scale)
        # dense reference: mask positions >= total
        smask = jnp.where(jnp.arange(S) < total, 0.0,
                          -jnp.inf).astype(jnp.float32)
        out_d = sdpa(q, k, v, scale=scale, mask=smask[None, None, None])
        return out_s, out_d

    out_s, out_d = run(q, cache, k, v)

    def acc(out):
        o = np.asarray(out[:, :, 0].astype(jnp.float32))       # [B,H,D]
        o = o / (np.linalg.norm(o, axis=-1, keepdims=True) + 1e-9)
        cos = np.einsum("bhd,bd->bh", o, payload)
        return float((cos.mean(axis=1) > 0.8).mean())

    num = np.asarray(jnp.abs(out_s - out_d).astype(jnp.float32))
    den = np.asarray(jnp.abs(out_d).astype(jnp.float32)).max() + 1e-9
    return acc(out_s), acc(out_d), float(np.median(num) / den)


def needle_main(offsets, trials):
    for S in offsets:
        sa, da, rel = needle_accuracy(S, trials=trials)
        print(json.dumps({"metric": f"sala_needle_acc_at_{S}",
                          "value": round(sa, 4), "unit": "accuracy",
                          "vs_baseline": round(sa / max(da, 1e-9), 3)}),
              flush=True)
        print(json.dumps({"metric": f"sala_needle_dense_acc_at_{S}",
                          "value": round(da, 4), "unit": "accuracy",
                          "vs_baseline": 1.0}), flush=True)


if __name__ == "__main__":
    if "--needle" in sys.argv:
        sys.argv.remove("--needle")
        ap = argparse.ArgumentParser()
        ap.add_argument("--offsets", default="32768,131072")
        ap.add_argument("--trials", type=int, default=16)
        a = ap.parse_args()
        needle_main([int(x) for x in a.offsets.split(",")], a.trials)
    else:
        main()
