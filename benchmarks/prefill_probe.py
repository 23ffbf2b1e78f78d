"""Prefill performance probe: where do the 8k-prompt milliseconds go?

Times qwen3-4B 8k prefill at several chunk sizes (and single-shot), bf16
vs channelwise w8a8, and optionally captures a profiler trace for the
chunked path. Run on the TPU: python benchmarks/prefill_probe.py
"""

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.core.sampling import SamplerConfig
from ominix_mlx_tpu.models import base

from bench import QWEN3_4B, _build_params, _retry_alloc


def build_engine(cfg, scheme=None):
    if scheme == "channel8":
        params = _retry_alloc(lambda: _build_params(cfg, 8, scheme="channel8"))
    else:
        params = _retry_alloc(lambda: _build_params(cfg, None))
    return Engine(
        lambda p, t, c: base.forward(p, cfg, t, c), params, SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, cfg, t, c, fresh_prefill=True),
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, cfg, t, c, kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: base.forward(
            p, cfg, t, c, kv_limit=kl, skip_logits=True))


def time_prefill(engine, cfg, prompt_len, chunk_size, reps=2):
    prompt = jnp.ones((1, prompt_len), jnp.int32)

    def run():
        cache = base.init_cache(cfg, 1, prompt_len + 64, jnp.bfloat16)
        t0 = time.perf_counter()
        if chunk_size >= prompt_len:
            logits, _ = engine.prefill(prompt, cache)
        else:
            logits, _ = engine.prefill_chunked(prompt, cache,
                                               chunk_size=chunk_size)
        float(logits.reshape(-1)[0])
        return time.perf_counter() - t0

    run()  # compile
    return min(run() for _ in range(reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=8192)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--schemes", default="bf16,channel8")
    ap.add_argument("--chunks", default="2048,4096,8192")
    args = ap.parse_args()

    cfg = QWEN3_4B
    for scheme in args.schemes.split(","):
        engine = build_engine(cfg, None if scheme == "bf16" else scheme)
        for cs in [int(c) for c in args.chunks.split(",")]:
            t = time_prefill(engine, cfg, args.prompt_len, cs)
            print(f"{scheme} chunk={cs}: {t*1000:.0f} ms "
                  f"({args.prompt_len/t:.0f} tok/s)", flush=True)
        if args.trace and scheme == "bf16":
            prompt = jnp.ones((1, args.prompt_len), jnp.int32)
            cache = base.init_cache(cfg, 1, args.prompt_len + 64,
                                    jnp.bfloat16)
            with jax.profiler.trace("/tmp/prefill_trace"):
                logits, _ = engine.prefill_chunked(prompt, cache,
                                                   chunk_size=2048)
                float(logits.reshape(-1)[0])
            print("trace written to /tmp/prefill_trace", flush=True)
        del engine
        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
