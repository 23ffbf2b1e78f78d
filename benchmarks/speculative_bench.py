"""Speculative decoding on the real TPU: streaming tok/s vs the plain
host-loop engine.

Speculation accelerates the STREAMING path (each round = one draft scan +
one verify step instead of nd+1 target steps); the lax.scan decode path is
the throughput ceiling and doesn't speculate. Acceptance rate depends on
weight values, which random init can't reproduce, so two ends are
reported:

  spec_upper  draft params == target params  -> acceptance ~= 1.0
              (pure machinery win: ceiling of the technique here)
  spec_floor  independent random draft       -> acceptance ~= 0
              (all overhead, no wins: worst case)

Real checkpoints land between them (reference: +22% from its pipelining
alone; EAGLE-style drafts reach 2-3x).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.core.speculative import SpecStats, SpeculativeEngine
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig

TARGET = TransformerConfig(
    vocab_size=151936, hidden_size=2560, num_layers=36, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=9728,
    rope_theta=1000000.0, use_qk_norm=True, tie_word_embeddings=True)
DRAFT = TransformerConfig(
    vocab_size=151936, hidden_size=1024, num_layers=28, num_heads=16,
    num_kv_heads=8, head_dim=128, intermediate_size=3072,
    rope_theta=1000000.0, use_qk_norm=True, tie_word_embeddings=True)

N_TOK = 192
PROMPT = 32
CAP = 512


def tps_plain(tp):
    eng = Engine(lambda p, t, c: base.forward(p, TARGET, t, c), tp)
    prompt = jnp.ones((PROMPT,), jnp.int32)

    def run():
        cache = base.init_cache(TARGET, 1, CAP, jnp.bfloat16)
        t0 = time.perf_counter()
        n = sum(1 for _ in eng.generate(prompt, cache, max_tokens=N_TOK))
        return n / (time.perf_counter() - t0)

    run()
    return max(run() for _ in range(2))


def tps_spec(tp, dp, dcfg, label, force_accept=False):
    spec = SpeculativeEngine(
        lambda p, t, c: base.forward(p, TARGET, t, c), tp,
        lambda p, t, c: base.forward(p, dcfg, t, c), dp,
        num_draft_tokens=4, force_accept=force_accept)
    prompt = jnp.ones((PROMPT,), jnp.int32)

    def run():
        tc = base.init_cache(TARGET, 1, CAP, jnp.bfloat16)
        dc = base.init_cache(dcfg, 1, CAP, jnp.bfloat16)
        st = SpecStats()
        t0 = time.perf_counter()
        n = sum(1 for _ in spec.generate(prompt, tc, dc, max_tokens=N_TOK,
                                         stats=st))
        return n / (time.perf_counter() - t0), st.acceptance_rate

    run()
    best = max((run() for _ in range(2)), key=lambda x: x[0])
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    tp = base.init_params(TARGET, jax.random.PRNGKey(0), jnp.bfloat16)
    if which in ("all", "plain"):
        base_tps = tps_plain(tp)
        print(json.dumps({"metric": "qwen3_4b_stream_decode", "value":
                          round(base_tps, 2), "unit": "tokens/sec",
                          "vs_baseline": 1.0}), flush=True)
    if which in ("all", "upper"):
        v, acc = tps_spec(tp, tp, TARGET, "upper")
        print(json.dumps({"metric": "spec_upper_selfdraft", "value":
                          round(v, 2), "unit": "tokens/sec",
                          "acceptance": round(acc, 3)}), flush=True)
    if which in ("all", "floor"):
        dp = base.init_params(DRAFT, jax.random.PRNGKey(7), jnp.bfloat16)
        v, acc = tps_spec(tp, dp, DRAFT, "floor")
        print(json.dumps({"metric": "spec_floor_randomdraft", "value":
                          round(v, 2), "unit": "tokens/sec",
                          "acceptance": round(acc, 3)}), flush=True)
    if which in ("all", "scan"):
        # fully on-device round loop (generate_scan): zero host round-trips
        dp = base.init_params(DRAFT, jax.random.PRNGKey(7), jnp.bfloat16)
        for name, fa in (("spec_scan_ceiling", True),
                         ("spec_scan_floor", False)):
            spec = SpeculativeEngine(
                lambda p, t, c: base.forward(p, TARGET, t, c), tp,
                lambda p, t, c: base.forward(p, DRAFT, t, c), dp,
                num_draft_tokens=4, force_accept=fa)
            prompt = jnp.ones((PROMPT,), jnp.int32)

            def run():
                tc = base.init_cache(TARGET, 1, CAP, jnp.bfloat16)
                dc = base.init_cache(DRAFT, 1, CAP, jnp.bfloat16)
                t0 = time.perf_counter()
                toks, _ = spec.generate_scan(prompt, tc, dc,
                                             max_tokens=N_TOK)
                return len(toks) / (time.perf_counter() - t0)

            run()
            v = max(run() for _ in range(2))
            print(json.dumps({"metric": name, "value": round(v, 2),
                              "unit": "tokens/sec"}), flush=True)
    if which in ("all", "ceiling"):
        # acceptance=1 ceiling with a REALISTIC 0.6B draft: all compute
        # runs, only the accept comparison is overridden (force_accept)
        dp = base.init_params(DRAFT, jax.random.PRNGKey(7), jnp.bfloat16)
        v, acc = tps_spec(tp, dp, DRAFT, "ceiling", force_accept=True)
        print(json.dumps({"metric": "spec_ceiling_smalldraft", "value":
                          round(v, 2), "unit": "tokens/sec",
                          "acceptance": round(acc, 3)}), flush=True)


if __name__ == "__main__":
    main()
