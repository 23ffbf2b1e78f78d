"""Headline benchmark: Qwen3-4B-class bf16 decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's headline number — Qwen3-4B at 45 tok/s on an Apple
M3 Max (reference README.md:578; BASELINE.md).

Decode runs with the lax.scan generation path (zero host round-trips), the
TPU-native equivalent of the reference's async_eval pipelining. Weights are
random-initialized (no checkpoint egress in this environment); decode
throughput is weight-value-independent.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.core.sampling import SamplerConfig
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig

BASELINE_TPS = 45.0  # reference: Qwen3-4B on M3 Max (README.md:578)

# Qwen3-4B architecture (HF Qwen/Qwen3-4B config.json)
QWEN3_4B = TransformerConfig(
    vocab_size=151936, hidden_size=2560, num_layers=36, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=9728,
    rope_theta=1000000.0, use_qk_norm=True, tie_word_embeddings=True,
    rms_norm_eps=1e-6)


def main():
    prompt_len = 128
    cache_len = 1024

    params = base.init_params(QWEN3_4B, jax.random.PRNGKey(0), jnp.bfloat16)
    engine = Engine(
        lambda p, t, c: base.forward(p, QWEN3_4B, t, c), params,
        SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, QWEN3_4B, t, c, fresh_prefill=True))
    prompt = jnp.ones((1, prompt_len), jnp.int32)

    def run(n):
        cache = base.init_cache(QWEN3_4B, 1, cache_len, jnp.bfloat16)
        t0 = time.perf_counter()
        toks, _ = engine.generate_scan(prompt, cache, max_tokens=n)
        int(toks[0, -1])  # force a value fetch (block_until_ready is
        # unreliable through the device tunnel)
        return time.perf_counter() - t0

    # difference-quotient methodology: decode tok/s from the marginal cost
    # of extra tokens — prefill and dispatch overheads cancel exactly
    run(128)
    run(512)
    t_short = min(run(128) for _ in range(2))
    t_long = min(run(512) for _ in range(2))
    tps = (512 - 128) / (t_long - t_short)
    print(json.dumps({
        "metric": "qwen3_4b_bf16_decode",
        "value": round(tps, 2),
        "unit": "tokens/sec",
        "vs_baseline": round(tps / BASELINE_TPS, 3),
    }))


if __name__ == "__main__":
    main()
