"""Headline benchmarks: single-chip decode throughput vs the reference.

Prints one JSON line PER metric; the final line is the headline metric the
driver records. Baselines (BASELINE.md):
  - Qwen3-4B bf16:   45 tok/s   (reference README.md:578, M3 Max)
  - Mistral-7B 4bit: 82.8 tok/s (reference docs/performance-comparison.md:12)
  - GLM4-9B 4bit:    35 tok/s   (reference README.md:579)

Ordering/robustness contract (round-3): the HEADLINE metric
(qwen3_4b_w4a8_decode) runs FIRST so a driver-side timeout can never drop it,
and its JSON line is re-printed at the very end so it is also the final line
the driver parses. Instead of fixed 100s sleeps between metrics (the device
tunnel holds a client's HBM for ~1-2min after process exit), each child
process retries its first allocation on RESOURCE_EXHAUSTED with short polls —
so back-to-back metrics wait exactly as long as the tunnel needs and no more.

Decode runs with the lax.scan generation path (zero host round-trips), the
TPU-native equivalent of the reference's async_eval pipelining. Weights are
random-initialized (no checkpoint egress in this environment); decode
throughput is weight-value-independent. 4-bit runs use the w4a8 P-kernels
(ops/quant_matmul.py) with fused qkv / gate_up projections.
"""

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

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


def _retry_alloc(fn, budget_s: float = 180.0, poll_s: float = 10.0):
    """Run fn(); on RESOURCE_EXHAUSTED (tunnel still holding the previous
    client's HBM) poll-retry until it succeeds or the budget is spent."""
    deadline = time.monotonic() + budget_s
    while True:
        try:
            return fn()
        except Exception as e:  # jaxlib raises XlaRuntimeError
            if "RESOURCE_EXHAUSTED" not in str(e) or \
                    time.monotonic() > deadline:
                raise
            print(f"[bench] HBM busy, retrying in {poll_s}s", file=sys.stderr,
                  flush=True)
            gc.collect()
            jax.clear_caches()
            time.sleep(poll_s)


def _build_params(cfg, quant_bits, batched=False, scheme="group"):
    if quant_bits:
        params = base.init_quantized_params(cfg, jax.random.PRNGKey(0), 64,
                                            quant_bits, batched=batched,
                                            scheme=scheme)
    else:
        params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    params = base.fuse_layer_projections(params)
    # force materialization now so RESOURCE_EXHAUSTED surfaces inside the
    # retry window rather than at first use
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, params)
    return params


def decode_tps(cfg: TransformerConfig, quant_bits=None, batch: int = 1,
               prompt_len: int = 128, cache_len: int = 1024,
               scheme: str = "group", paged: bool = False) -> float:
    """Marginal decode tok/s via the difference-quotient methodology:
    prefill and dispatch overheads cancel between the two loop lengths.
    batch>1 reports AGGREGATE tok/s across the batch (scheme="channel8"
    serves w8a8 via the XLA int8 MXU path — the batch-throughput scheme;
    "group" rides the dq/P Pallas kernels). paged=True runs decode over
    the paged KV pool: attention rides the fused Pallas decode kernel and
    streams only written pages instead of full capacity."""
    params = _retry_alloc(
        lambda: _build_params(cfg, quant_bits, batched=batch > 1,
                              scheme=scheme))
    engine = Engine(
        lambda p, t, c: base.forward(p, cfg, t, c), params, SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, cfg, t, c, fresh_prefill=True))
    prompt = jnp.ones((batch, prompt_len), jnp.int32)

    def run(n):
        if paged:
            cache = base.init_paged_cache(cfg, batch, cache_len,
                                          dtype=jnp.bfloat16)
        else:
            cache = base.init_cache(cfg, batch, cache_len, jnp.bfloat16)
        t0 = time.perf_counter()
        toks, _ = engine.generate_scan(prompt, cache, max_tokens=n)
        int(toks[0, -1])  # force a value fetch (block_until_ready is
        # unreliable through the device tunnel)
        return time.perf_counter() - t0

    run(128)
    run(512)
    t_short = min(run(128) for _ in range(2))
    t_long = min(run(512) for _ in range(2))
    return batch * (512 - 128) / (t_long - t_short)


def prefill_tps(cfg: TransformerConfig, prompt_len: int = 8192,
                quant_bits=None, scheme: str = "group") -> float:
    """Long-prompt prefill throughput (flash-attention path), chunked.
    scheme="channel8" runs w8a8 prefill: the int8 MXU contracts at 2x the
    bf16 rate, so compute-bound prefill can beat bf16 outright."""
    params = _retry_alloc(
        lambda: _build_params(cfg, quant_bits, scheme=scheme))
    engine = Engine(
        lambda p, t, c: base.forward(p, cfg, t, c), params, SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, cfg, t, c, fresh_prefill=True),
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, cfg, t, c, kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: base.forward(
            p, cfg, t, c, kv_limit=kl, skip_logits=True))
    prompt = jnp.ones((1, prompt_len), jnp.int32)

    def run():
        cache = base.init_cache(cfg, 1, prompt_len + 64, jnp.bfloat16)
        t0 = time.perf_counter()
        logits, _ = engine.prefill_chunked(prompt, cache, chunk_size=2048)
        float(logits[0, 0])
        return time.perf_counter() - t0

    run()
    return prompt_len / min(run() for _ in range(2))


def emit(metric, value, unit, baseline):
    line = json.dumps({
        "metric": metric, "value": round(value, 2), "unit": unit,
        "vs_baseline": round(value / baseline, 3)})
    print(line, flush=True)
    return line


# name: (kind, cfg, quant_bits, batch, baseline)
# HEADLINE FIRST: the 4-bit decode axis the reference's table leads with
# (README.md:578, 45 tok/s on M3 Max). A driver timeout trims the tail,
# never the head. Pipeline (non-LLM) rows are interleaved EARLY so the
# driver's unknown kill deadline still captures ASR/TTS/image evidence
# (round-3 lost them entirely); their bodies live in
# benchmarks/pipelines_bench.py and print their own baselined JSON line.
METRICS = {
    "qwen3_4b_w4a8_decode": ("decode", QWEN3_4B, 4, 1, 45.0),
    # Paraformer-large ASR RTF vs 18x real-time (reference README.md:583)
    "paraformer_large_rtf": ("pipeline", "paraformer", None, None, None),
    "qwen3_4b_bf16_decode": ("decode", QWEN3_4B, None, 1, 45.0),
    # Qwen3-TTS talker ms/frame vs 35ms @12Hz (reference README.md:586)
    "qwen3_tts_1p7b_ms_per_frame": ("pipeline", "tts", None, None, None),
    # batched serving axis: channelwise w8a8 (XLA int8 MXU matmul) at B=8.
    # baseline = 8 reference decode streams (8 x 45); bf16 B=8 measured
    # 644-694 aggregate this round — w8a8 beats it at 1122 (round-3 run).
    "qwen3_4b_w8a8_b8_decode": ("decode_ch8", QWEN3_4B, 8, 8, 360.0),
    # FLUX.2-klein 1024px 4-step vs ~5 s/image (reference README.md:589)
    "flux_klein_1024px_s_per_image": ("pipeline", "flux", None, None, None),
    # MoE decode via gather_qmm + sorted dispatch (VERDICT r4 #4):
    # deepseek-ocr2 3B-A570M decoder vs the 25-45 tok/s reference MoE class
    "deepseek_ocr2_moe_w4_decode": ("pipeline", "moe4", None, None, None),
    # Qwen3-ASR 0.6B RTF vs 50x real-time (reference README.md:585)
    "qwen3_asr_0p6b_rtf": ("pipeline", "asr", None, None, None),
    # GPT-SoVITS voice-clone RTF vs 4x real-time (reference README.md:587)
    "gpt_sovits_clone_rtf": ("pipeline", "sovits", None, None, None),
    # same serving config over the PAGED pool + fused Pallas decode
    # attention (ops/paged_attention.py): attention streams only written
    # pages, one pass over K/V
    "qwen3_4b_w8a8_b8_paged_decode": ("decode_ch8_paged", QWEN3_4B, 8, 8,
                                      360.0),
    "mistral_7b_w4a8_decode": ("decode", MISTRAL_7B, 4, 1, 82.8),
    "glm4_9b_w4a8_decode": ("decode", GLM4_9B, 4, 1, 35.0),
    # Z-Image Turbo 1024px 9-step vs ~3 s/image (reference README.md:588);
    # 1024px has crashed the remote compile helper before (infra) — the
    # bench body composes per-step jits, and any error is recorded as a row
    "zimage_1024px_s_per_image": ("pipeline", "zimage", None, None, None),
    # prefill axis (round-3): no published reference prefill figure exists;
    # baseline is the reference's decode rate (prefill is strictly faster
    # than decode per token, so >1.0 here is a floor, not an achievement —
    # the absolute tok/s is the number that matters)
    "qwen3_4b_bf16_prefill_8k": ("prefill", QWEN3_4B, None, 8192, 45.0),
    # 32k long-context prefill: flash continuation chunks end to end (the
    # dense kv_limit path spilled f32 scores and could not reach this
    # length); same floor-style baseline as the 8k row
    "qwen3_4b_bf16_prefill_32k": ("prefill", QWEN3_4B, None, 32768, 45.0),
}

HEADLINE = "qwen3_4b_w4a8_decode"
# per-metric budget: ~2min tunnel HBM-release retry + 30-90s remote compile
# + params init + timed runs (measured r3: bf16 4B needs >420s cold; warm
# server-side compile cache cuts this to ~2-3min)
PER_METRIC_TIMEOUT_S = 900
# the headline's Pallas quant kernels compile several shapes remotely;
# measured COLD it exceeds 900s (r3 validation run) and on a slow-service
# day exceeded 3000s (r5, 2026-08-19), so it gets a larger budget — and if
# it still times out, it is retried once at the END of the run, where the
# server-side compile cache warmed by the first attempt makes the retry
# cheap.
HEADLINE_TIMEOUT_S = 2400
# overall budget: once spent, remaining metrics are skipped (not timed out)
# so the run always ends cleanly with the headline re-printed last
# (raised r5: 15 metrics now; the all_results + headline-reprint contract
# keeps any driver kill point safe regardless)
TOTAL_BUDGET_S = 4500


def _tunnel_alive(timeout_s: int = 240) -> bool:
    """One trivial device op in a subprocess. The remote compile service
    has been observed to wedge (even trivial ops hang) after a bad client;
    in that state every metric would burn its full timeout, so probe up
    front — but a wedge sometimes RECOVERS (a >5h wedge did), so the
    caller keeps re-probing rather than failing fast."""
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "print(float(jnp.dot(x, x)[0, 0]))")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# keep probing a wedged tunnel this long before giving up: wedges have been
# observed to recover (round-3: >5h wedge recovered); round-4 gave up after
# 2 probes (~9 min) with its budget unspent and lost every number.
PROBE_BUDGET_S = 2400
PROBE_RETRY_SLEEP_S = 180


def main():
    """Each metric runs in its own subprocess: model buffers don't free
    reliably within one process (jit static-arg caches pin them). The child
    handles tunnel HBM-release lag itself by poll-retrying its first
    allocation, so the parent never sleeps."""
    probe_start = time.monotonic()
    attempt = 0
    while not _tunnel_alive():
        attempt += 1
        waited = time.monotonic() - probe_start
        print(json.dumps({"metric": "tunnel_probe",
                          "error": f"probe {attempt} hung "
                                   f"({int(waited)}s elapsed); retrying"}),
              flush=True)
        if waited > PROBE_BUDGET_S:
            for name in METRICS:
                print(json.dumps(
                    {"metric": name,
                     "error": f"device tunnel unresponsive for "
                              f"{int(waited)}s ({attempt} probes)"}),
                    flush=True)
            return
        time.sleep(PROBE_RETRY_SLEEP_S)
    results = {}
    t_start = time.monotonic()

    def _run_metric(name, settle=True):
        budget = HEADLINE_TIMEOUT_S if name == HEADLINE \
            else PER_METRIC_TIMEOUT_S
        try:
            r = subprocess.run([sys.executable, __file__, "--metric", name],
                               capture_output=True, text=True,
                               timeout=budget,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")), None)
        except subprocess.TimeoutExpired:
            line, r = None, None
            # the killed child may leave remote compiles in flight and its
            # HBM held ~1-2 min; launching the next child immediately has
            # been observed to FAILED_PRECONDITION mid-run (r3 validation),
            # so let the tunnel settle first — unless no further child will
            # launch (settle=False on the final end-of-run retry), where
            # sleeping only risks losing the summary prints to a driver kill
            if settle:
                time.sleep(120)
        if line:
            results[name] = line
            print(line, flush=True)
        else:
            err = r.stderr.strip()[-200:] if r else "metric timeout"
            print(json.dumps({"metric": name, "error": err}), flush=True)

    def _print_summary():
        # compact cumulative all-rows summary: ONE line, reprinted after
        # every metric so any driver kill point preserves every completed
        # row in the recorded tail (round-3 lost 5 of 8 rows to a kill)
        summary = {}
        for name, line in results.items():
            try:
                d = json.loads(line)
                summary[name] = {"value": d.get("value"),
                                 "vs_baseline": d.get("vs_baseline")}
            except (ValueError, KeyError):
                pass
        print(json.dumps({"metric": "all_results", "results": summary}),
              flush=True)

    for name in METRICS:
        if name != HEADLINE and \
                time.monotonic() - t_start > TOTAL_BUDGET_S:
            print(json.dumps({"metric": name, "error": "skipped: budget"}),
                  flush=True)
            continue
        _run_metric(name)
        _print_summary()
        # re-print the headline after EVERY metric: the driver records only
        # a short tail of stdout and parses its last JSON line, and it may
        # kill this process at an unknown deadline — this way the last line
        # is the headline at ANY kill point after the first metric lands
        if HEADLINE in results and name != HEADLINE:
            print(results[HEADLINE], flush=True)
    # the headline must never be the row that's missing: if its first
    # (cold-compile) attempt timed out, retry once now — the remote compile
    # cache it warmed makes the second attempt minutes, not half an hour.
    # This retry deliberately runs PAST TOTAL_BUDGET_S (worst case ~+1800s):
    # it relies on the driver-kill + headline-tagged-last-line contract
    # rather than an internal deadline. Print a headline-tagged status line
    # FIRST so that if the driver kills us mid-retry, the last JSON line is
    # still headline-tagged (not the previous metric's row).
    if HEADLINE not in results:
        print(json.dumps({"metric": HEADLINE,
                          "error": "cold-compile timeout; retrying"}),
              flush=True)
        _run_metric(HEADLINE, settle=False)
    _print_summary()
    if HEADLINE in results:
        print(results[HEADLINE], flush=True)


def run_one(name: str):
    kind, cfg, bits, arg, baseline = METRICS[name]
    if kind == "pipeline":
        # non-LLM pipeline rows: bodies live in benchmarks/pipelines_bench
        # (cfg holds the BENCHES key); they print their own baselined line
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import pipelines_bench
        pipelines_bench.BENCHES[cfg]()
    elif kind == "prefill":
        emit(name, prefill_tps(cfg, prompt_len=arg, quant_bits=bits),
             "tokens/sec", baseline)
    elif kind == "prefill_ch8":
        emit(name, prefill_tps(cfg, prompt_len=arg, quant_bits=bits,
                               scheme="channel8"), "tokens/sec", baseline)
    elif kind == "decode_ch8":
        emit(name, decode_tps(cfg, quant_bits=bits, batch=arg,
                              scheme="channel8"), "tokens/sec", baseline)
    elif kind == "decode_ch8_paged":
        emit(name, decode_tps(cfg, quant_bits=bits, batch=arg,
                              scheme="channel8", paged=True),
             "tokens/sec", baseline)
    else:
        emit(name, decode_tps(cfg, quant_bits=bits, batch=arg),
             "tokens/sec", baseline)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--metric":
        run_one(sys.argv[2])
    else:
        main()
