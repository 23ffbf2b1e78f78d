"""Per-stage budget of ONE w4a8 decode step (VERDICT r3 weak-#2).

Traces a generate_scan decode loop with jax.profiler through the device
tunnel, parses the trace.json.gz device events directly (TensorBoard not
needed), and prints:

  - the top ops by total device time, with per-token us
  - a category rollup (quant matmuls / attention / lm_head / norms+rope /
    sampling / other) so the headline gap (178.8 tok/s measured vs ~360
    roofline for a 2.27 GB/token 4-bit stream) is attributed, not guessed

Usage: python benchmarks/decode_profile.py [--steps 32] [--bits 4]
       [--scheme group] [--batch 1] [--cache 1024] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/decode_trace"


def build(cfg_name, bits, scheme, batch):
    import bench
    from ominix_mlx_tpu.core.generate import Engine
    from ominix_mlx_tpu.core.sampling import SamplerConfig
    from ominix_mlx_tpu.models import base

    cfg = getattr(bench, cfg_name)
    if bits:
        params = base.init_quantized_params(cfg, jax.random.PRNGKey(0), 64,
                                            bits, batched=batch > 1,
                                            scheme=scheme)
    else:
        params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    params = base.fuse_layer_projections(params)
    engine = Engine(
        lambda p, t, c: base.forward(p, cfg, t, c), params, SamplerConfig(),
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, cfg, t, c, fresh_prefill=True))
    return cfg, params, engine


def device_events(trace_dir):
    """All complete ('X') events from device-side tracks of every
    trace.json.gz under trace_dir, as (name, dur_us) pairs.

    The profile plugin writes one trace.json.gz per host; device lanes are
    the processes whose name mentions the accelerator (e.g. '/device:TPU:0'
    or 'TPU:0 ...'); host python/runtime lanes are excluded so only real
    on-device op durations are summed."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {trace_dir}"
    out = []
    for path in paths:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        # map pid -> process name from metadata events
        pname = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pname[ev["pid"]] = ev.get("args", {}).get("name", "")
        dev_pids = {pid for pid, n in pname.items()
                    if "TPU" in n.upper() or "device" in n.lower()}
        for ev in events:
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                out.append((ev.get("name", "?"), float(ev.get("dur", 0.0)),
                            float(ev.get("ts", 0.0))))
    return out


def inscan_only(evs):
    """Keep only leaf events that fall inside the LONGEST while-loop
    container window — the decode scan. Strips prefill/init one-offs so
    the rollup attributes decode-only time."""
    whiles = [(ts, ts + dur) for name, dur, ts in evs
              if name.lower().startswith("while") and dur > 0]
    if not whiles:
        return evs
    lo, hi = max(whiles, key=lambda w: w[1] - w[0])
    return [(n, d, ts) for n, d, ts in evs if lo <= ts and ts + d <= hi]


CATEGORIES = [
    # (label, substrings matched against the op name, lowercased)
    ("quant_matmul", ("qmm", "quant", "pallas", "custom-call")),
    ("attention", ("attention", "softmax", "flash", "sdpa")),
    ("matmul/dot", ("dot", "gemm", "convolution")),
    ("gather/scatter", ("gather", "scatter", "dynamic-update", "dynamic_")),
    ("sort/top-k", ("sort", "top-k", "topk")),
    ("fusion", ("fusion",)),
    ("copy/transpose", ("copy", "transpose", "bitcast", "reshape")),
    ("collective", ("all-reduce", "all-gather", "reduce-scatter")),
]


def categorize(name):
    low = name.lower()
    for label, keys in CATEGORIES:
        if any(k in low for k in keys):
            return label
    return "other"


def is_container(name):
    """Module/control-flow container events whose duration INCLUDES their
    children (XLA Modules lane 'jit_*' entries, HLO while/conditional
    wrappers). Summing them double-counts every leaf op, so they are
    excluded from totals and the rollup (still shown in the top list,
    tagged)."""
    low = name.lower()
    return (low.startswith("jit_") or low.startswith("while")
            or low.startswith("conditional") or low.startswith("call."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--scheme", default="group")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cache", type=int, default=1024)
    ap.add_argument("--cfg", default="QWEN3_4B")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--inscan", action="store_true",
                    help="roll up only events inside the decode scan window")
    args = ap.parse_args()

    from ominix_mlx_tpu.models import base

    bits = args.bits if args.bits > 0 else None
    cfg, params, engine = build(args.cfg, bits, args.scheme, args.batch)
    prompt = jnp.ones((args.batch, 128), jnp.int32)

    def run(n):
        cache = base.init_cache(cfg, args.batch, args.cache, jnp.bfloat16)
        t0 = time.perf_counter()
        toks, _ = engine.generate_scan(prompt, cache, max_tokens=n)
        int(toks[0, -1])
        return time.perf_counter() - t0

    run(args.steps)                        # compile + warm
    t_warm = run(args.steps)
    print(f"warm scan({args.steps}): {t_warm * 1e3:.1f} ms "
          f"({args.steps / t_warm:.1f} tok/s incl. prefill+dispatch)",
          flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    t_traced = run(args.steps)
    jax.profiler.stop_trace()
    print(f"traced scan({args.steps}): {t_traced * 1e3:.1f} ms", flush=True)

    evs = device_events(TRACE_DIR)
    if args.inscan:
        evs = inscan_only(evs)
    by_name = collections.defaultdict(lambda: [0.0, 0])
    for name, dur, _ in evs:
        agg = by_name[name]
        agg[0] += dur
        agg[1] += 1
    total = sum(v[0] for n, v in by_name.items() if not is_container(n))
    print(f"\ndevice total (leaf ops): {total / 1e3:.2f} ms "
          f"({total / args.steps:.0f} us/token over {args.steps} steps, "
          f"{len(evs)} events)\n")
    print(f"{'us/tok':>8} {'count':>6}  name")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    for name, (dur, cnt) in rows[:args.top]:
        tag = " [container]" if is_container(name) else ""
        print(f"{dur / args.steps:8.1f} {cnt:6d}  {name[:100]}{tag}")

    cats = collections.defaultdict(float)
    for name, (dur, _) in by_name.items():
        if not is_container(name):
            cats[categorize(name)] += dur
    print("\ncategory rollup (us/token, leaf ops only):")
    for label, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {label:16s} {dur / args.steps:8.1f}  "
              f"({100 * dur / total:4.1f}%)")


if __name__ == "__main__":
    main()
