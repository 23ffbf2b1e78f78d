"""Text generation CLI — counterpart of the reference's per-crate generate
examples (qwen3-mlx/examples/generate_qwen3.rs).

Usage:
    python examples/generate.py --model /path/to/checkpoint \
        --prompt "Hello" --max-tokens 256 [--temperature 0.7] [--quantize q8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF checkpoint dir")
    ap.add_argument("--prompt", default="Hello")
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--quantize", choices=["none", "q4", "q8"], default="none",
                    help="on-the-fly weight quantization (reference: "
                         "load_model_quantized)")
    ap.add_argument("--chat", action="store_true",
                    help="wrap the prompt with the model chat template")
    ap.add_argument("--draft-model", default=None,
                    help="small same-vocab checkpoint for speculative "
                         "decoding (greedy; on-device round loop)")
    ap.add_argument("--draft-tokens", type=int, default=4)
    args = ap.parse_args()

    from ominix_mlx_tpu.core.generate import Engine, GenerationStats
    from ominix_mlx_tpu.core.sampling import SamplerConfig
    from ominix_mlx_tpu.models import base, registry
    from ominix_mlx_tpu.utils.tokenizer import Tokenizer

    mod, params, cfg = registry.load_model(args.model)
    if args.quantize != "none":
        params = base.quantize_params(params, 64,
                                      4 if args.quantize == "q4" else 8)
    tok = Tokenizer(args.model)
    text = (tok.apply_chat_template([{"role": "user", "content": args.prompt}])
            if args.chat else args.prompt)
    ids = tok.encode(text)

    stats = GenerationStats()
    stops = {tok.eos_token_id} if tok.eos_token_id is not None else set()

    if args.draft_model:
        # speculative decoding: draft proposes, target verifies; the whole
        # round loop runs on device (core/speculative.py generate_scan)
        from ominix_mlx_tpu.core.speculative import (SpecStats,
                                                     SpeculativeEngine)
        dmod, dparams, dcfg = registry.load_model(args.draft_model)
        spec = SpeculativeEngine(
            lambda p, t, c: mod.forward(p, cfg, t, c), params,
            lambda p, t, c: dmod.forward(p, dcfg, t, c), dparams,
            num_draft_tokens=args.draft_tokens)
        cap = len(ids) + args.max_tokens + 2 * args.draft_tokens + 8
        st = SpecStats()
        t0 = time.time()
        out, _ = spec.generate_scan(
            jnp.asarray(ids), mod.init_cache(cfg, 1, cap, jnp.bfloat16),
            dmod.init_cache(dcfg, 1, cap, jnp.bfloat16),
            max_tokens=args.max_tokens, stop_tokens=tuple(stops), stats=st)
        dt = time.time() - t0
        print(tok.decode(out))
        print(f"\n-- speculative: {len(out)} tok in {dt:.2f}s "
              f"({len(out) / dt:.1f} tok/s), acceptance "
              f"{st.acceptance_rate:.2f}", file=sys.stderr)
        return

    engine = Engine(
        lambda p, t, c: mod.forward(p, cfg, t, c), params,
        SamplerConfig(temperature=args.temperature, top_k=args.top_k,
                      top_p=args.top_p),
        prefill_forward_fn=lambda p, t, c: mod.forward(
            p, cfg, t, c, fresh_prefill=True))
    cache = mod.init_cache(cfg, 1, len(ids) + args.max_tokens + 8,
                           jnp.bfloat16)
    out = []
    printed = ""
    for t in engine.generate(jnp.asarray(ids), cache, args.max_tokens,
                             tuple(stops), stats=stats):
        out.append(t)
        if len(out) % 10 == 0:   # decode every 10 tokens (reference example)
            full = tok.decode(out)
            print(full[len(printed):], end="", flush=True)
            printed = full
    print(tok.decode(out)[len(printed):])
    print(f"\n-- prefill {stats.prompt_tokens} tok "
          f"({stats.prefill_tps:.0f} tok/s); decode {stats.generated_tokens} "
          f"tok ({stats.decode_tps:.1f} tok/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
