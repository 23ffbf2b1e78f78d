"""ASR CLI — counterpart of qwen3-asr-mlx / funasr-mlx transcribe examples.

Usage:
    python examples/transcribe.py --model /path/to/qwen3-asr --audio x.wav
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--language", default=None)
    ap.add_argument("--max-tokens", type=int, default=256)
    args = ap.parse_args()

    from ominix_mlx_tpu.audio.io import load_wav
    from ominix_mlx_tpu.utils.loading import load_config

    samples, rate = load_wav(args.audio, target_rate=16000)
    raw = load_config(args.model)
    mt = raw.get("model_type", "qwen3_asr")
    if "paraformer" in mt:
        print("Paraformer path: models/paraformer.transcribe_logits "
              "(weights loader pending checkpoint availability)",
              file=sys.stderr)
        return
    from ominix_mlx_tpu.models import qwen3_asr
    from ominix_mlx_tpu.utils.tokenizer import Tokenizer

    tok = Tokenizer(args.model)
    # full checkpoint wiring: encoder + LLM weights from the same dir
    raise SystemExit("qwen3-asr checkpoint loading requires model weights; "
                     "see models/qwen3_asr.Qwen3ASR for the API")


if __name__ == "__main__":
    main()
