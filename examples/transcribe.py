"""ASR CLI — counterpart of qwen3-asr-mlx / funasr-mlx transcribe examples.

Usage:
    python examples/transcribe.py --model /path/to/asr-checkpoint \
        --audio x.wav [--punc /path/to/ct-punc] [--long]

Any registry model exposing ``transcribe(samples, rate)`` works
(paraformer, qwen3-asr, funasr-nano/qwen4b); ``--long`` uses the chunked
long-audio path when the model provides one; ``--translate`` emits English
directly (funasr-qwen4b style one-pass speech translation); ``--punc``
restores punctuation with the CT-Transformer model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--punc", default=None,
                    help="CT-Transformer punctuation model dir")
    ap.add_argument("--long", action="store_true",
                    help="chunked long-audio transcription")
    ap.add_argument("--translate", action="store_true",
                    help="translate speech directly to English "
                         "(models exposing translate())")
    args = ap.parse_args()

    import numpy as np

    from ominix_mlx_tpu.audio.io import load_wav
    from ominix_mlx_tpu.models import registry

    cap, asr = registry.load_pipeline(args.model)
    assert hasattr(asr, "transcribe"), \
        f"{args.model} has no ASR capability (got {cap})"
    samples, rate = load_wav(args.audio, target_rate=16000)
    samples = np.asarray(samples)
    if args.translate:
        assert hasattr(asr, "translate"), \
            f"{args.model} does not support speech translation"
        text = (asr.translate_long(samples, rate)
                if args.long and hasattr(asr, "translate_long")
                else asr.translate(samples, rate))
    elif args.long and hasattr(asr, "transcribe_long"):
        text = asr.transcribe_long(samples, rate)
    else:
        text = asr.transcribe(samples, rate)
    if args.punc:
        from ominix_mlx_tpu.models.punctuation import PunctuationModel
        text = PunctuationModel.load(args.punc).punctuate(text)
    print(text)


if __name__ == "__main__":
    main()
