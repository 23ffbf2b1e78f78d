"""Text-to-speech synthesis CLI.

  python examples/speak.py --model /path/to/qwen3-tts \
      --text "你好世界" --voice vivian --out out.wav

Counterpart of reference qwen3-tts-mlx synthesize examples (lib.rs:219).
Any registry model exposing ``synthesize(text, voice=None)`` works.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--voice", default=None)
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("--play", action="store_true",
                    help="play on the host after writing (reference: cpal stream, voice_clone.rs:1846)")
    ap.add_argument("--speed", type=float, default=1.0,
                    help="WSOLA time-stretch factor")
    args = ap.parse_args()

    import numpy as np

    from ominix_mlx_tpu.audio import io as audio_io
    from ominix_mlx_tpu.models import registry

    cap, tts = registry.load_pipeline(args.model)
    assert hasattr(tts, "synthesize"), \
        f"{args.model} has no TTS capability (got {cap})"
    samples, rate = tts.synthesize(args.text, voice=args.voice)
    samples = np.asarray(samples, np.float32)
    if args.speed != 1.0:
        from ominix_mlx_tpu.audio.dsp import wsola_time_stretch
        samples = np.asarray(wsola_time_stretch(samples, rate, args.speed))
    audio_io.save_wav(args.out, samples, rate)
    print(f"{len(samples) / rate:.2f}s -> {args.out}")
    if args.play:
        from ominix_mlx_tpu.audio.playback import play
        play(samples, rate)


if __name__ == "__main__":
    main()
