"""GPT-SoVITS voice cloning CLI.

  python examples/voice_clone.py --model /path/to/gpt-sovits \
      --ref ref.wav --text "要合成的文本" --out cloned.wav

Counterpart of the reference VoiceCloner flow (voice_clone.rs:269-780):
reference audio -> HuBERT k-means semantic codes + linear spectrogram,
text -> zh/en frontend phonemes -> T2S -> VITS decoder -> waveform.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="GPT-SoVITS model dir (T2S + VITS + HuBERT)")
    ap.add_argument("--ref", required=True, help="reference wav (3-10s)")
    ap.add_argument("--text", required=True)
    ap.add_argument("--lang", default="auto", choices=["auto", "zh", "en"])
    ap.add_argument("--out", default="cloned.wav")
    ap.add_argument("--play", action="store_true",
                    help="play on the host after writing (reference: cpal stream, voice_clone.rs:1846)")
    ap.add_argument("--max-tokens", type=int, default=600)
    ap.add_argument("--noise-scale", type=float, default=0.5)
    args = ap.parse_args()

    import numpy as np

    from ominix_mlx_tpu.audio import io as audio_io
    from ominix_mlx_tpu.models import gpt_sovits

    cloner = gpt_sovits.load_model(args.model)
    samples, rate = audio_io.load_wav(args.ref)
    cloner.set_reference_audio(np.asarray(samples), rate)
    wav = cloner.synthesize(args.text, lang=args.lang,
                            max_tokens=args.max_tokens,
                            noise_scale=args.noise_scale)
    sr = getattr(cloner.vits_cfg, "sampling_rate", 32000)
    audio_io.save_wav(args.out, np.asarray(wav, np.float32), sr)
    print(f"{len(wav) / sr:.2f}s -> {args.out}")
    if args.play:
        from ominix_mlx_tpu.audio.playback import play
        play(np.asarray(wav, np.float32), sr)


if __name__ == "__main__":
    main()
