"""Step-Audio-2 speech-to-speech CLI.

  python examples/speech_chat.py --model /path/to/step-audio2 \
      --audio question.wav --mode with_tts --out reply.wav

Counterpart of reference step-audio2-mlx pipeline presets
(pipeline.rs:43-108): speech in -> understanding LLM (optional think /
tool-call postprocessing) -> flow-matching mel + HiFiGAN speech out.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--mode", default="asr_only",
                    choices=["asr_only", "with_think", "with_tools",
                             "with_tts"])
    ap.add_argument("--out", default="reply.wav")
    ap.add_argument("--max-tokens", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from ominix_mlx_tpu.audio import io as audio_io
    from ominix_mlx_tpu.audio.dsp import apply_lfr, log_mel_spectrogram
    from ominix_mlx_tpu.models import step_audio2
    from ominix_mlx_tpu.utils.tokenizer import Tokenizer

    pipe = step_audio2.load_model(args.model)
    pipe.mode = args.mode
    tok = Tokenizer(args.model)

    samples, rate = audio_io.load_wav(args.audio, target_rate=16000)
    ecfg = pipe.asr.enc_cfg
    mel = log_mel_spectrogram(jnp.asarray(np.asarray(samples)), 400, 160,
                              ecfg.n_mels, 16000)
    feats = apply_lfr(mel, ecfg.lfr_m, ecfg.lfr_n)[None]
    prefix = tok.encode("<|im_start|>user\n", add_special_tokens=False)
    suffix = tok.encode("<|im_end|>\n<|im_start|>assistant\n",
                        add_special_tokens=False)
    stops = ({tok.eos_token_id} if tok.eos_token_id is not None else set())
    toks = pipe.respond_tokens(feats, prefix, suffix,
                               max_tokens=args.max_tokens,
                               stop_tokens=tuple(stops))
    text = tok.decode(toks)
    text, calls = pipe.postprocess(text)
    print("response:", text)
    for c in calls:
        print("tool call:", c)

    if args.mode == "with_tts" and pipe.flow_params is not None:
        mel = log_mel_spectrogram(jnp.asarray(np.asarray(samples)),
                                  400, 160, 128, 16000)
        codes = pipe.tokenize_speech(mel[None])
        wav = pipe.speak(codes)
        audio_io.save_wav(args.out, wav, 24000)
        print(f"{len(wav) / 24000:.2f}s -> {args.out}")


if __name__ == "__main__":
    main()
