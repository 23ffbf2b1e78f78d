"""Prepare a GPT-SoVITS training dataset from raw recordings.

slice -> (denoise) -> transcribe -> train.list
(reference gpt-sovits-mlx/examples/{preprocess.rs, preprocess_audio.rs}).

  python examples/preprocess_dataset.py raw_dir/ data/ \
      [--denoise] [--asr path/to/paraformer] [--language zh]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input_dir")
    ap.add_argument("output_dir")
    ap.add_argument("--denoise", action="store_true")
    ap.add_argument("--asr", default=None,
                    help="ASR model dir (loaded via the registry); omit to "
                         "leave transcripts empty for manual labeling")
    ap.add_argument("--language", default="zh")
    ap.add_argument("--speaker", default="speaker")
    ap.add_argument("--min-length-ms", type=int, default=5000)
    args = ap.parse_args()

    from ominix_mlx_tpu.audio.preprocess import (PreprocessPipeline, Slicer,
                                                 SlicerConfig)

    transcriber = None
    if args.asr:
        from ominix_mlx_tpu.models import registry
        cap, transcriber = registry.load_pipeline(args.asr)
        assert hasattr(transcriber, "transcribe"), \
            f"{args.asr} has no ASR capability (got {cap})"

    pipe = PreprocessPipeline(
        transcriber=transcriber,
        slicer=Slicer(SlicerConfig(min_length_ms=args.min_length_ms)),
        enable_denoise=args.denoise,
        language=args.language, speaker=args.speaker)
    results = pipe.process_directory(args.input_dir, args.output_dir)
    lst = os.path.join(args.output_dir, "train.list")
    pipe.write_transcript_list(results, lst)
    print(f"{len(results)} chunks -> {lst}")


if __name__ == "__main__":
    main()
