"""OCR a page image or PDF with DeepSeek-OCR2.

Usage:
  python examples/ocr.py --model /path/to/deepseek-ocr2 page.png
  python examples/ocr.py --model /path/to/deepseek-ocr2 doc.pdf --prompt "Free OCR."

Reference surface: deepseek-ocr2-mlx examples (lib.rs pipeline: SAM ->
visual causal flow -> projector -> MoE decode with <image> splicing).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="image (png/jpg) or .pdf")
    ap.add_argument("--model", required=True)
    ap.add_argument("--prompt", default="Free OCR.")
    ap.add_argument("--max-tokens", type=int, default=1024)
    ap.add_argument("--dpi", type=int, default=200)
    args = ap.parse_args()

    from ominix_mlx_tpu.models import registry
    cap, m = registry.load_pipeline(args.model)
    assert hasattr(m, "ocr"), f"{cap!r} model has no OCR capability"

    if args.path.lower().endswith(".pdf"):
        with open(args.path, "rb") as f:
            pages = m.ocr_pdf(f.read(), args.prompt,
                              max_tokens=args.max_tokens, dpi=args.dpi)
        for i, text in enumerate(pages):
            print(f"--- page {i + 1} ---\n{text}")
    else:
        import numpy as np
        from PIL import Image
        img = np.asarray(Image.open(args.path).convert("RGB"),
                         np.float32) / 255.0
        print(m.ocr(img, args.prompt, max_tokens=args.max_tokens))


if __name__ == "__main__":
    main()
