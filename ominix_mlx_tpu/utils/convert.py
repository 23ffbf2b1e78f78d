"""Checkpoint conversion: PyTorch .bin/.pth -> safetensors, with renames.

Counterpart of the reference's ``convert`` feature (mlx-rs-core/src/
convert.rs:61-381, candle-based) and the per-crate convert_*.py scripts.
Uses torch (CPU) for unpickling and writes sharded safetensors.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np

MAX_SHARD_BYTES = 4 * 1024 ** 3


def _write_shards(out_dir: str, tensors: dict, save_fn) -> None:
    """Pack ``tensors`` into <=MAX_SHARD_BYTES shards and ALWAYS write
    model.safetensors.index.json (even single-shard): the loader prefers
    the index, so a fresh index also neutralizes any stale one left from a
    previous multi-shard layout in the same directory."""
    shards, cur, cur_bytes = [], {}, 0
    for k, v in tensors.items():
        nbytes = int(np.asarray(v).nbytes)
        if cur_bytes + nbytes > MAX_SHARD_BYTES and cur:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += nbytes
    if cur:
        shards.append(cur)
    n = len(shards)
    weight_map: Dict[str, str] = {}
    for i, shard in enumerate(shards):
        fname = (f"model-{i + 1:05d}-of-{n:05d}.safetensors"
                 if n > 1 else "model.safetensors")
        save_fn(os.path.join(out_dir, fname), shard)
        for k in shard:
            weight_map[k] = fname
    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"weight_map": weight_map}, f)


def convert_torch_checkpoint(src_path: str, out_dir: str,
                             rename: Optional[Callable[[str], str]] = None,
                             dtype: Optional[str] = None):
    """Load a torch .bin/.pth state dict and write safetensors shards.

    rename: optional name-mapping fn (the reference's WeightMapping).
    dtype: optional cast ("float16"/"bfloat16"/"float32").
    """
    import torch
    from safetensors.numpy import save_file

    sd = torch.load(src_path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise ValueError("expected a state dict")
    os.makedirs(out_dir, exist_ok=True)

    tensors = {}
    for name, t in sd.items():
        out_name = rename(name) if rename else name
        if out_name is None:
            continue
        arr = t.detach().to(getattr(torch, dtype) if dtype else t.dtype)
        if arr.dtype == torch.bfloat16:
            np_arr = arr.view(torch.uint16).numpy()
            # safetensors.numpy writes raw; tag bf16 via ml_dtypes round-trip
            import ml_dtypes
            np_arr = np_arr.view(ml_dtypes.bfloat16)
        else:
            np_arr = arr.numpy()
        tensors[out_name] = np_arr
    _write_shards(out_dir, tensors, lambda p, t: save_file(t, p))


def save_quantized(model_dir: str, out_dir: str, bits: int = 4,
                   group_size: int = 64,
                   predicate: Optional[Callable[[str], bool]] = None):
    """Quantize an on-disk checkpoint to the MLX group-quant layout
    (reference save-quantized flow, minicpm-sala-mlx
    examples/save_quantized.rs): every eligible 2-D ``*.weight`` becomes
    {weight (packed u32), scales, biases} and config.json gains a
    ``quantization`` block, so ``registry.load_model(out_dir)`` serves it
    through the Pallas quantized kernels with no further conversion.

    Eligible = 2-D, name not containing "norm", in_features divisible by
    ``group_size`` (embeddings included: tied lm_heads read the embedding
    as a linear, and the loader's per-tensor ``.scales`` sniffing keeps
    mixed-precision checkpoints loadable). ``predicate(name)`` narrows the
    set further (e.g. VLMs quantize the LLM but keep vision towers dense,
    reference moxin-vlm lib.rs:366-383)."""
    import shutil

    import jax.numpy as jnp

    from ominix_mlx_tpu.core import quant
    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              save_safetensors)

    cfg = load_config(model_dir)
    flat = load_safetensors(model_dir)
    out: Dict[str, "np.ndarray"] = {}
    n_q = 0
    for k, v in flat.items():
        ok = (k.endswith(".weight") and getattr(v, "ndim", 0) == 2
              and "norm" not in k.lower()
              and v.shape[1] % group_size == 0
              and (predicate is None or predicate(k)))
        if not ok:
            out[k] = v
            continue
        packed, scales, biases = quant.quantize(
            jnp.asarray(v), group_size, bits)
        stem = k[:-len(".weight")]
        out[k] = packed
        out[stem + ".scales"] = scales
        out[stem + ".biases"] = biases
        n_q += 1
    os.makedirs(out_dir, exist_ok=True)
    _write_shards(out_dir, out, save_safetensors)
    cfg = dict(cfg)
    cfg["quantization"] = {"group_size": group_size, "bits": bits}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    # carry tokenizer/config side files over verbatim (no-op in-place)
    skip_suffixes = (".safetensors", ".bin", ".pth", ".pt")
    for name in os.listdir(model_dir):
        src = os.path.join(model_dir, name)
        dst = os.path.join(out_dir, name)
        if (not os.path.isfile(src) or name == "config.json"
                or name == "model.safetensors.index.json"
                or name.endswith(skip_suffixes)
                or os.path.abspath(src) == os.path.abspath(dst)):
            continue
        shutil.copy2(src, dst)
    return n_q


PARAFORMER_RENAMES = {
    # reference convert.rs:253-381 Paraformer mapping table (subset; the
    # mapping is completed when checkpoints are wired)
    "encoder.encoders0.0.": "first_layer.",
    "encoder.encoders.": "layers.",
    "predictor.cif_conv1d.": "predictor.conv.",
    "predictor.cif_output.": "predictor.output_proj.",
    "decoder.decoders.": "dec_layers.",
    "decoder.after_norm.": "dec_after_norm.",
    "decoder.output_layer.": "output_layer.",
}


def paraformer_rename(name: str) -> str:
    for old, new in PARAFORMER_RENAMES.items():
        if name.startswith(old):
            return new + name[len(old):]
    return name


def main():
    import argparse

    # conversion is offline host work: keep it off the accelerator (the
    # sitecustomize-pinned platform would route every quantize through the
    # device tunnel at ~25ms/dispatch)
    import jax
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(
        description="checkpoint conversion: torch->safetensors, "
                    "--quantize an HF/MLX safetensors dir, or --verify a "
                    "checkpoint dir (name map + forward + HF logit parity)")
    ap.add_argument("src", help=".bin/.pth file, or model dir w/ "
                               "--quantize/--verify")
    ap.add_argument("out", nargs="?", default=None,
                    help="output directory (conversion modes)")
    ap.add_argument("--quantize", action="store_true",
                    help="group-quantize a safetensors checkpoint dir to "
                         "the MLX layout (loadable by registry.load_model)")
    ap.add_argument("--verify", action="store_true",
                    help="run the real-checkpoint parity harness "
                         "(utils/verify.py): load via the family name map, "
                         "forward, compare logits vs transformers; skips "
                         "cleanly when the checkpoint is absent")
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--group-size", type=int, default=64)
    ap.add_argument("--dtype", default=None,
                    help="cast during torch conversion")
    args = ap.parse_args()
    if args.verify:
        from ominix_mlx_tpu.utils.verify import main as verify_main
        raise SystemExit(verify_main([args.src]))
    if args.out is None:
        ap.error("out directory required for conversion modes")
    if args.quantize:
        n = save_quantized(args.src, args.out, bits=args.bits,
                           group_size=args.group_size)
        print(f"quantized {n} tensors -> {args.out}")
    else:
        convert_torch_checkpoint(args.src, args.out, dtype=args.dtype)


if __name__ == "__main__":
    main()
