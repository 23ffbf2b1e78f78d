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

    shards, cur, cur_bytes = [], {}, 0
    weight_map: Dict[str, str] = {}
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
        nbytes = np_arr.nbytes
        if cur_bytes + nbytes > MAX_SHARD_BYTES and cur:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[out_name] = np_arr
        cur_bytes += nbytes
    if cur:
        shards.append(cur)

    n = len(shards)
    for i, shard in enumerate(shards):
        fname = (f"model-{i + 1:05d}-of-{n:05d}.safetensors"
                 if n > 1 else "model.safetensors")
        save_file(shard, os.path.join(out_dir, fname))
        for k in shard:
            weight_map[k] = fname
    if n > 1:
        with open(os.path.join(out_dir,
                               "model.safetensors.index.json"), "w") as f:
            json.dump({"weight_map": weight_map}, f)


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
