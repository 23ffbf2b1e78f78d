"""Checkpoint loading: HF config.json + (sharded) safetensors.

Equivalent of the reference's per-crate ``get_model_args`` (serde on HF
config.json, qwen3-mlx/src/model.rs:509) and
``ModuleParametersExt::load_safetensors`` over the sharded
``model.safetensors.index.json`` (qwen3-mlx/src/model.rs:515-540).

Tensors are loaded host-side then placed on device (optionally with a
NamedSharding so multi-chip placement happens at load, not via resharding).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def load_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def list_safetensor_files(model_dir: str):
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            meta = json.load(f)
        files = sorted(set(meta["weight_map"].values()))
        return [os.path.join(model_dir, f) for f in files]
    single = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(single):
        return [single]
    # fall back to any *.safetensors in dir
    return sorted(
        os.path.join(model_dir, f) for f in os.listdir(model_dir)
        if f.endswith(".safetensors"))


def load_safetensors(model_dir: str,
                     filter_fn: Optional[Callable[[str], bool]] = None,
                     ) -> Dict[str, jax.Array]:
    """Load all safetensors shards into a flat {name: array} dict.

    Uses the flax backend so bf16 tensors round-trip without an fp32 detour.
    """
    from safetensors import safe_open

    out: Dict[str, jax.Array] = {}
    for path in list_safetensor_files(model_dir):
        with safe_open(path, framework="flax") as f:
            for name in f.keys():
                if filter_fn is None or filter_fn(name):
                    out[name] = f.get_tensor(name)
    return out


def torch_to_jnp(t) -> jax.Array:
    """Convert a torch tensor (incl. bf16) to a jnp array, host-side."""
    import torch

    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        return jnp.asarray(t.view(torch.uint16).numpy()).view(jnp.bfloat16)
    return jnp.asarray(t.numpy())


def save_safetensors(path: str, tensors: Dict[str, jax.Array]):
    from safetensors.flax import save_file

    save_file({k: jnp.asarray(v) for k, v in tensors.items()}, path)


# ------------------------------------------------ canonical save / load -----
#
# The reference distributes converted checkpoints per crate; here every
# family can round-trip its param tree through ONE canonical on-disk form
# (flat dotted names in safetensors + config.json), so the registry/server
# can load any modality from a directory (reference README.md:430-470).

def flatten_params(tree, prefix: str = "") -> Dict[str, jax.Array]:
    """Nested dicts/lists of arrays -> flat {dotted.name: array}."""
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        if tree is not None:
            out[prefix.rstrip(".")] = jnp.asarray(tree)
        return out
    for k, v in items:
        out.update(flatten_params(v, f"{prefix}{k}."))
    return out


def unflatten_params(flat: Dict[str, jax.Array]):
    """Inverse of flatten_params. Dict levels whose keys are all integers
    become lists."""
    root: dict = {}
    for name, v in flat.items():
        parts = name.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def fix(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [fix(node[str(i)]) for i in range(len(keys))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_model(model_dir: str, config: dict, params,
               filename: str = "model.safetensors"):
    """Write config.json + the flattened param tree (canonical format)."""
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=1)
    save_safetensors(os.path.join(model_dir, filename),
                     flatten_params(params))


def load_canonical(model_dir: str):
    """-> (config dict, nested params) from the canonical format."""
    return load_config(model_dir), unflatten_params(load_safetensors(model_dir))
