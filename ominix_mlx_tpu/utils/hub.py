"""Model distribution: local model-dir convention + optional HF Hub pulls.

Counterpart of the reference's distribution story (README.md:430-470):
``~/.OminiX/models/`` convention via the hf-hub crate + server-side
download/delete endpoints. Here: ``$OMINIX_MODELS_DIR`` (default
``~/.ominix/models``); downloads go through huggingface_hub when installed
AND the environment has egress — otherwise a clear error, never a hang.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional


def models_dir() -> str:
    d = os.environ.get("OMINIX_MODELS_DIR",
                       os.path.expanduser("~/.ominix/models"))
    os.makedirs(d, exist_ok=True)
    return d


def model_path(name: str) -> str:
    """Resolve a model name/repo-id to a local dir."""
    if os.path.isdir(name):
        return name
    return os.path.join(models_dir(), name.replace("/", "--"))


def list_models() -> List[dict]:
    out = []
    base = models_dir()
    for entry in sorted(os.listdir(base)):
        p = os.path.join(base, entry)
        if not os.path.isdir(p):
            continue
        size = sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(p) for f in fs)
        out.append({"id": entry.replace("--", "/"), "path": p,
                    "size_bytes": size,
                    "has_config": os.path.exists(os.path.join(p,
                                                              "config.json"))})
    return out


def download_model(repo_id: str, revision: Optional[str] = None) -> str:
    """Pull a checkpoint from the HF Hub into the models dir."""
    target = model_path(repo_id)
    if os.path.exists(os.path.join(target, "config.json")):
        return target
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise RuntimeError(
            "huggingface_hub is not installed; place checkpoints under "
            f"{models_dir()} manually") from e
    snapshot_download(repo_id, revision=revision, local_dir=target,
                      allow_patterns=["*.safetensors", "*.json", "*.txt",
                                      "*.model"])
    return target


def delete_model(name: str) -> bool:
    """Delete a managed model dir. Only names strictly inside models_dir()
    are deletable: paths are canonicalized before comparison (the reference
    server does the same, server.rs:686-692) and separators / parent
    references are rejected outright."""
    if "\\" in name or ".." in name:
        return False
    name = name.replace("/", "--")  # hub repo-id convention
    if "/" in name:
        return False
    p = os.path.realpath(os.path.join(models_dir(), name))
    root = os.path.realpath(models_dir())
    if not os.path.isdir(p) or p == root:
        return False
    if os.path.commonpath([p, root]) != root:
        return False
    shutil.rmtree(p)
    return True
