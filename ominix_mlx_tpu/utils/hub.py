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


def download_model(repo_id: str, revision: Optional[str] = None,
                   sha256: Optional[str] = None) -> str:
    """Pull a checkpoint into the models dir.

    ``repo_id`` is either an HF Hub repo id (goes through huggingface_hub —
    needs egress) or a direct ``http(s)://...tar[.gz]`` archive URL (plain
    urllib — works against any mirror/artifact store, testable offline).
    ``sha256`` pins archive-URL downloads; plain-http URLs REQUIRE it (no
    transport integrity without TLS)."""
    if repo_id.startswith(("http://", "https://")):
        if repo_id.startswith("http://") and sha256 is None:
            raise RuntimeError(
                "plain-http model archives require a sha256 pin")
        return _download_archive(repo_id, sha256=sha256)
    target = model_path(repo_id)
    if os.path.exists(os.path.join(target, "config.json")):
        return target
    if os.environ.get("OMINIX_HF_ENDPOINT") or os.environ.get("HF_ENDPOINT"):
        # custom endpoint (mirror / mock): use the plain REST resolver so
        # the repo-id -> file-list layer works without huggingface_hub and
        # is testable offline (tests/test_hub.py)
        return _hub_api_download(repo_id, revision, target)
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        return _hub_api_download(repo_id, revision, target)
    snapshot_download(repo_id, revision=revision, local_dir=target,
                      allow_patterns=["*.safetensors", "*.json", "*.txt",
                                      "*.model"])
    return target


_HUB_SUFFIXES = (".safetensors", ".json", ".txt", ".model")


def _hub_api_download(repo_id: str, revision: Optional[str],
                      target: str) -> str:
    """Repo-id -> file-list -> files via the HF Hub REST API (reference:
    the hf-hub crate's resolution flow, README.md:430-470). Endpoint from
    $OMINIX_HF_ENDPOINT / $HF_ENDPOINT (default huggingface.co)."""
    import json as _json
    import urllib.request

    base = (os.environ.get("OMINIX_HF_ENDPOINT")
            or os.environ.get("HF_ENDPOINT")
            or "https://huggingface.co").rstrip("/")
    rev = revision or "main"
    api = f"{base}/api/models/{repo_id}/revision/{rev}"
    with urllib.request.urlopen(api, timeout=60) as r:
        meta = _json.loads(r.read().decode())
    files = [s["rfilename"] for s in meta.get("siblings", [])
             if s.get("rfilename", "").endswith(_HUB_SUFFIXES)]
    if not files:
        raise RuntimeError(f"no model files listed for {repo_id}@{rev}")
    os.makedirs(target, exist_ok=True)
    for name in files:
        p = os.path.normpath(name)
        if p.startswith(("/", "..")) or ".." in p.split(os.sep):
            raise RuntimeError(f"unsafe repo filename: {name}")
        dst = os.path.join(target, p)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        url = f"{base}/{repo_id}/resolve/{rev}/{name}"
        with urllib.request.urlopen(url, timeout=600) as r, \
                open(dst, "wb") as out:
            shutil.copyfileobj(r, out)
    return target


def _download_archive(url: str, sha256: Optional[str] = None) -> str:
    """Fetch a .tar/.tar.gz model archive and unpack it into models_dir().
    Member paths are validated (no absolute paths / parent escapes / links)
    before extraction; the optional sha256 pins the archive bytes."""
    import hashlib
    import tarfile
    import tempfile
    import urllib.request

    name = os.path.basename(url.split("?", 1)[0])
    for suf in (".tar.gz", ".tgz", ".tar"):
        if name.endswith(suf):
            name = name[:-len(suf)]
            break
    target = model_path(name)
    if os.path.exists(os.path.join(target, "config.json")):
        return target
    with tempfile.NamedTemporaryFile(suffix=".tar", delete=False) as tmp:
        with urllib.request.urlopen(url, timeout=60) as r:
            shutil.copyfileobj(r, tmp)
        tmp_path = tmp.name
    try:
        if sha256 is not None:
            h = hashlib.sha256()
            with open(tmp_path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            if h.hexdigest() != sha256:
                raise RuntimeError(f"sha256 mismatch for {url}: "
                                   f"{h.hexdigest()} != {sha256}")
        os.makedirs(target, exist_ok=True)
        with tarfile.open(tmp_path) as tf:
            for m in tf.getmembers():
                p = os.path.normpath(m.name)
                if (p.startswith(("/", "..")) or ".." in p.split(os.sep)
                        or not (m.isreg() or m.isdir())):
                    raise RuntimeError(f"unsafe archive member: {m.name}")
            # strip a single shared top-level directory if present
            names = [m.name for m in tf.getmembers() if m.isreg()]
            roots = {n.split("/", 1)[0] for n in names}
            strip = len(roots) == 1 and all("/" in n for n in names)
            for m in tf.getmembers():
                if not m.isreg():
                    continue
                rel = m.name.split("/", 1)[1] if strip else m.name
                dst = os.path.join(target, os.path.normpath(rel))
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                with tf.extractfile(m) as src, open(dst, "wb") as out:
                    shutil.copyfileobj(src, out)
        return target
    finally:
        os.unlink(tmp_path)


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
