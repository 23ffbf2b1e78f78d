"""Model distribution tests: local-dir conventions and the direct-URL
archive path, exercised against a loopback HTTP server (the HF-Hub path
needs egress and stays monkeypatched in test_server.py)."""

import hashlib
import http.server
import io
import json
import os
import tarfile
import threading

import pytest


@pytest.fixture
def models_dir(tmp_path, monkeypatch):
    d = tmp_path / "models"
    monkeypatch.setenv("OMINIX_MODELS_DIR", str(d))
    return d


def _serve(payload: bytes):
    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _tarball(files: dict, top: str = "") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in files.items():
            full = f"{top}/{name}" if top else name
            ti = tarfile.TarInfo(full)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_download_archive_roundtrip(models_dir):
    from ominix_mlx_tpu.utils import hub

    cfg = json.dumps({"model_type": "qwen3"}).encode()
    payload = _tarball({"config.json": cfg, "sub/weights.bin": b"\x01" * 64},
                       top="tiny-model")
    srv = _serve(payload)
    try:
        url = f"http://127.0.0.1:{srv.server_port}/tiny-model.tar.gz"
        # plain-http without an integrity pin is rejected outright
        with pytest.raises(RuntimeError, match="sha256"):
            hub.download_model(url)
        digest = hashlib.sha256(payload).hexdigest()
        path = hub.download_model(url, sha256=digest)
        assert os.path.exists(os.path.join(path, "config.json"))
        assert open(os.path.join(path, "sub", "weights.bin"), "rb").read() \
            == b"\x01" * 64
        # cached: second call returns without re-downloading
        assert hub.download_model(url, sha256=digest) == path
        # listed with the repo-id convention
        ids = [m["id"] for m in hub.list_models()]
        assert "tiny-model" in ids
        # deletable, but only inside models_dir
        assert not hub.delete_model("../outside")
        assert hub.delete_model("tiny-model")
        assert "tiny-model" not in [m["id"] for m in hub.list_models()]
    finally:
        srv.shutdown()


def test_download_archive_sha256_and_traversal(models_dir):
    from ominix_mlx_tpu.utils import hub

    payload = _tarball({"config.json": b"{}"})
    srv = _serve(payload)
    try:
        url = f"http://127.0.0.1:{srv.server_port}/m.tar.gz"
        with pytest.raises(RuntimeError, match="sha256"):
            hub._download_archive(url, sha256="0" * 64)
        ok = hashlib.sha256(payload).hexdigest()
        assert os.path.exists(os.path.join(
            hub._download_archive(url, sha256=ok), "config.json"))
    finally:
        srv.shutdown()

    evil = _tarball({"../escape.txt": b"x", "config.json": b"{}"})
    srv = _serve(evil)
    try:
        with pytest.raises(RuntimeError, match="unsafe"):
            hub._download_archive(
                f"http://127.0.0.1:{srv.server_port}/evil.tar.gz")
    finally:
        srv.shutdown()


def test_repo_id_rest_resolution(models_dir, monkeypatch):
    """Repo-id -> file-list -> files through the HF Hub REST API shape
    (reference hf-hub flow), against a local mock endpoint."""
    from ominix_mlx_tpu.utils import hub

    cfg = json.dumps({"model_type": "qwen3"}).encode()
    weights = b"\x02" * 128
    api_body = json.dumps({"siblings": [
        {"rfilename": "config.json"},
        {"rfilename": "model.safetensors"},
        {"rfilename": "README.md"},          # filtered: not a model suffix
    ]}).encode()

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = None
            if self.path == "/api/models/org/tiny-rest/revision/main":
                body = api_body
            elif self.path == "/org/tiny-rest/resolve/main/config.json":
                body = cfg
            elif self.path == "/org/tiny-rest/resolve/main/model.safetensors":
                body = weights
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv("OMINIX_HF_ENDPOINT",
                           f"http://127.0.0.1:{srv.server_port}")
        path = hub.download_model("org/tiny-rest")
        assert open(os.path.join(path, "config.json"), "rb").read() == cfg
        assert open(os.path.join(path, "model.safetensors"),
                    "rb").read() == weights
        assert not os.path.exists(os.path.join(path, "README.md"))
        ids = [m["id"] for m in hub.list_models()]
        assert "org/tiny-rest" in ids
    finally:
        srv.shutdown()
