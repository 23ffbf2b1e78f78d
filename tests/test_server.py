"""OpenAI-compatible server tests: health/models endpoints, chat completion
(non-stream + SSE stream), error handling — driven over a real socket."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.serving.server import Server

CFG = TransformerConfig(
    vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
    num_kv_heads=1, head_dim=16, intermediate_size=48,
    tie_word_embeddings=True)


class FakeTokenizer:
    eos_token_id = None

    def apply_chat_template(self, messages, add_generation_prompt=True):
        return " ".join(m["content"] for m in messages)

    def encode(self, text, add_special_tokens=True):
        return [ord(c) % 128 for c in text][:16] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (int(i) % 26)) for i in ids)


class FakeModel:
    name = "tiny"
    dir = "<memory>"

    def __init__(self):
        class Mod:
            forward = staticmethod(base.forward)
            init_cache = staticmethod(base.init_cache)
        self.module = Mod()
        self.cfg = CFG
        self.params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
        self.tokenizer = FakeTokenizer()

    def engine(self, sampler):
        return Engine(lambda p, t, c: base.forward(p, self.cfg, t, c),
                      self.params, sampler)


@pytest.fixture(scope="module")
def server():
    srv = Server(port=18731)
    srv.add_model("tiny", FakeModel())
    srv.start_background()
    yield srv
    srv.shutdown()


def _get(path):
    with urllib.request.urlopen(f"http://127.0.0.1:18731{path}") as r:
        return json.loads(r.read())


def _post(path, body, raw=False):
    req = urllib.request.Request(
        f"http://127.0.0.1:18731{path}", json.dumps(body).encode(),
        {"Content-Type": "application/json"})
    r = urllib.request.urlopen(req)
    return r if raw else json.loads(r.read())


def test_health_and_models(server):
    h = _get("/health")
    assert h["status"] == "ok" and h["models_loaded"] == 1
    m = _get("/v1/models")
    assert m["data"][0]["id"] == "tiny"


def test_chat_completion(server):
    out = _post("/v1/chat/completions", {
        "model": "tiny", "max_tokens": 6,
        "messages": [{"role": "user", "content": "hi"}]})
    assert out["object"] == "chat.completion"
    assert len(out["choices"][0]["message"]["content"]) > 0
    assert out["usage"]["completion_tokens"] == 6


def test_chat_completion_stream(server):
    r = _post("/v1/chat/completions", {
        "model": "tiny", "max_tokens": 5, "stream": True,
        "messages": [{"role": "user", "content": "hi"}]}, raw=True)
    assert r.headers["Content-Type"].startswith("text/event-stream")
    events = [ln for ln in r.read().decode().splitlines() if ln.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    text = "".join(
        json.loads(e[6:])["choices"][0]["delta"].get("content", "")
        for e in events[:-1])
    assert len(text) > 0


def test_unknown_model_404(server):
    import urllib.error
    try:
        _post("/v1/chat/completions", {
            "model": "nope", "messages": [{"role": "user", "content": "x"}]})
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


class FakeTTS:
    dir = "<memory>"
    tokenizer = FakeTokenizer()

    def synthesize(self, text, voice=None):
        import numpy as np
        t = np.arange(1600) / 16000.0
        return np.sin(2 * np.pi * 440 * t).astype(np.float32), 16000


class FakeASR:
    dir = "<memory>"
    tokenizer = FakeTokenizer()

    def transcribe(self, samples, rate):
        return f"heard {len(samples)} samples at {rate}Hz"


def test_audio_endpoints(server):
    import io
    import wave

    server.add_model("tts", FakeTTS())
    server.add_model("asr", FakeASR())
    r = _post("/v1/audio/speech", {"model": "tts", "input": "hello"},
              raw=True)
    assert r.headers["Content-Type"] == "audio/wav"
    data = r.read()
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 16000 and w.getnframes() == 1600

    req = urllib.request.Request(
        "http://127.0.0.1:18731/v1/audio/transcriptions", data)
    out = json.loads(urllib.request.urlopen(req).read())
    assert out["text"].startswith("heard 1600 samples")


def test_local_models_and_delete(server, tmp_path_factory, monkeypatch):
    import os
    d = tmp_path_factory.mktemp("models")
    os.makedirs(d / "org--tiny", exist_ok=True)
    (d / "org--tiny" / "config.json").write_text("{}")
    monkeypatch.setenv("OMINIX_MODELS_DIR", str(d))
    out = _get("/v1/models/local")
    assert out["data"][0]["id"] == "org/tiny"
    req = urllib.request.Request(
        "http://127.0.0.1:18731/v1/models/org/tiny", method="DELETE")
    res = json.loads(urllib.request.urlopen(req).read())
    assert res["deleted"] is True
    assert _get("/v1/models/local")["data"] == []
