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


def _free_port() -> int:
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


PORT = _free_port()     # unique per process: xdist workers that split
                        # this module each bind their own server


@pytest.fixture(scope="module")
def server():
    srv = Server(port=PORT)
    srv.add_model("tiny", FakeModel())
    srv.start_background()
    yield srv
    srv.shutdown()


def _get(path):
    with urllib.request.urlopen(f"http://127.0.0.1:{PORT}{path}") as r:
        return json.loads(r.read())


def _post(path, body, raw=False):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", json.dumps(body).encode(),
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
    # terminal chunk: empty delta + finish_reason (OpenAI stream contract)
    last = json.loads(events[-2][6:])["choices"][0]
    assert last["delta"] == {} and last["finish_reason"] == "stop"
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
        f"http://127.0.0.1:{PORT}/v1/audio/transcriptions", data)
    out = json.loads(urllib.request.urlopen(req).read())
    assert out["text"].startswith("heard 1600 samples")


def test_audio_translation_endpoint(server):
    import io
    import wave

    import numpy as np

    class FakeST(FakeASR):
        def translate(self, samples, rate):
            return f"english for {len(samples)} samples"

    server.add_model("asr", FakeASR())      # transcribe-only: must be skipped
    server.add_model("st", FakeST())
    try:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(np.zeros(1600, np.int16).tobytes())
        req = urllib.request.Request(
            f"http://127.0.0.1:{PORT}/v1/audio/translations", buf.getvalue())
        out = json.loads(urllib.request.urlopen(req).read())
        assert out["text"] == "english for 1600 samples"
    finally:
        # the server fixture is shared: don't leak a transcribe-capable
        # model into later tests' first-capable-model selection
        server.models.pop("st", None)


def test_audio_transcription_long_uses_chunked_path(server):
    import io
    import wave

    import numpy as np

    class FakeLongASR(FakeASR):
        def transcribe_long(self, samples, rate):
            return f"long {len(samples)} samples at {rate}Hz"

    # the transcription route picks the first transcribe-capable model:
    # drop the plain fake so the chunk-capable one is selected
    server.models.pop("asr", None)
    server.add_model("asr-long", FakeLongASR())
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(31 * 16000, np.int16).tobytes())
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/audio/transcriptions", buf.getvalue())
    out = json.loads(urllib.request.urlopen(req).read())
    assert out["text"].startswith("long "), out


def test_local_models_and_delete(server, tmp_path_factory, monkeypatch):
    import os
    d = tmp_path_factory.mktemp("models")
    os.makedirs(d / "org--tiny", exist_ok=True)
    (d / "org--tiny" / "config.json").write_text("{}")
    monkeypatch.setenv("OMINIX_MODELS_DIR", str(d))
    out = _get("/v1/models/local")
    assert out["data"][0]["id"] == "org/tiny"
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/models/org/tiny", method="DELETE")
    res = json.loads(urllib.request.urlopen(req).read())
    assert res["deleted"] is True
    assert _get("/v1/models/local")["data"] == []


def test_registry_load_pipeline_all_modalities(tmp_path_factory):
    """Save tiny models in the canonical format and load each through
    registry.load_pipeline — the 'one server, all modalities' contract
    (reference README.md:360-366)."""
    import numpy as np

    from ominix_mlx_tpu.models import paraformer, registry
    from ominix_mlx_tpu.utils.loading import save_model

    # --- paraformer (transcribe) ---
    d = str(tmp_path_factory.mktemp("pf"))
    pcfg = paraformer.ParaformerConfig(
        n_mels=8, lfr_m=1, lfr_n=1, encoder_dim=16, encoder_layers=2,
        encoder_heads=2, encoder_ffn_dim=32, sanm_kernel_size=3,
        decoder_dim=16, decoder_layers=1, decoder_ffn_dim=32, vocab_size=32)
    params = paraformer.init_params(pcfg, jax.random.PRNGKey(0))
    cfgd = {"model_type": "paraformer",
            **{k: getattr(pcfg, k)
               for k in paraformer.ParaformerConfig.__dataclass_fields__}}
    save_model(d, cfgd, params)
    cap, obj = registry.load_pipeline(d)
    assert cap == "transcribe"
    txt = obj.transcribe(np.random.default_rng(0).normal(size=(1600,))
                         .astype(np.float32), 16000)
    assert isinstance(txt, str)

    # --- chat model through the same entry point ---
    from ominix_mlx_tpu.models import base
    d2 = str(tmp_path_factory.mktemp("llm"))
    lcfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, head_dim=16, intermediate_size=48,
        tie_word_embeddings=True)
    lp = base.init_params(lcfg, jax.random.PRNGKey(1), jnp.float32)
    from ominix_mlx_tpu.utils.loading import flatten_params, save_safetensors
    import os
    os.makedirs(d2, exist_ok=True)
    # HF-style names the qwen3 loader expects
    flat = {}
    flat["model.embed_tokens.weight"] = lp["embed"]
    flat["model.norm.weight"] = lp["norm"]
    for i, l in enumerate(lp["layers"]):
        p = f"model.layers.{i}"
        flat[f"{p}.input_layernorm.weight"] = l["input_layernorm"]
        flat[f"{p}.post_attention_layernorm.weight"] = \
            l["post_attention_layernorm"]
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            flat[f"{p}.self_attn.{n}.weight"] = l[n]["w"]
        for n in ("gate_proj", "up_proj", "down_proj"):
            flat[f"{p}.mlp.{n}.weight"] = l[n]["w"]
    save_safetensors(os.path.join(d2, "model.safetensors"), flat)
    with open(os.path.join(d2, "config.json"), "w") as f:
        json.dump({"model_type": "qwen2", "vocab_size": 64,
                   "hidden_size": 32, "num_hidden_layers": 1,
                   "num_attention_heads": 2, "num_key_value_heads": 1,
                   "head_dim": 16, "intermediate_size": 48,
                   "tie_word_embeddings": True,
                   "attention_bias": False}, f)
    cap2, (mod, params2, cfg2) = registry.load_pipeline(d2)
    assert cap2 == "chat"
    c = mod.init_cache(cfg2, 1, 8, jnp.float32)
    lg, _ = mod.forward(params2, cfg2, jnp.asarray([[1, 2]]), c)
    assert lg.shape == (1, 2, 64)


def test_request_timeout_returns_504(server):
    body = {"model": "tiny", "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 64, "timeout_s": 0.0}
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/chat/completions",
        json.dumps(body).encode(), {"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 504
    assert raised


@pytest.mark.slow
def test_image_generation_endpoint(server):
    """Drive /v1/images/generations with a tiny ImageGenerator."""
    import base64
    import numpy as np

    from ominix_mlx_tpu.models import flux_klein as fk
    from ominix_mlx_tpu.models.dit import vae

    tiny = fk.FluxKleinConfig(
        in_channels=16, hidden_size=32, txt_embed_dim=32, num_heads=2,
        depth=1, depth_single=1, head_dim=16, mlp_hidden=64,
        axes_dim=(4, 4, 4, 4))
    tiny_vae = vae.VAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                             z_channels=4, resolution=64)
    text_cfg = TransformerConfig(
        vocab_size=256, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, head_dim=16, intermediate_size=48,
        tie_word_embeddings=True)
    gen = fk.ImageGenerator(
        params=fk.init_params(tiny, jax.random.PRNGKey(0), jnp.float32),
        cfg=tiny, vae_params=vae.init_decoder(tiny_vae, jax.random.PRNGKey(1)),
        vae_cfg=tiny_vae,
        text_params=base.init_params(text_cfg, jax.random.PRNGKey(2),
                                     jnp.float32),
        text_cfg=text_cfg)
    server.add_model("tiny-image", gen)
    body = {"model": "tiny-image", "prompt": "a cat", "size": "16x16",
            "steps": 2}
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/images/generations",
        json.dumps(body).encode(), {"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req).read())
    png = base64.b64decode(out["data"][0]["b64_json"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


@pytest.mark.slow
def test_image_generation_endpoint_zimage(server):
    """Same route, Z-Image backend: the endpoint duck-types any model with
    generate(prompt, height, width, ...) so zimage serves identically."""
    import base64

    from ominix_mlx_tpu.models import zimage as zi
    from ominix_mlx_tpu.models.dit import vae

    tiny = zi.ZImageConfig(dim=48, n_heads=4, n_layers=1, n_refiner_layers=1,
                           in_channels=4, cap_feat_dim=32, axes_dims=(4, 4, 4),
                           rope_theta=256.0, patch_size=2)
    tiny_vae = vae.VAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                             z_channels=4)
    tcfg = TransformerConfig(
        vocab_size=64, hidden_size=tiny.cap_feat_dim, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=8, intermediate_size=48,
        use_qk_norm=True, tie_word_embeddings=True)

    class Tok:
        def encode(self, text):
            return [ord(c) % 64 for c in text][:24]

    gen = zi.ImageGenerator(
        params=zi.init_params(tiny, jax.random.PRNGKey(0), jnp.float32),
        cfg=tiny,
        vae_params=vae.init_decoder(tiny_vae, jax.random.PRNGKey(1)),
        vae_cfg=tiny_vae,
        text_params=base.init_params(tcfg, jax.random.PRNGKey(2),
                                     jnp.float32),
        text_cfg=tcfg, tokenizer=Tok())
    server.add_model("tiny-zimage", gen)
    body = {"model": "tiny-zimage", "prompt": "a red square",
            "size": "16x16", "steps": 2}
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/images/generations",
        json.dumps(body).encode(), {"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req).read())
    png = base64.b64decode(out["data"][0]["b64_json"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_batched_chat_matches_unbatched(server):
    """Continuous-batching route: concurrent greedy requests through the
    shared batcher must return exactly the per-request engine outputs."""
    import threading

    base_out = {}
    prompts = ["hello there", "another prompt!", "x"]
    for p in prompts:
        base_out[p] = _post("/v1/chat/completions", {
            "model": "tiny", "max_tokens": 6,
            "messages": [{"role": "user", "content": p}]})[
                "choices"][0]["message"]["content"]

    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32)
    try:
        got = {}
        errs = []

        def fire(p):
            try:
                got[p] = _post("/v1/chat/completions", {
                    "model": "tiny", "max_tokens": 6,
                    "messages": [{"role": "user", "content": p}]})[
                        "choices"][0]["message"]["content"]
            except Exception as e:
                errs.append(e)

        ts = [threading.Thread(target=fire, args=(p,)) for p in prompts]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert not errs, errs
        assert got == base_out
    finally:
        server.batchers.pop("tiny", None)


def test_batched_chat_stream(server):
    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32)
    try:
        r = _post("/v1/chat/completions", {
            "model": "tiny", "max_tokens": 5, "stream": True,
            "messages": [{"role": "user", "content": "hi"}]}, raw=True)
        events = [ln for ln in r.read().decode().splitlines()
                  if ln.startswith("data: ")]
        assert events[-1] == "data: [DONE]"
        text = "".join(
            json.loads(e[6:])["choices"][0]["delta"].get("content", "")
            for e in events[:-1])
        assert len(text) > 0
    finally:
        server.batchers.pop("tiny", None)


def test_batched_chat_paged_pool(server):
    """Batched route backed by the shared paged KV pool."""
    want = _post("/v1/chat/completions", {
        "model": "tiny", "max_tokens": 6,
        "messages": [{"role": "user", "content": "paged"}]})[
            "choices"][0]["message"]["content"]
    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32,
                           paged=True, page_size=16, num_pages=10)
    try:
        got = _post("/v1/chat/completions", {
            "model": "tiny", "max_tokens": 6,
            "messages": [{"role": "user", "content": "paged"}]})[
                "choices"][0]["message"]["content"]
        assert got == want
    finally:
        server.batchers.pop("tiny", None)


def test_batched_chat_paged_int8_kv(server):
    """Paged batching with kv_bits=8: int8 pool pages, request completes
    and streams a non-empty completion (int8 KV is lossy, so no
    token-exactness claim against the dense route)."""
    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32,
                           paged=True, page_size=16, num_pages=10,
                           kv_bits=8)
    try:
        assert server.batchers["tiny"].batcher.cache.layers[0].quantized
        got = _post("/v1/chat/completions", {
            "model": "tiny", "max_tokens": 6,
            "messages": [{"role": "user", "content": "paged"}]})[
                "choices"][0]["message"]["content"]
        assert isinstance(got, str) and len(got) > 0
    finally:
        server.batchers.pop("tiny", None)


@pytest.mark.slow
def test_batched_chat_prefix_cache(server):
    """Prefix caching through the server: two identical chats — the second
    reuses the first's prompt pages (hit recorded) and both answer
    identically to the unbatched route."""
    body = {"model": "tiny", "max_tokens": 6,
            "messages": [{"role": "user", "content": "prefix cache hello"}]}
    want = _post("/v1/chat/completions", body)[
        "choices"][0]["message"]["content"]
    # FakeTokenizer caps prompts at 16 tokens; page_size 8 leaves one full
    # cacheable page under the (T-1)//ps suffix-token reservation
    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32,
                           paged=True, page_size=8, num_pages=20,
                           prefix_cache=True)
    try:
        got1 = _post("/v1/chat/completions", body)[
            "choices"][0]["message"]["content"]
        got2 = _post("/v1/chat/completions", body)[
            "choices"][0]["message"]["content"]
        assert got1 == want and got2 == want
        assert server.batchers["tiny"].batcher.prefix.hits >= 1
    finally:
        server.batchers.pop("tiny", None)


@pytest.mark.slow
def test_batched_chat_speculative(server):
    """Batched speculative (self-spec draft on layer 1): greedy chat equals
    the plain route token-for-token; a sampled request bypasses the spec
    batcher (per-request engine path) instead of erroring."""
    body = {"model": "tiny", "max_tokens": 6,
            "messages": [{"role": "user", "content": "spec batch"}]}
    want = _post("/v1/chat/completions", body)[
        "choices"][0]["message"]["content"]
    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32,
                           draft_layers=1, num_draft_tokens=3)
    try:
        assert server.batchers["tiny"].batcher.spec
        got = _post("/v1/chat/completions", body)[
            "choices"][0]["message"]["content"]
        assert got == want
        sampled = _post("/v1/chat/completions", dict(
            body, temperature=0.9, seed=7))[
                "choices"][0]["message"]["content"]
        assert isinstance(sampled, str) and len(sampled) > 0
    finally:
        server.batchers.pop("tiny", None)


def test_stop_strings_unit():
    from ominix_mlx_tpu.serving.server import _StopStrings
    ss = _StopStrings(["END", "\n\n"])
    assert ss.cut("hello wor") == (9, False)
    assert ss.cut("hello EN") == (6, False)      # hold back the "EN" tail
    assert ss.cut("hello END!") == (6, True)     # truncate at the stop
    assert ss.cut("a\n") == (1, False)           # "\n" prefixes "\n\n"
    assert ss.cut("a\n\nb") == (1, True)
    assert not _StopStrings(None) and not _StopStrings("")
    assert _StopStrings("X").cut("aXb") == (1, True)


def test_chat_stop_strings(server):
    """OpenAI `stop`: the response truncates before the stop string, on
    both the per-request and batched routes."""
    body = {"model": "tiny", "max_tokens": 8,
            "messages": [{"role": "user", "content": "stop strings"}]}
    full = _post("/v1/chat/completions", body)[
        "choices"][0]["message"]["content"]
    assert len(full) >= 4
    stop = full[2:4]
    want = full[:full.find(stop)]
    got = _post("/v1/chat/completions", dict(body, stop=stop))[
        "choices"][0]["message"]["content"]
    assert got == want, (full, stop, got, want)
    server.enable_batching("tiny", slots=2, max_len=128, dtype=jnp.float32)
    try:
        got_b = _post("/v1/chat/completions", dict(body, stop=[stop]))[
            "choices"][0]["message"]["content"]
        assert got_b == want, (full, stop, got_b, want)
    finally:
        server.batchers.pop("tiny", None)


def test_metrics_endpoint(server):
    import urllib.request
    _post("/v1/chat/completions", {
        "model": "tiny", "max_tokens": 3,
        "messages": [{"role": "user", "content": "metrics"}]})
    with urllib.request.urlopen(
            f"http://127.0.0.1:{PORT}/metrics") as r:
        text = r.read().decode()
    assert "ominix_requests_total" in text
    lines = {l.split()[0]: float(l.split()[1])
             for l in text.splitlines() if l and not l.startswith("#")}
    assert lines["ominix_requests_total"] >= 1
    assert lines["ominix_completion_tokens_total"] >= 3
    assert lines["ominix_models_loaded"] >= 1


@pytest.mark.slow
def test_ocr_endpoint(server):
    """Drive /v1/ocr with a tiny DeepSeekOCR2 (image upload -> text)."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    from ominix_mlx_tpu.models import deepseek_ocr2, moe, qwen3_moe, vit

    vcfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=16,
                         num_layers=1, num_heads=2, mlp_dim=24,
                         has_cls_token=False)
    lm_cfg = TransformerConfig(
        vocab_size=deepseek_ocr2.IMAGE_TOKEN_ID + 2, hidden_size=32,
        num_layers=1, num_heads=2, num_kv_heads=1, head_dim=16,
        intermediate_size=48, tie_word_embeddings=True,
        moe=moe.MoEConfig(num_experts=2, top_k=1, moe_intermediate_size=16))
    m = deepseek_ocr2.DeepSeekOCR2(
        vision_params=vit.init_params(vcfg, jax.random.PRNGKey(1)),
        vision_cfg=vcfg,
        projector={"w": jax.random.normal(jax.random.PRNGKey(2),
                                          (32, 16)) * 0.1},
        lm_params=qwen3_moe.init_params(lm_cfg, jax.random.PRNGKey(0),
                                        jnp.float32),
        lm_cfg=lm_cfg)
    server.add_model("tiny-ocr", m)
    buf = io.BytesIO()
    Image.fromarray(np.zeros((28, 28, 3), np.uint8)).save(buf, format="PNG")
    body = {"model": "tiny-ocr", "prompt": "Free OCR.", "max_tokens": 3,
            "image": base64.b64encode(buf.getvalue()).decode()}
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/ocr",
        json.dumps(body).encode(), {"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req).read())
    assert isinstance(out["text"], str) and out["text"]


@pytest.mark.slow
def test_vlm_image_chat(server):
    """Content-array chat (image_url data URI) routes to MoxinVLM.chat."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    from ominix_mlx_tpu.models import moxin_vlm

    m = moxin_vlm.init_tiny(jax.random.PRNGKey(0))
    server.add_model("tiny-vlm", m)
    buf = io.BytesIO()
    Image.fromarray(np.full((28, 28, 3), 128, np.uint8)).save(buf,
                                                              format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    body = {"model": "tiny-vlm", "max_tokens": 3, "messages": [
        {"role": "user", "content": [
            {"type": "text", "text": "What is in this image?"},
            {"type": "image_url", "image_url": {"url": uri}}]}]}
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/chat/completions",
        json.dumps(body).encode(), {"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req).read())
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)
    assert msg["content"]

    # /v1/describe: the reference moxin server's simple image-description
    # endpoint (moxin-vlm-mlx examples/server.rs:393) over the same model
    body = {"model": "tiny-vlm", "max_tokens": 3,
            "image": base64.b64encode(buf.getvalue()).decode()}
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v1/describe",
        json.dumps(body).encode(), {"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req).read())
    assert isinstance(out["description"], str) and out["description"]


def test_chat_tool_calls(server):
    """OpenAI tools flow over HTTP: the tools block is folded into the
    system turn, and emitted <tool_call> spans come back as tool_calls."""
    class ToolTok(FakeTokenizer):
        captured = {}

        def apply_chat_template(self, messages, add_generation_prompt=True):
            ToolTok.captured["messages"] = messages
            return " ".join(m.get("content") or "" for m in messages)

        def decode(self, ids, skip_special_tokens=True):
            return ('I will check.\n<tool_call>\n{"name": "get_time", '
                    '"arguments": {"tz": "UTC"}}\n</tool_call>')

    mdl = FakeModel()
    mdl.tokenizer = ToolTok()
    server.add_model("tool-tiny", mdl)
    try:
        out = _post("/v1/chat/completions", {
            "model": "tool-tiny", "max_tokens": 4,
            "messages": [{"role": "user", "content": "time?"}],
            "tools": [{"type": "function", "function": {
                "name": "get_time", "parameters": {}}}]})
        choice = out["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        assert choice["message"]["content"] == "I will check."
        call = choice["message"]["tool_calls"][0]
        assert call["function"]["name"] == "get_time"
        assert json.loads(call["function"]["arguments"]) == {"tz": "UTC"}
        sysmsg = ToolTok.captured["messages"][0]
        assert sysmsg["role"] == "system" and "<tools>" in sysmsg["content"]
    finally:
        server.models.pop("tool-tiny", None)


def test_batched_chat_sampled(server):
    """temperature>0 request streams through the continuous batcher (no
    per-config engine compile) and is deterministic for a fixed seed."""
    server.enable_batching("tiny", slots=2, max_len=256, dtype=jnp.float32)
    try:
        body = {"model": "tiny", "max_tokens": 8, "temperature": 0.9,
                "top_k": 20, "seed": 7,
                "messages": [{"role": "user", "content": "hi"}]}
        outs = []
        for _ in range(2):
            req = urllib.request.Request(
                f"http://127.0.0.1:{PORT}/v1/chat/completions",
                json.dumps(body).encode(),
                {"Content-Type": "application/json"})
            out = json.loads(urllib.request.urlopen(req).read())
            outs.append(out["choices"][0]["message"]["content"])
        assert outs[0] == outs[1] and isinstance(outs[0], str)
    finally:
        server.batchers.pop("tiny", None)


def test_speculative_chat_matches_greedy(server):
    """enable_speculative (self-spec on the first layers): chat output is
    token-for-token identical to plain greedy chat."""
    body = {"model": "tiny", "max_tokens": 12,
            "messages": [{"role": "user", "content": "count to ten"}]}

    def ask():
        req = urllib.request.Request(
            f"http://127.0.0.1:{PORT}/v1/chat/completions",
            json.dumps(body).encode(), {"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(req).read())

    plain = ask()["choices"][0]["message"]["content"]
    server.enable_speculative("tiny", draft_layers=1, num_draft_tokens=3)
    try:
        spec = ask()["choices"][0]["message"]["content"]
    finally:
        server.spec.pop("tiny", None)
    assert spec == plain


@pytest.mark.slow
def test_batched_chat_quantized_weights(server):
    """enable_batching(quantize_bits=8): the batcher serves channelwise
    w8a8 weights (int8 MXU path) and still streams sane greedy tokens."""
    server.enable_batching("tiny", slots=2, max_len=256, dtype=jnp.float32,
                           quantize_bits=8)
    try:
        body = {"model": "tiny", "max_tokens": 6,
                "messages": [{"role": "user", "content": "hello"}]}
        req = urllib.request.Request(
            f"http://127.0.0.1:{PORT}/v1/chat/completions",
            json.dumps(body).encode(), {"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req).read())
        msg = out["choices"][0]["message"]["content"]
        assert isinstance(msg, str) and msg
    finally:
        server.batchers.pop("tiny", None)


def test_chat_module_server_contract():
    """Every chat family in the registry must expose the server's module
    contract: forward(params, cfg, tokens, cache, ...) and
    init_cache(cfg, batch, max_len, dtype) — a drifting signature makes
    the family unservable at request time (TypeError), which is exactly
    how qwen3_next regressed."""
    import inspect

    from ominix_mlx_tpu.models import registry

    for mt, path in registry.MODEL_TYPES.items():
        mod = registry.get_module(mt)
        assert hasattr(mod, "forward") and hasattr(mod, "init_cache") \
            and hasattr(mod, "load_model"), (mt, path)
        fp = list(inspect.signature(mod.forward).parameters)
        assert fp[:4] == ["params", "cfg", "tokens", "cache"], (mt, fp)
        ip = inspect.signature(mod.init_cache).parameters
        names = list(ip)
        assert names[0] == "cfg" and names[1] in ("batch", "b"), (mt, names)
        # params must not be a required positional (the server never has it)
        for extra in names[2:]:
            p = ip[extra]
            assert extra in ("max_len", "dtype") or \
                p.default is not inspect.Parameter.empty, (mt, extra)


def test_model_download_endpoint(server, tmp_path_factory, monkeypatch):
    """POST /v1/models/download: downloads into $OMINIX_MODELS_DIR via the
    hub (monkeypatched snapshot; the real path needs egress)."""
    import os
    import urllib.error

    d = tmp_path_factory.mktemp("dl")
    monkeypatch.setenv("OMINIX_MODELS_DIR", str(d))

    from ominix_mlx_tpu.utils import hub

    def fake_download(repo_id, revision=None, sha256=None):
        p = os.path.join(str(d), repo_id.replace("/", "--"))
        os.makedirs(p, exist_ok=True)
        return p

    monkeypatch.setattr(hub, "download_model", fake_download)
    out = _post("/v1/models/download", {"repo_id": "org/tiny-dl"})
    assert out["id"] == "org/tiny-dl" and out["path"].endswith("org--tiny-dl")
    try:
        _post("/v1/models/download", {})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_audio_speech_clone_mode(server):
    """/v1/audio/speech with ref_audio drives a VoiceCloner-style model:
    bare-waveform return, set_reference_audio from the uploaded wav."""
    import base64
    import io
    import wave

    import numpy as np

    class FakeCloner:
        dir = "<memory>"
        tokenizer = FakeTokenizer()

        class vits_cfg:
            sampling_rate = 32000

        def __init__(self):
            self.ref = None

        def set_reference_audio(self, samples, rate):
            self.ref = (len(samples), rate)

        def synthesize(self, text):
            assert self.ref is not None
            return np.zeros(640, np.float32)

    server.models.pop("tts", None)
    server.add_model("cloner", FakeCloner())
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(1600, np.int16).tobytes())
    r = _post("/v1/audio/speech", {
        "model": "cloner", "input": "hello",
        "ref_audio": base64.b64encode(buf.getvalue()).decode()}, raw=True)
    data = r.read()
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 32000 and w.getnframes() == 640
    assert server.models["cloner"].ref == (1600, 16000)
