"""OpenAI-compatible HTTP server.

TPU-native counterpart of the reference server
(minicpm-sala-mlx/examples/server.rs, 1019 LoC; API contract
README.md:360-366, 444-490):

  POST /v1/chat/completions      (stream=true -> SSE)
  GET  /v1/models                (path/size/quantization/loaded status)
  GET  /health                   (version info)
  POST /v1/audio/speech          (TTS -> WAV)
  POST /v1/audio/transcriptions  (ASR)
  POST /v1/audio/translations    (speech -> English, one pass)
  POST /v1/describe              (simple VLM image description)

Design mirrors the reference's concurrency discipline: HTTP threads enqueue
requests to ONE dedicated inference thread (server.rs:971-1010) — on TPU the
single-process device queue serializes anyway, and this keeps cache/state
ownership trivial. stdlib-only (ThreadingHTTPServer + SSE chunked writes).
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax.numpy as jnp

from ominix_mlx_tpu import __version__

DEFAULT_MAX_TOKENS = 512


class _StopStrings:
    """OpenAI ``stop`` strings: generation halts when any appears and the
    stop text never reaches the client. Streaming holds back any tail that
    is a proper prefix of a stop string until it either completes (match →
    truncate) or diverges (flush)."""

    def __init__(self, stops):
        if isinstance(stops, str):
            stops = [stops]
        self.stops = [s for s in (stops or []) if s]

    def __bool__(self):
        return bool(self.stops)

    def cut(self, text: str):
        """(safe_len, matched): text[:safe_len] is safe to emit now."""
        for s in self.stops:
            i = text.find(s)
            if i >= 0:
                return i, True
        hold = 0
        for s in self.stops:
            for k in range(min(len(s) - 1, len(text)), 0, -1):
                if text.endswith(s[:k]):
                    hold = max(hold, k)
                    break
        return len(text) - hold, False


class LoadedModel:
    def __init__(self, name: str, model_dir: str):
        from ominix_mlx_tpu.core.generate import Engine
        from ominix_mlx_tpu.models import registry
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer

        self.name = name
        self.dir = model_dir
        self.module, self.params, self.cfg = registry.load_model(model_dir)
        self.tokenizer = Tokenizer(model_dir)
        self._engine_cls = Engine
        self._engines: dict = {}

    def engine(self, sampler):
        # Engines are cached per SamplerConfig: a fresh Engine wraps fresh
        # jax.jit objects, and a re-trace costs 30-90s on the remote TPU —
        # per-request construction would recompile on EVERY request.
        eng = self._engines.get(sampler)
        if eng is None:
            if len(self._engines) >= 8:   # bound the per-config cache
                self._engines.pop(next(iter(self._engines)))
            import inspect
            kw = {}
            fwd_params = inspect.signature(self.module.forward).parameters
            if "fresh_prefill" in fwd_params:
                kw["prefill_forward_fn"] = \
                    lambda p, t, c: self.module.forward(
                        p, self.cfg, t, c, fresh_prefill=True)
            if "kv_limit" in fwd_params:
                kw["chunk_forward_fn"] = \
                    lambda p, t, c, kl: self.module.forward(
                        p, self.cfg, t, c, kv_limit=kl)
            if "skip_logits" in fwd_params and "kv_limit" in fwd_params:
                kw["chunk_hidden_forward_fn"] = \
                    lambda p, t, c, kl: self.module.forward(
                        p, self.cfg, t, c, kv_limit=kl, skip_logits=True)
            eng = self._engine_cls(
                lambda p, t, c: self.module.forward(p, self.cfg, t, c),
                self.params, sampler, **kw)
            self._engines[sampler] = eng
        return eng


class BatchedChatRunner:
    """Cross-request continuous batching for chat (serving/batching.py):
    HTTP threads submit token lists, ONE dedicated thread steps the shared
    slot-decode, and tokens stream back through per-request queues. Greedy
    and sampled requests share the one compiled step (per-slot
    SamplerParams ride as jit data)."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 dtype=jnp.bfloat16, paged: bool = False,
                 num_pages=None, page_size: int = 128,
                 quantize_bits=None, kv_bits=None,
                 prefix_cache: bool = False,
                 draft_dir=None, draft_layers=None,
                 num_draft_tokens: int = 4):
        from ominix_mlx_tpu.serving.batching import (ContinuousBatcher,
                                                     PagedContinuousBatcher)
        self.lock = threading.Lock()
        self.wake = threading.Event()
        params = model.params
        if quantize_bits:
            # batched quantized decode. bits=8 -> channelwise w8a8 (pure
            # XLA int8 MXU matmul; beats bf16 at M>1 — the throughput
            # scheme). bits=4 -> group w4 via the dq kernel (half the HBM
            # again; the CAPACITY scheme for models whose bf16 weights
            # don't fit at batch).
            from ominix_mlx_tpu.models import base as _base
            params = _base.quantize_params(
                dict(model.params), bits=quantize_bits, consume=False,
                batched=True,
                scheme="channel8" if quantize_bits == 8 else "group")
        fwd = lambda p, t, c: model.module.forward(p, model.cfg, t, c)
        import inspect
        fwd_params = inspect.signature(model.module.forward).parameters
        pfwd = cfwd = None
        if "fresh_prefill" in fwd_params:
            # adoption prefills are always fresh: ride the Pallas flash
            # kernel instead of dense O(T * capacity) masked SDPA
            pfwd = lambda p, t, c: model.module.forward(
                p, model.cfg, t, c, fresh_prefill=True)
        hfwd = None
        if "kv_limit" in fwd_params:
            # suffix prefill after a prefix-cache hit attends O(kv_limit);
            # long prompts (> prefill_chunk) adopt via chunked prefill
            cfwd = lambda p, t, c, kl: model.module.forward(
                p, model.cfg, t, c, kv_limit=kl)
            if "skip_logits" in fwd_params:
                hfwd = lambda p, t, c, kl: model.module.forward(
                    p, model.cfg, t, c, kv_limit=kl, skip_logits=True)
        spec_kw: dict = {}
        if draft_dir is not None or draft_layers is not None:
            # batched speculative: drafts verify across ALL slots in one
            # [slots, nd+1] target forward (continuous batching composes
            # with speculative decode; greedy requests only)
            import dataclasses as _dc
            if draft_dir is not None:
                from ominix_mlx_tpu.models import registry
                dmod, dparams, dcfg = registry.load_model(draft_dir)
                dfwd = lambda p, t, c: dmod.forward(p, dcfg, t, c)
                dinit = lambda s, ml: dmod.init_cache(dcfg, s, ml, dtype)
            else:
                n = draft_layers or max(1, model.cfg.num_layers // 4)
                dcfg = _dc.replace(model.cfg, num_layers=n)
                dparams = dict(model.params)
                dparams["layers"] = model.params["layers"][:n]
                dfwd = lambda p, t, c: model.module.forward(p, dcfg, t, c)
                dinit = lambda s, ml: model.module.init_cache(
                    dcfg, s, ml, dtype)
            spec_kw = dict(draft_forward_fn=dfwd, draft_params=dparams,
                           draft_init_cache_fn=dinit,
                           num_draft_tokens=num_draft_tokens)
        if paged:
            self.batcher = PagedContinuousBatcher(
                fwd, params, model.cfg, slots=slots, max_len=max_len,
                num_pages=num_pages, page_size=page_size, dtype=dtype,
                prefill_forward_fn=pfwd, quantize_kv=kv_bits == 8,
                prefix_cache=prefix_cache, chunk_forward_fn=cfwd,
                chunk_hidden_forward_fn=hfwd, **spec_kw)
        else:
            self.batcher = ContinuousBatcher(
                fwd, params, model.cfg,
                lambda cfg, b, ml: model.module.init_cache(cfg, b, ml, dtype),
                slots=slots, max_len=max_len, prefill_forward_fn=pfwd,
                chunk_forward_fn=cfwd, chunk_hidden_forward_fn=hfwd,
                **spec_kw)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def submit(self, tokens, max_tokens: int, stop_tokens=(),
               sampler=None, seed: int = 0):
        rid = uuid.uuid4().hex
        q: "queue.Queue" = queue.Queue()
        with self.lock:
            self.batcher.submit(rid, tokens, max_tokens,
                                stop_tokens=stop_tokens, emit=q.put,
                                sampler=sampler, seed=seed)
        self.wake.set()
        return rid, q

    def cancel(self, rid):
        with self.lock:
            self.batcher.cancel(rid)

    def _run(self):
        import sys
        import traceback
        while True:
            with self.lock:
                busy = self.batcher.pending()
            if not busy:
                self.wake.wait(timeout=0.1)
                self.wake.clear()
                continue
            try:
                with self.lock:
                    self.batcher.step()
            except Exception:
                # an unhandled step error must not kill the stepping thread
                # (every in-flight and future request would hang): abort the
                # affected requests so their HTTP threads unblock, keep going
                traceback.print_exc(file=sys.stderr)
                with self.lock:
                    try:
                        self.batcher.abort_all()
                    except Exception:
                        traceback.print_exc(file=sys.stderr)


class InferenceWorker:
    """Dedicated inference thread (reference: server.rs:971-1010)."""

    def __init__(self):
        self.q: "queue.Queue" = queue.Queue()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        while True:
            job = self.q.get()
            if job is None:
                return
            fn, done = job
            try:
                fn()
            except Exception as e:  # surfaced through the job's channel
                done(e)

    def submit(self, fn, done):
        self.q.put((fn, done))


class Server:
    def __init__(self, host: str = "127.0.0.1", port: int = 8080,
                 request_timeout_s: float = 600.0):
        self.host, self.port = host, port
        self.models: dict = {}
        self.batchers: dict = {}
        self.spec: dict = {}        # name -> (SpeculativeEngine, nd)
        self.worker = InferenceWorker()
        self.request_timeout_s = request_timeout_s
        self._httpd: Optional[ThreadingHTTPServer] = None
        # observability counters (GET /metrics, prometheus text format)
        self.metrics = {"requests_total": 0, "requests_failed": 0,
                        "prompt_tokens_total": 0,
                        "completion_tokens_total": 0,
                        "request_seconds_total": 0.0}
        self._metrics_lock = threading.Lock()

    def _count(self, prompt_tokens=0, completion_tokens=0, seconds=0.0,
               failed=False):
        with self._metrics_lock:
            self.metrics["requests_total"] += 1
            if failed:
                self.metrics["requests_failed"] += 1
            self.metrics["prompt_tokens_total"] += prompt_tokens
            self.metrics["completion_tokens_total"] += completion_tokens
            self.metrics["request_seconds_total"] += seconds

    def metrics_text(self) -> str:
        """Prometheus exposition format (counters only)."""
        lines = []
        with self._metrics_lock:
            for k, v in self.metrics.items():
                lines.append(f"# TYPE ominix_{k} counter")
                lines.append(f"ominix_{k} {v}")
        lines.append(f"# TYPE ominix_models_loaded gauge")
        lines.append(f"ominix_models_loaded {len(self.models)}")
        for name, runner in self.batchers.items():
            pfx = getattr(runner.batcher, "prefix", None)
            if pfx is None:
                continue
            lines.append("# TYPE ominix_prefix_cache_hits counter")
            lines.append(
                f'ominix_prefix_cache_hits{{model="{name}"}} {pfx.hits}')
            lines.append("# TYPE ominix_prefix_cache_misses counter")
            lines.append(
                f'ominix_prefix_cache_misses{{model="{name}"}} {pfx.misses}')
            lines.append("# TYPE ominix_prefix_cache_hit_tokens counter")
            lines.append(f'ominix_prefix_cache_hit_tokens{{model="{name}"}} '
                         f'{pfx.hit_tokens}')
            lines.append("# TYPE ominix_prefix_cache_pages gauge")
            lines.append(f'ominix_prefix_cache_pages{{model="{name}"}} '
                         f'{len(pfx.entries)}')
        return "\n".join(lines) + "\n"

    def load_model(self, name: str, model_dir: str):
        """Load ANY family through the registry: chat models get the
        Engine-cached LoadedModel; ASR/TTS/clone/image pipelines register
        their capability object directly (one server, all modalities —
        reference README.md:360-366)."""
        from ominix_mlx_tpu.models import registry
        cap, obj = registry.load_pipeline(model_dir)
        if cap == "chat":
            self.models[name] = LoadedModel(name, model_dir)
        else:
            try:
                obj.dir = model_dir
            except Exception:
                pass
            self.models[name] = obj

    def add_model(self, name: str, model):
        """Register a pre-built model object (tests, custom assemblies)."""
        self.models[name] = model

    def enable_batching(self, name: str, slots: int = 4, max_len: int = 2048,
                        dtype=jnp.bfloat16, paged: bool = False,
                        num_pages=None, page_size: int = 128,
                        quantize_bits=None, kv_bits=None,
                        prefix_cache: bool = False,
                        draft_dir=None, draft_layers=None,
                        num_draft_tokens: int = 4):
        """Turn on continuous batching for a loaded chat model: concurrent
        greedy requests share one slot-decode step instead of serializing
        on the inference thread. ``paged=True`` backs the slots with a
        shared paged KV pool (core/paged_cache.py) sized ``num_pages``;
        ``kv_bits=8`` stores the pool as int8 pages (half the KV HBM, so
        the same pool holds 2x the in-flight tokens); ``prefix_cache=True``
        reuses pool pages across requests sharing a prompt prefix (system
        prompts prefill once)."""
        self.batchers[name] = BatchedChatRunner(
            self.models[name], slots=slots, max_len=max_len, dtype=dtype,
            paged=paged, num_pages=num_pages, page_size=page_size,
            quantize_bits=quantize_bits, kv_bits=kv_bits,
            prefix_cache=prefix_cache, draft_dir=draft_dir,
            draft_layers=draft_layers, num_draft_tokens=num_draft_tokens)

    def enable_speculative(self, name: str, draft_dir: str = None,
                           draft_layers: int = None,
                           num_draft_tokens: int = 4):
        """Speculative decoding for greedy chat on ``name`` (reference
        --draft-model surface, speculative.rs): either a separate draft
        checkpoint (``draft_dir``) or self-speculation on the first
        ``draft_layers`` layers of the same weights (minicpm-sala style).
        Output is token-for-token identical to plain greedy decode."""
        import dataclasses as _dc

        from ominix_mlx_tpu.core.speculative import SpeculativeEngine
        from ominix_mlx_tpu.models import base as _base

        m = self.models[name]
        if draft_dir is not None:
            from ominix_mlx_tpu.models import registry
            dmod, dparams, dcfg = registry.load_model(draft_dir)
            dfwd = lambda p, t, c: dmod.forward(p, dcfg, t, c)
            d_init = lambda b, ml, dt: dmod.init_cache(dcfg, b, ml, dt)
        else:
            n = draft_layers or max(1, m.cfg.num_layers // 4)
            dcfg = _dc.replace(m.cfg, num_layers=n)
            dparams = dict(m.params)
            dparams["layers"] = m.params["layers"][:n]
            dfwd = lambda p, t, c: m.module.forward(p, dcfg, t, c)
            d_init = lambda b, ml, dt: m.module.init_cache(dcfg, b, ml, dt)
        eng = SpeculativeEngine(
            lambda p, t, c: m.module.forward(p, m.cfg, t, c), m.params,
            dfwd, dparams, num_draft_tokens=num_draft_tokens)
        self.spec[name] = (eng, d_init, num_draft_tokens)

    # ---------------------------------------------------------- handlers ----

    @staticmethod
    def _parse_content_arrays(messages):
        """Extract (text parts, decoded image [H,W,3] float) from OpenAI
        content-array messages; (None, None) for plain-string chats."""
        texts, image = [], None
        seen_array = False
        for msg in messages:
            c = msg.get("content")
            if not isinstance(c, list):
                continue
            seen_array = True
            for part in c:
                if part.get("type") == "text":
                    texts.append(part.get("text", ""))
                elif part.get("type") == "image_url":
                    url = part.get("image_url", {}).get("url", "")
                    if url.startswith("data:") and "base64," in url:
                        import base64
                        import io

                        import numpy as np
                        from PIL import Image
                        raw = base64.b64decode(url.split("base64,", 1)[1])
                        img = Image.open(io.BytesIO(raw)).convert("RGB")
                        image = np.asarray(img, np.float32) / 255.0
        return (texts if seen_array else None), image

    def chat_completion(self, body: dict, send_chunk=None) -> dict:
        from ominix_mlx_tpu.core.sampling import SamplerConfig
        from ominix_mlx_tpu.utils.tokenizer import chatml

        name = body.get("model") or next(iter(self.models))
        if name not in self.models:
            raise KeyError(f"model {name!r} not loaded")
        m = self.models[name]
        # OpenAI content arrays (image chat): [{"type": "text", ...},
        # {"type": "image_url", "image_url": {"url": "data:...;base64,"}}]
        # route to a VLM's chat(prompt, image01) (moxin_vlm — reference
        # moxin-vlm-mlx examples/server.rs image+prompt contract)
        texts, image = self._parse_content_arrays(body.get("messages", []))
        if image is not None or (texts is not None and hasattr(m, "chat")
                                 and hasattr(m, "encode_image")):
            if not hasattr(m, "chat"):
                raise KeyError(f"model {name!r} takes no image input")
            text = m.chat(" ".join(texts or [""]), image,
                          max_tokens=int(body.get("max_tokens",
                                                  DEFAULT_MAX_TOKENS)))
            rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
            return {"id": rid, "object": "chat.completion",
                    "created": int(time.time()), "model": name,
                    "choices": [{"index": 0, "message": {
                        "role": "assistant", "content": text},
                        "finish_reason": "stop"}]}
        # OpenAI tool calling: fold the request's tools into the system
        # turn as the GLM/Qwen "# Tools" block, and (below) parse emitted
        # <tool_call> spans back into OpenAI tool_calls (reference flow:
        # glm-4.7-flash-mlx/examples/tool_use.py). Non-streaming only —
        # agent loops call with stream=false.
        from ominix_mlx_tpu.utils.tools import (finalize_tool_response,
                                                inject_tools)
        messages = body.get("messages", [])
        tools = body.get("tools") or None
        if body.get("tool_choice") == "none":
            tools = None
        if tools:
            messages = inject_tools(messages, tools)
        prompt_text = (m.tokenizer.apply_chat_template(messages)
                       if m.tokenizer else chatml(messages))
        tokens = m.tokenizer.encode(prompt_text)
        sampler = SamplerConfig(
            temperature=float(body.get("temperature", 0.0)),
            top_p=float(body.get("top_p", 1.0)),
            top_k=int(body.get("top_k", 0)),
            min_p=float(body.get("min_p", 0.0)),
            repetition_penalty=float(body.get("repetition_penalty", 1.0)))
        max_tokens = int(body.get("max_tokens", DEFAULT_MAX_TOKENS))
        stops = ({m.tokenizer.eos_token_id}
                 if m.tokenizer.eos_token_id is not None else set())
        stop_strs = _StopStrings(body.get("stop"))
        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
        created = int(time.time())

        # requests ride the continuous batcher when one is enabled —
        # greedy AND sampled (per-slot SamplerParams are jit DATA, so any
        # mix shares the one compiled decode step; no per-config recompile).
        # Exception: a SPECULATIVE batcher verifies greedily, so sampled
        # requests fall through to the per-request engine path.
        batcher = self.batchers.get(name)
        if batcher is not None and getattr(batcher.batcher, "spec", False) \
                and sampler.temperature > 0:
            batcher = None
        if batcher is not None:
            resp = self._chat_batched(
                batcher, m, name, tokens, max_tokens, stops, send_chunk,
                float(body.get("timeout_s", self.request_timeout_s)),
                rid, created, sampler=sampler,
                seed=int(body.get("seed", 0)), stop_strs=stop_strs)
            return (resp if send_chunk is not None
                    else finalize_tool_response(resp, tools))

        # speculative path: greedy requests on a spec-enabled model decode
        # draft-then-verify, token-for-token equal to plain greedy
        spec = self.spec.get(name) if sampler.temperature == 0 else None

        engine = None if spec else m.engine(sampler)
        cap = len(tokens) + max_tokens + \
            (2 * spec[2] + 8 if spec else 8)
        cache = m.module.init_cache(m.cfg, 1, cap, jnp.bfloat16)

        # per-request timeout + cooperative cancellation (reference:
        # synthesis timeout + cancellation tokens, voice_clone.rs:198-206;
        # server-side request management, server.rs:729-803)
        timeout_s = float(body.get("timeout_s", self.request_timeout_s))
        cancel = threading.Event()
        result = {"text": "", "n": 0}
        done = threading.Event()
        err: list = []

        def run():
            try:
                out_ids = []
                if spec is not None:
                    eng, d_init, nd = spec
                    d_cache = d_init(1, cap, jnp.bfloat16)
                    toks, _ = eng.generate_scan(
                        jnp.asarray(tokens), cache, d_cache,
                        max_tokens=max_tokens, stop_tokens=tuple(stops))
                    gen = iter(toks)
                else:
                    gen = engine.generate(jnp.asarray(tokens), cache,
                                          max_tokens=max_tokens,
                                          stop_tokens=tuple(stops))
                matched = None
                for tok in gen:
                    if cancel.is_set():
                        break
                    out_ids.append(tok)
                    if send_chunk is None and not stop_strs:
                        continue
                    piece = m.tokenizer.decode(out_ids)
                    if stop_strs:
                        safe, hit = stop_strs.cut(piece)
                        if hit:
                            matched = piece[:safe]
                        piece = piece[:safe]
                    delta = piece[len(result["text"]):]
                    if delta:
                        result["text"] = piece
                        if send_chunk is not None:
                            send_chunk({
                                "id": rid, "object": "chat.completion.chunk",
                                "created": created, "model": name,
                                "choices": [{"index": 0,
                                             "delta": {"content": delta},
                                             "finish_reason": None}]})
                    if matched is not None:
                        break
                final = matched if matched is not None else \
                    m.tokenizer.decode(out_ids)
                if send_chunk is not None and \
                        len(final) > len(result["text"]):
                    send_chunk({
                        "id": rid, "object": "chat.completion.chunk",
                        "created": created, "model": name,
                        "choices": [{"index": 0,
                                     "delta": {"content":
                                               final[len(result["text"]):]},
                                     "finish_reason": None}]})
                result["text"] = final
                result["n"] = len(out_ids)
            except Exception as e:
                err.append(e)
            finally:
                done.set()

        self.worker.submit(run, lambda e: (err.append(e), done.set()))
        if not done.wait(timeout=timeout_s):
            cancel.set()            # generation stops at the next token
            done.wait()
            raise TimeoutError(f"request exceeded {timeout_s:.0f}s")
        if err:
            raise err[0]
        resp = {
            "id": rid, "object": "chat.completion", "created": created,
            "model": name,
            "choices": [{"index": 0,
                         "message": {"role": "assistant",
                                     "content": result["text"]},
                         "finish_reason": "stop"}],
            "usage": {"prompt_tokens": len(tokens),
                      "completion_tokens": result["n"],
                      "total_tokens": len(tokens) + result["n"]},
        }
        return (resp if send_chunk is not None
                else finalize_tool_response(resp, tools))

    def _chat_batched(self, batcher, m, name, tokens, max_tokens, stops,
                      send_chunk, timeout_s, rid, created, sampler=None,
                      seed: int = 0, stop_strs=None) -> dict:
        """Drain one request's token queue from the shared batcher thread;
        streams deltas as tokens land, cancels the slot on timeout."""
        brid, q = batcher.submit(tokens, max_tokens, stop_tokens=stops,
                                 sampler=sampler, seed=seed)
        deadline = time.time() + timeout_s
        out_ids, text = [], ""
        matched = None
        while True:
            try:
                tok = q.get(timeout=max(0.0, deadline - time.time()))
            except queue.Empty:
                batcher.cancel(brid)
                raise TimeoutError(f"request exceeded {timeout_s:.0f}s")
            if tok is None:
                break
            out_ids.append(tok)
            if not (send_chunk is not None or stop_strs):
                continue
            piece = m.tokenizer.decode(out_ids)
            if stop_strs:
                safe, hit = stop_strs.cut(piece)
                if hit:
                    matched = piece[:safe]
                piece = piece[:safe]
            delta = piece[len(text):]
            if delta:
                text = piece
                if send_chunk is not None:
                    send_chunk({
                        "id": rid, "object": "chat.completion.chunk",
                        "created": created, "model": name,
                        "choices": [{"index": 0,
                                     "delta": {"content": delta},
                                     "finish_reason": None}]})
            if matched is not None:
                batcher.cancel(brid)   # frees the slot immediately
                break
        final = matched if matched is not None else m.tokenizer.decode(
            out_ids)
        if send_chunk is not None and len(final) > len(text):
            # flush any held-back non-stop tail so the stream is complete
            send_chunk({
                "id": rid, "object": "chat.completion.chunk",
                "created": created, "model": name,
                "choices": [{"index": 0,
                             "delta": {"content": final[len(text):]},
                             "finish_reason": None}]})
        text = final
        return {
            "id": rid, "object": "chat.completion", "created": created,
            "model": name,
            "choices": [{"index": 0,
                         "message": {"role": "assistant", "content": text},
                         "finish_reason": "stop"}],
            "usage": {"prompt_tokens": len(tokens),
                      "completion_tokens": len(out_ids),
                      "total_tokens": len(tokens) + len(out_ids)},
        }

    def audio_speech(self, body: dict) -> bytes:
        """POST /v1/audio/speech -> WAV bytes. The model exposes either
        synthesize(text, voice=None) -> (samples float32, rate) (TTS) or a
        VoiceCloner-style synthesize(text) -> samples with
        set_reference_audio (clone mode: optional "ref_audio" b64 wav in
        the body) — the reference contract's speech(+clone) surface
        (README.md:472-490, voice_clone.rs)."""
        import inspect
        import io
        import wave as wave_mod

        import numpy as np

        name = body.get("model") or next(
            (n for n, m in self.models.items() if hasattr(m, "synthesize")),
            "")
        if name not in self.models or not hasattr(self.models[name],
                                                  "synthesize"):
            raise KeyError(f"model {name!r} has no TTS capability")
        m = self.models[name]
        if body.get("ref_audio") and hasattr(m, "set_reference_audio"):
            import base64
            with wave_mod.open(io.BytesIO(
                    base64.b64decode(body["ref_audio"])), "rb") as w:
                ref_rate = w.getframerate()
                raw = w.readframes(w.getnframes())
                ch = w.getnchannels()
            from ominix_mlx_tpu import native
            ref = native.pcm16_to_float(np.frombuffer(raw, np.int16))
            if ch > 1:
                ref = ref.reshape(-1, ch).mean(-1)
            m.set_reference_audio(ref, ref_rate)
        sig = inspect.signature(m.synthesize).parameters
        if "voice" in sig:
            out = m.synthesize(body["input"], voice=body.get("voice"))
        else:
            out = m.synthesize(body["input"])
        if isinstance(out, tuple):
            samples, rate = out
        else:  # clone path returns a bare waveform at the decoder's rate
            samples = out
            rate = int(getattr(getattr(m, "vits_cfg", None),
                               "sampling_rate", 0) or
                       getattr(m, "sample_rate", 0) or 24000)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            from ominix_mlx_tpu import native
            w.writeframes(native.float_to_pcm16(
                np.asarray(samples, np.float32)).tobytes())
        return buf.getvalue()

    def audio_transcription(self, wav_bytes: bytes, model_name=None,
                            task: str = "transcribe") -> dict:
        """POST /v1/audio/transcriptions -> {"text": ...}. The model must
        expose transcribe(samples, rate) -> str. task="translate" serves
        POST /v1/audio/translations (speech -> English in one pass,
        reference: funasr-qwen4b model.rs:758-770) via the model's
        translate()/translate_long() when it has them."""
        import io
        import wave as wave_mod

        import numpy as np

        want = "translate" if task == "translate" else "transcribe"
        if model_name is None:
            model_name = next((n for n, m in self.models.items()
                               if hasattr(m, want)), None)
        if model_name is None or model_name not in self.models:
            raise KeyError(f"no {want}-capable model loaded")
        m = self.models[model_name]
        if not hasattr(m, want):
            raise KeyError(f"model {model_name!r} cannot {want}")
        with wave_mod.open(io.BytesIO(wav_bytes), "rb") as w:
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
            ch = w.getnchannels()
        from ominix_mlx_tpu import native
        samples = native.pcm16_to_float(np.frombuffer(raw, np.int16))
        if ch > 1:
            samples = samples.reshape(-1, ch).mean(-1)
        # long uploads ride the chunked path when the family has one
        # (reference transcribe_long, funasr-qwen4b model.rs:388-459)
        long_fn = want + "_long"
        if len(samples) > 30 * rate and hasattr(m, long_fn):
            return {"text": getattr(m, long_fn)(samples, rate)}
        return {"text": getattr(m, want)(samples, rate)}

    def image_generation(self, body: dict) -> dict:
        """POST /v1/images/generations -> {"data": [{"b64_json": ...}]}.
        The model must expose generate(prompt, height, width, ...) ->
        [H, W, 3] floats (flux_klein.ImageGenerator)."""
        import base64
        import io

        import numpy as np

        name = body.get("model") or next(
            (n for n, m in self.models.items() if hasattr(m, "generate")), "")
        if name not in self.models or not hasattr(self.models[name],
                                                  "generate"):
            raise KeyError(f"model {name!r} has no image capability")
        m = self.models[name]
        size = body.get("size", "1024x1024")
        w, h = (int(x) for x in size.split("x"))
        img = m.generate(body.get("prompt", ""), height=h, width=w,
                         num_steps=int(body.get("steps", 4)),
                         seed=int(body.get("seed", 0)))
        arr = np.asarray(jnp.clip(img, 0, 1) * 255.0).astype("uint8")
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return {"created": int(time.time()), "data": [
            {"b64_json": base64.b64encode(buf.getvalue()).decode()}]}

    def ocr(self, body: dict) -> dict:
        """POST /v1/ocr {"image": b64-png | "pdf": b64, "prompt"?} ->
        {"text": ...} / {"pages": [...]}. The model must expose
        ocr(image01, prompt) / ocr_pdf(bytes, prompt) (deepseek_ocr2 —
        reference README OCR surface, deepseek-ocr2-mlx lib.rs)."""
        import base64
        import io

        import numpy as np

        name = body.get("model") or next(
            (n for n, m in self.models.items() if hasattr(m, "ocr")), "")
        if name not in self.models or not hasattr(self.models[name], "ocr"):
            raise KeyError(f"model {name!r} has no OCR capability")
        m = self.models[name]
        prompt = body.get("prompt", "Free OCR.")
        max_tokens = int(body.get("max_tokens", 512))
        if "pdf" in body:
            pages = m.ocr_pdf(base64.b64decode(body["pdf"]), prompt,
                              max_tokens=max_tokens)
            return {"pages": pages, "text": "\n\n".join(pages)}
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        return {"text": m.ocr(arr, prompt, max_tokens=max_tokens)}

    def describe(self, body: dict) -> dict:
        """POST /v1/describe {"image": b64, "prompt"?, "max_tokens"?} ->
        {"description": ...} — the reference moxin server's simple
        image-description endpoint (moxin-vlm-mlx examples/server.rs:393,
        response :430) as sugar over a VLM's chat(prompt, image01)."""
        import base64
        import io
        import time as _time

        import numpy as np

        name = body.get("model") or next(
            (n for n, m in self.models.items()
             if hasattr(m, "chat") and hasattr(m, "encode_image")), "")
        m = self.models.get(name)
        if m is None or not hasattr(m, "chat"):
            raise KeyError(f"model {name!r} has no image-chat capability")
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        prompt = body.get("prompt", "Describe this image in detail.")
        t0 = _time.time()
        text = m.chat(prompt, arr,
                      max_tokens=int(body.get("max_tokens", 256)))
        n_tok = (len(m.tokenizer.encode(text))
                 if getattr(m, "tokenizer", None) else None)
        dt = _time.time() - t0
        return {"description": text, "tokens": n_tok,
                "tokens_per_second": (round(n_tok / dt, 2)
                                      if n_tok and dt > 0 else None)}

    def list_models(self) -> dict:
        """Reference contract: path/size/quantization/loaded per model
        (README.md:360-366; server.rs:555,680)."""
        import os

        def meta(m):
            d = getattr(m, "dir", None)
            out = {"path": d, "loaded": True, "size_bytes": None,
                   "quantization": None}
            if not d or not os.path.isdir(d):
                return out
            try:
                out["size_bytes"] = sum(
                    e.stat().st_size for e in os.scandir(d) if e.is_file())
                cfgp = os.path.join(d, "config.json")
                if os.path.exists(cfgp):
                    with open(cfgp) as f:
                        out["quantization"] = json.load(f).get(
                            "quantization")
            except (OSError, ValueError):
                # a corrupt side file must not take down the whole listing
                pass
            return out

        return {"object": "list", "data": [
            {"id": name, "object": "model", "owned_by": "ominix", **meta(m)}
            for name, m in self.models.items()]}

    def health(self) -> dict:
        return {"status": "ok", "version": __version__,
                "models_loaded": len(self.models)}

    # ------------------------------------------------------------- serve ----

    def serve_forever(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, code: int, obj: dict):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/metrics":
                    data = server.metrics_text().encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path == "/health":
                    self._json(200, server.health())
                elif self.path in ("/v1/models", "/models"):
                    self._json(200, server.list_models())
                elif self.path == "/v1/models/local":
                    from ominix_mlx_tpu.utils import hub
                    self._json(200, {"data": hub.list_models()})
                else:
                    self._json(404, {"error": "not found"})

            def do_DELETE(self):
                # DELETE /v1/models/<name> (reference: server.rs:729-803)
                if self.path.startswith("/v1/models/"):
                    from ominix_mlx_tpu.utils import hub
                    name = self.path[len("/v1/models/"):]
                    server.models.pop(name, None)
                    ok = hub.delete_model(name)
                    self._json(200, {"deleted": bool(ok), "id": name})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                if self.path in ("/v1/audio/transcriptions",
                                 "/v1/audio/translations"):
                    task = ("translate" if self.path.endswith("translations")
                            else "transcribe")
                    try:
                        out = server.audio_transcription(raw, task=task)
                        return self._json(200, out)
                    except KeyError as e:
                        return self._json(404, {"error": str(e)})
                    except Exception as e:
                        return self._json(500, {"error": str(e)})
                try:
                    body = json.loads(raw or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "invalid JSON"})
                if self.path == "/v1/images/generations":
                    try:
                        return self._json(200, server.image_generation(body))
                    except KeyError as e:
                        return self._json(404, {"error": str(e)})
                    except Exception as e:
                        return self._json(500, {"error": str(e)})
                if self.path == "/v1/models/download":
                    # server-side model download (reference
                    # server.rs:729-803): {"repo_id": "org/name"} -> local
                    # path under $OMINIX_MODELS_DIR
                    from ominix_mlx_tpu.utils import hub
                    repo_id = body.get("repo_id")
                    if not repo_id:
                        return self._json(400, {"error": "repo_id required"})
                    try:
                        path = hub.download_model(
                            repo_id, revision=body.get("revision"),
                            sha256=body.get("sha256"))
                        return self._json(200, {"id": repo_id,
                                                "path": path})
                    except Exception as e:
                        return self._json(502, {"error": str(e)})
                if self.path == "/v1/ocr":
                    try:
                        return self._json(200, server.ocr(body))
                    except KeyError as e:
                        return self._json(404, {"error": str(e)})
                    except Exception as e:
                        return self._json(500, {"error": str(e)})
                if self.path == "/v1/describe":
                    try:
                        return self._json(200, server.describe(body))
                    except KeyError as e:
                        return self._json(404, {"error": str(e)})
                    except Exception as e:
                        return self._json(500, {"error": str(e)})
                if self.path == "/v1/audio/speech":
                    try:
                        wav = server.audio_speech(body)
                        self.send_response(200)
                        self.send_header("Content-Type", "audio/wav")
                        self.send_header("Content-Length", str(len(wav)))
                        self.end_headers()
                        self.wfile.write(wav)
                    except KeyError as e:
                        self._json(404, {"error": str(e)})
                    except Exception as e:
                        self._json(500, {"error": str(e)})
                    return
                if self.path != "/v1/chat/completions":
                    return self._json(404, {"error": "not found"})
                t_req = time.time()
                try:
                    if body.get("stream"):
                        self.send_response(200)
                        self.send_header("Content-Type", "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.end_headers()

                        def send_chunk(obj):
                            self.wfile.write(
                                b"data: " + json.dumps(obj).encode() + b"\n\n")
                            self.wfile.flush()

                        out = server.chat_completion(body, send_chunk)
                        # OpenAI stream contract: a terminal chunk with an
                        # empty delta carries finish_reason before [DONE]
                        fin = (out.get("choices") or
                               [{}])[0].get("finish_reason", "stop")
                        send_chunk({
                            "id": out.get("id"),
                            "object": "chat.completion.chunk",
                            "created": out.get("created"),
                            "model": out.get("model"),
                            "choices": [{"index": 0, "delta": {},
                                         "finish_reason": fin or "stop"}]})
                        self.wfile.write(b"data: [DONE]\n\n")
                    else:
                        out = server.chat_completion(body)
                        self._json(200, out)
                    u = out.get("usage", {})
                    server._count(u.get("prompt_tokens", 0),
                                  u.get("completion_tokens", 0),
                                  time.time() - t_req)
                except KeyError as e:
                    server._count(failed=True, seconds=time.time() - t_req)
                    self._json(404, {"error": str(e)})
                except TimeoutError as e:
                    server._count(failed=True, seconds=time.time() - t_req)
                    self._json(504, {"error": str(e)})
                except Exception as e:
                    server._count(failed=True, seconds=time.time() - t_req)
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        for _ in range(100):
            if self._httpd is not None:
                return t
            time.sleep(0.05)
        return t

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()


def main():
    import argparse

    ap = argparse.ArgumentParser(description="ominix TPU inference server")
    ap.add_argument("--model", action="append", required=True,
                    help="name=path or path")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch-slots", type=int, default=0,
                    help="continuous-batching slots for chat models "
                         "(0 = per-request decode)")
    ap.add_argument("--batch-max-len", type=int, default=4096)
    ap.add_argument("--batch-quantize-bits", type=int, default=None,
                    help="serve the continuous batcher quantized: 8 = "
                         "channelwise w8a8 (fastest at batch), 4 = group "
                         "w4 dq kernel (smallest memory)")
    ap.add_argument("--batch-paged", action="store_true",
                    help="back batching slots with a shared paged KV pool")
    ap.add_argument("--batch-num-pages", type=int, default=None,
                    help="physical pages in the shared pool (default: "
                         "fully backed; smaller = oversubscribed)")
    ap.add_argument("--kv-bits", type=int, default=None, choices=(8,),
                    help="int8 KV pages in the paged pool (half the KV "
                         "HBM -> 2x in-flight tokens); requires "
                         "--batch-paged")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="automatic prefix caching over the paged pool: "
                         "requests sharing a prompt prefix (e.g. a system "
                         "prompt) reuse its KV pages and prefill only "
                         "their suffix; implies --batch-paged")
    ap.add_argument("--draft-model", default=None,
                    help="draft checkpoint for speculative greedy decode "
                         "(applies to the first chat model)")
    ap.add_argument("--draft-layers", type=int, default=None,
                    help="self-speculation on the first N layers instead "
                         "of a separate draft checkpoint")
    ap.add_argument("--draft-tokens", type=int, default=4)
    args = ap.parse_args()
    srv = Server(args.host, args.port)
    for spec in args.model:
        name, _, path = spec.rpartition("=")
        name = name or path.rstrip("/").rsplit("/", 1)[-1]
        srv.load_model(name, path)
        if args.batch_slots and isinstance(srv.models[name], LoadedModel):
            srv.enable_batching(name, slots=args.batch_slots,
                                max_len=args.batch_max_len,
                                quantize_bits=args.batch_quantize_bits,
                                paged=(args.batch_paged or bool(args.kv_bits)
                                       or args.prefix_cache),
                                num_pages=args.batch_num_pages,
                                kv_bits=args.kv_bits,
                                prefix_cache=args.prefix_cache,
                                draft_dir=args.draft_model,
                                draft_layers=args.draft_layers,
                                num_draft_tokens=args.draft_tokens)
        elif (args.draft_model or args.draft_layers) \
                and isinstance(srv.models[name], LoadedModel) \
                and not srv.spec:
            srv.enable_speculative(name, draft_dir=args.draft_model,
                                   draft_layers=args.draft_layers,
                                   num_draft_tokens=args.draft_tokens)
    print(f"serving on http://{args.host}:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
