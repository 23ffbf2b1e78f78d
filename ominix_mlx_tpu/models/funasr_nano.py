"""Fun-ASR-Nano / FunASR-Qwen4B: SenseVoice SAN-M encoder -> transformer
adaptor -> Qwen3 AR decoder.

TPU-native counterpart of reference crates funasr-nano-mlx (sensevoice
encoder 479 LoC + adaptor 274 + qwen 353; lib.rs:44 TaskPrompt) and
funasr-qwen4b-mlx (same shape with Qwen3-4B + chunked long-audio
transcribe, model.rs:388-459).

The SenseVoice encoder IS the Paraformer SAN-M encoder (shared weights
format); the adaptor is a small post-norm transformer that downsamples
and projects encoder frames into the LLM embedding space; decoding splices
audio embeddings into the chat prompt exactly like qwen3-asr.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.models import base, paraformer
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class AdaptorConfig:
    """2-layer transformer adaptor (funasr-nano-mlx/src/adaptor.rs)."""
    in_dim: int = 512
    hidden: int = 1024
    out_dim: int = 1024          # LLM hidden size
    layers: int = 2
    heads: int = 8
    downsample: int = 2          # frame-rate reduction by concat


def adaptor_forward(p: dict, acfg: AdaptorConfig, x: jax.Array) -> jax.Array:
    """x: [B, T, in_dim] encoder frames -> [B, T//ds, out_dim] LLM embeds."""
    B, T, D = x.shape
    ds = acfg.downsample
    T2 = T // ds
    x = x[:, :T2 * ds].reshape(B, T2, ds * D)
    x = linear(p["proj_in"], x)
    for lp in p["layers"]:
        h = layer_norm(lp["norm1"], x)
        h = paraformer.sanm_attention(lp["self_attn"], h, acfg.heads) \
            if "linear_q_k_v" in lp.get("self_attn", {}) else _mha(lp, h, acfg.heads)
        x = x + h
        h = layer_norm(lp["norm2"], x)
        x = x + linear(lp["fc2"], jax.nn.relu(linear(lp["fc1"], h)))
    return linear(p["proj_out"], x)


def _mha(lp, x, heads):
    import math
    B, T, D = x.shape
    hd = D // heads
    q = linear(lp["q"], x).reshape(B, T, heads, hd)
    k = linear(lp["k"], x).reshape(B, T, heads, hd)
    v = linear(lp["v"], x).reshape(B, T, heads, hd)
    a = jax.nn.softmax(jnp.einsum("bthd,bshd->bhts", q, k,
                                  preferred_element_type=jnp.float32)
                       / math.sqrt(hd), -1)
    o = jnp.einsum("bhts,bshd->bthd", a.astype(v.dtype), v).reshape(B, T, D)
    return linear(lp["o"], o)


# default chat wrapping (reference: funasr-nano-mlx/src/model.rs:544-546,
# 1062-1098 — system + instruction + <|startofspeech|>AUDIO<|endofspeech|>)
DEFAULT_SYSTEM = "You are a helpful assistant."
DEFAULT_INSTRUCTION = "语音转写成中文："
# direct speech-to-English translation rides the SAME model with a different
# instruction (reference: funasr-qwen4b model.rs:764 translate_samples_to_
# english -> transcribe_samples_with_prompt("Translate the speech to
# English:"))
TRANSLATE_INSTRUCTION = "Translate the speech to English:"


@dataclasses.dataclass
class FunASRNano:
    """transcribe facade (reference: funasr-nano lib.rs / model.rs)."""
    enc_params: dict
    enc_cfg: paraformer.ParaformerConfig
    adaptor_params: dict
    adaptor_cfg: AdaptorConfig
    lm_params: dict
    lm_cfg: TransformerConfig
    tokenizer: Optional[object] = None

    def encode(self, feats: jax.Array) -> jax.Array:
        """LFR features [B, T, mel*lfr] -> LLM embeds [B, T', D_lm]."""
        enc = paraformer.encode(self.enc_params, self.enc_cfg, feats)
        return adaptor_forward(self.adaptor_params, self.adaptor_cfg, enc)

    def transcribe_tokens(self, feats: jax.Array, prompt_prefix: List[int],
                          prompt_suffix: List[int], max_tokens: int = 128,
                          stop_tokens=()) -> List[int]:
        from ominix_mlx_tpu.core.generate import Engine
        from ominix_mlx_tpu.nn.layers import embedding

        audio = self.encode(feats)
        pre = embedding(self.lm_params["embed"],
                        jnp.asarray([prompt_prefix]))
        suf = embedding(self.lm_params["embed"],
                        jnp.asarray([prompt_suffix]))
        embeds = jnp.concatenate([pre, audio.astype(pre.dtype), suf], 1)
        T = embeds.shape[1]
        cache = base.init_cache(self.lm_cfg, 1, T + max_tokens + 8, pre.dtype)
        logits, cache = jax.jit(base.forward_embeds,
                                static_argnames=("cfg", "fresh_prefill"))(
            self.lm_params, self.lm_cfg, embeds, cache)
        engine = Engine(lambda p, t, c: base.forward(p, self.lm_cfg, t, c),
                        self.lm_params)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        out = []
        for _ in range(max_tokens):
            t = int(tok[0])
            if t in stop_tokens:
                break
            out.append(t)
            tok, _, cache, _ = engine._decode_jit(
                self.lm_params, cache, tok, jax.random.PRNGKey(0),
                jnp.full((1, 64), -1, jnp.int32), sampler=engine.sampler)
        return out

    # ------------------------------------------------- server/CLI facade ----

    def _prompt_ids(self, instruction=None, system=None):
        """Chat wrapping token ids around the spliced audio embeddings
        (reference prompt layout: model.rs:544-546)."""
        tok = self.tokenizer
        if tok is None:
            return [1], [2], ()
        pre = tok.encode(
            f"<|im_start|>system\n{system or DEFAULT_SYSTEM}<|im_end|>\n"
            f"<|im_start|>user\n{instruction or DEFAULT_INSTRUCTION}"
            f"<|startofspeech|>")
        suf = tok.encode("<|endofspeech|><|im_end|>\n<|im_start|>assistant\n")
        return pre, suf, tuple({tok.eos_token_id} - {None})

    def _features(self, samples, rate: int):
        import numpy as np

        from ominix_mlx_tpu.audio.dsp import apply_lfr, log_mel_spectrogram

        mel = log_mel_spectrogram(
            jnp.asarray(np.asarray(samples, np.float32)), 400, 160,
            self.enc_cfg.n_mels, rate)
        return apply_lfr(mel, self.enc_cfg.lfr_m, self.enc_cfg.lfr_n)

    def _detok(self, ids: List[int]) -> str:
        return (self.tokenizer.decode(ids) if self.tokenizer
                else " ".join(map(str, ids)))

    def transcribe(self, samples, rate: int = 16000, max_tokens: int = 256,
                   instruction=None) -> str:
        """Server/CLI-contract transcription (reference: model.rs:377)."""
        pre, suf, stops = self._prompt_ids(instruction)
        ids = self.transcribe_tokens(self._features(samples, rate)[None],
                                     pre, suf, max_tokens=max_tokens,
                                     stop_tokens=stops)
        return self._detok(ids)

    def transcribe_long(self, samples, rate: int = 16000,
                        chunk_secs: float = 30.0, overlap_secs: float = 0.0,
                        max_tokens: int = 256, instruction=None,
                        sep: str = "") -> str:
        """Chunked long-audio transcription joined into one string
        (reference: transcribe_long, funasr-qwen4b model.rs:388-459)."""
        pre, suf, stops = self._prompt_ids(instruction)
        outs = transcribe_long_tokens(
            self, samples, rate, pre, suf, chunk_secs=chunk_secs,
            overlap_secs=overlap_secs, max_tokens=max_tokens,
            stop_tokens=stops)
        return sep.join(self._detok(ids) for ids in outs)

    def transcribe_batch(self, samples_list, max_tokens: int = 256,
                         instruction=None) -> List[str]:
        """Transcribe [(samples, rate), ...] sequentially (reference:
        transcribe_samples_batch, funasr-nano model.rs:455 — also a
        sequential loop; true cross-utterance batching rides the server's
        continuous batcher instead)."""
        return [self.transcribe(s, r, max_tokens=max_tokens,
                                instruction=instruction)
                for s, r in samples_list]

    def translate(self, samples, rate: int = 16000,
                  max_tokens: int = 256) -> str:
        """Direct speech -> English text, one pass (reference:
        funasr-qwen4b model.rs:758-770)."""
        return self.transcribe(samples, rate, max_tokens=max_tokens,
                               instruction=TRANSLATE_INSTRUCTION)

    def translate_long(self, samples, rate: int = 16000,
                       chunk_secs: float = 30.0, max_tokens: int = 256,
                       sep: str = " ") -> str:
        """Chunked long-audio speech translation (reference:
        translate_long_samples, funasr-qwen4b model.rs:410)."""
        return self.transcribe_long(samples, rate, chunk_secs=chunk_secs,
                                    max_tokens=max_tokens,
                                    instruction=TRANSLATE_INSTRUCTION,
                                    sep=sep)


def init_adaptor(acfg: AdaptorConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * acfg.layers + 4))
    h = acfg.hidden
    n = lambda d: {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
    return {
        "proj_in": init_linear(next(ks), acfg.in_dim * acfg.downsample, h,
                               True, dtype),
        "layers": [{
            "norm1": n(h), "norm2": n(h),
            "q": init_linear(next(ks), h, h, True, dtype),
            "k": init_linear(next(ks), h, h, True, dtype),
            "v": init_linear(next(ks), h, h, True, dtype),
            "o": init_linear(next(ks), h, h, True, dtype),
            "fc1": init_linear(next(ks), h, 2 * h, True, dtype),
            "fc2": init_linear(next(ks), 2 * h, h, True, dtype),
        } for _ in range(acfg.layers)],
        "proj_out": init_linear(next(ks), h, acfg.out_dim, True, dtype),
    }


# ------------------------------------------------ checkpoint name mapping ---

def map_checkpoint_key(key: str) -> str:
    """Normalize on-disk tensor names to the canonical layout this module
    loads (behavior of the reference's map_safetensors_key,
    funasr-nano-mlx/src/model.rs:349-375): encoder attention/ffn aliases
    collapse onto the SAN-M names; LLM aliases onto HF Qwen names."""
    k = key
    k = k.replace(".attn.qkv.", ".self_attn.linear_q_k_v.")
    k = k.replace(".attn.out.", ".self_attn.linear_out.")
    k = k.replace(".attn.fsmn.", ".self_attn.fsmn.")
    k = k.replace(".ffn.w1.", ".feed_forward.w_1.")
    k = k.replace(".ffn.w2.", ".feed_forward.w_2.")
    k = k.replace(".attn.q_proj.", ".self_attn.q_proj.")
    k = k.replace(".attn.k_proj.", ".self_attn.k_proj.")
    k = k.replace(".attn.v_proj.", ".self_attn.v_proj.")
    k = k.replace(".attn.o_proj.", ".self_attn.o_proj.")
    k = k.replace(".attn.q_norm.", ".self_attn.q_norm.")
    k = k.replace(".attn.k_norm.", ".self_attn.k_norm.")
    return k


def encoder_params_from_flat(flat: dict,
                             cfg: paraformer.ParaformerConfig) -> dict:
    """SenseVoice/SAN-M encoder weights -> paraformer.encode param tree.

    On-disk names (FunASR conventions): ``encoder.encoders0.0`` is the
    input-dim layer, ``encoder.encoders.N`` the rest; each layer carries
    self_attn.linear_q_k_v / linear_out / fsmn_block.weight,
    feed_forward.w_1 / w_2, norm1 / norm2; final ``encoder.after_norm``."""
    def lin(name):
        p = {"w": jnp.asarray(flat[f"{name}.weight"])}
        if f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def norm(name):
        return {"w": jnp.asarray(flat[f"{name}.weight"]),
                "b": jnp.asarray(flat[f"{name}.bias"])}

    def layer(prefix):
        fsmn_w = jnp.asarray(flat[f"{prefix}.self_attn.fsmn_block.weight"])
        if fsmn_w.ndim == 3 and fsmn_w.shape[-1] == 1:
            pass                                   # already [C, K, 1]
        elif fsmn_w.ndim == 3:                     # torch [C, 1, K]
            fsmn_w = jnp.transpose(fsmn_w, (0, 2, 1))
        return {
            "norm1": norm(f"{prefix}.norm1"),
            "norm2": norm(f"{prefix}.norm2"),
            "self_attn": {
                "linear_q_k_v": lin(f"{prefix}.self_attn.linear_q_k_v"),
                "out_proj": lin(f"{prefix}.self_attn.linear_out"),
                "fsmn_block": {"w": fsmn_w},
            },
            "ffn_up": lin(f"{prefix}.feed_forward.w_1"),
            "ffn_down": lin(f"{prefix}.feed_forward.w_2"),
        }

    return {
        "first_layer": layer("encoder.encoders0.0"),
        "layers": [layer(f"encoder.encoders.{i}")
                   for i in range(cfg.encoder_layers - 1)],
        "after_norm": norm("encoder.after_norm"),
    }


def adaptor_params_from_flat(flat: dict, acfg: AdaptorConfig) -> dict:
    """Adaptor weights (``adaptor.*``): linear1/blocks.N/linear2 layout."""
    def lin(name):
        p = {"w": jnp.asarray(flat[f"{name}.weight"])}
        if f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def norm(name):
        return {"w": jnp.asarray(flat[f"{name}.weight"]),
                "b": jnp.asarray(flat[f"{name}.bias"])}

    return {
        "proj_in": lin("adaptor.linear1"),
        "layers": [{
            "norm1": norm(f"adaptor.blocks.{i}.norm1"),
            "norm2": norm(f"adaptor.blocks.{i}.norm2"),
            "q": lin(f"adaptor.blocks.{i}.self_attn.q_proj"),
            "k": lin(f"adaptor.blocks.{i}.self_attn.k_proj"),
            "v": lin(f"adaptor.blocks.{i}.self_attn.v_proj"),
            "o": lin(f"adaptor.blocks.{i}.self_attn.o_proj"),
            "fc1": lin(f"adaptor.blocks.{i}.fc1"),
            "fc2": lin(f"adaptor.blocks.{i}.fc2"),
        } for i in range(acfg.layers)],
        "proj_out": lin("adaptor.linear2"),
    }


def load_model(model_dir: str):
    """Assemble a FunASRNano from a converted checkpoint directory:
    encoder.* + adaptor.* + llm.* (Qwen3) tensors in safetensors
    (reference: model.rs:300-380)."""
    from ominix_mlx_tpu.utils.loading import load_config, load_safetensors

    raw = load_config(model_dir)
    flat = {map_checkpoint_key(k): v
            for k, v in load_safetensors(model_dir).items()}
    enc_cfg = paraformer.ParaformerConfig(
        encoder_layers=raw.get("audio_encoder_conf", {}).get("num_blocks", 50))
    acfg = AdaptorConfig(
        in_dim=enc_cfg.encoder_dim,
        out_dim=raw.get("adaptor_conf", {}).get("llm_dim", 1024))
    lm_cfg = TransformerConfig.from_hf(raw.get("llm_conf", raw))
    llm_flat = {k[len("llm."):]: v for k, v in flat.items()
                if k.startswith("llm.")}
    lm_params = base.params_from_flat(llm_flat, lm_cfg)
    import os
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    return FunASRNano(
        enc_params=encoder_params_from_flat(flat, enc_cfg), enc_cfg=enc_cfg,
        adaptor_params=adaptor_params_from_flat(flat, acfg), adaptor_cfg=acfg,
        lm_params=lm_params, lm_cfg=lm_cfg, tokenizer=tok)


# ------------------------------------------------------------ long audio ----

def chunk_ranges(n_samples: int, sample_rate: int, chunk_secs: float,
                 overlap_secs: float = 0.0):
    """Chunk boundaries for long audio (reference behavior:
    funasr-qwen4b-mlx/src/model.rs:496-515): fixed-size chunks with
    optional overlap; trailing chunks shorter than 100ms are dropped."""
    chunk = int(chunk_secs * sample_rate)
    overlap = int(overlap_secs * sample_rate)
    step = chunk if overlap >= chunk else chunk - overlap
    out = []
    start = 0
    while start < n_samples:
        end = min(start + chunk, n_samples)
        if end - start < sample_rate // 10:
            break
        out.append((start, end))
        start += step
    return out


def transcribe_long_tokens(model: FunASRNano, samples, sample_rate: int,
                           prompt_prefix: List[int], prompt_suffix: List[int],
                           chunk_secs: float = 30.0,
                           overlap_secs: float = 0.0,
                           max_tokens: int = 256, stop_tokens=()) -> List[List[int]]:
    """Chunked long-audio transcription (reference: transcribe_long /
    translate_long, model.rs:388-459). Returns per-chunk token lists; the
    caller detokenizes and joins (zh uses no separator, en a space)."""
    import numpy as np

    from ominix_mlx_tpu.audio.dsp import apply_lfr, log_mel_spectrogram

    samples = np.asarray(samples, np.float32)
    outs = []
    for (s, e) in chunk_ranges(len(samples), sample_rate, chunk_secs,
                               overlap_secs):
        mel = log_mel_spectrogram(jnp.asarray(samples[s:e]), 400, 160,
                                  model.enc_cfg.n_mels, sample_rate)
        feats = apply_lfr(mel, model.enc_cfg.lfr_m, model.enc_cfg.lfr_n)
        outs.append(model.transcribe_tokens(
            feats[None], prompt_prefix, prompt_suffix,
            max_tokens=max_tokens, stop_tokens=stop_tokens))
    return outs
