"""Qwen3-TTS: dual-track autoregressive talker + 16-codebook code predictor
+ SnakeBeta (BigVGAN-style) speech codec decoder, with streaming synthesis.

TPU-native counterpart of reference crate qwen3-tts-mlx:
  - Talker transformer consumes (projected text embedding + codec embedding)
    per frame, emits codebook-0 logits + hidden (talker.rs:391-465)
  - CodePredictor sub-decoder emits codebooks 1-15 AR per frame
    (talker.rs:299-389) — here the whole 15-step inner loop is ONE jitted
    lax.scan with stacked codebook embeddings and heads
  - speech codec decoder: RVQ dequantize -> pre-conv -> sliding-window
    transformer -> ConvNeXt upsample -> SnakeBeta conv decoder -> tanh
    (speech_tokenizer.rs:263-400)
  - SnakeBeta x + sin^2(a x)/(b + eps) — the reference's fused Metal kernel
    (qwen3-tts-mlx/src/metal_kernels.rs:141) is a plain XLA fusion here
  - streaming sessions yield chunk_frames at a time (lib.rs:901-999)
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.cache import ModelCache
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.nn.layers import (conv1d, conv_transpose1d, embedding,
                                      init_linear, layer_norm, linear,
                                      rms_norm)


@dataclasses.dataclass(frozen=True)
class TalkerConfig:
    transformer: TransformerConfig          # talker decoder body
    codec_vocab_size: int = 2048            # per-codebook vocab (+specials on cb0)
    codec_head_size: int = 2048 + 8         # codebook-0 logits incl. control tokens
    num_code_groups: int = 16
    text_vocab_size: int = 151936
    text_embed_dim: int = 1024              # pre-projection text embed width
    cp_hidden: int = 1024                   # code predictor width
    cp_layers: int = 4
    cp_heads: int = 8
    codec_eos_id: int = 2050
    codec_pad_id: int = 2051
    codec_bos_id: int = 2052
    tts_pad_token_id: int = 151671


# ------------------------------------------------------------ talker --------

def text_projection(p: dict, x: jax.Array) -> jax.Array:
    """fc1 -> silu -> fc2 (reference: talker.rs:169-189)."""
    return linear(p["fc2"], jax.nn.silu(linear(p["fc1"], x)))


def talker_step(params: dict, tcfg: TalkerConfig, embeds: jax.Array,
                cache: ModelCache):
    """embeds: [B, T, H] -> (codec0 logits [B, T, V0], post-norm hidden,
    cache). Reference: Talker::forward_step (talker.rs:434-462)."""
    cfg = tcfg.transformer
    x = embeds
    from ominix_mlx_tpu.core.attention import causal_mask

    T = x.shape[1]
    rope = cfg.rope()
    mask = causal_mask(T, cache.layers[0].max_len, cache.offset)
    new_layers = []
    for lp, lc in zip(params["layers"], cache.layers):
        x, lc = base.decoder_layer(lp, cfg, x, lc, cache.offset, mask, rope)
        new_layers.append(lc)
    normed = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    logits = linear(params["codec_head"], normed)
    return logits, normed, cache.with_layers(new_layers).advance(T)


# ---------------------------------------------------- code predictor --------

def predict_codes(cp: dict, tcfg: TalkerConfig, talker_hidden: jax.Array,
                  code0_embed: jax.Array) -> jax.Array:
    """Greedy codebooks 1..15 for one frame as one jitted program.

    talker_hidden/code0_embed: [B, 1, H_talker]. Returns [B, 15] int32.
    Reference: CodePredictor::generate_codes (talker.rs:316-389); the fresh
    per-frame KV cache becomes a [B, heads, 17, hd] scratch (2 prefill
    positions + 15 steps).
    """
    cfg = TransformerConfig(
        vocab_size=1, hidden_size=tcfg.cp_hidden, num_layers=tcfg.cp_layers,
        num_heads=tcfg.cp_heads, num_kv_heads=tcfg.cp_heads,
        head_dim=tcfg.cp_hidden // tcfg.cp_heads,
        intermediate_size=cp["layers"][0]["gate_proj"]["w"].shape[0],
        rms_norm_eps=tcfg.transformer.rms_norm_eps)
    B = talker_hidden.shape[0]
    proj = lambda x: linear(cp["small_to_mtp_projection"], x)
    cache = base.init_cache(cfg, B, 2 + tcfg.num_code_groups,
                            talker_hidden.dtype)

    prefill = jnp.concatenate([proj(talker_hidden), proj(code0_embed)], 1)
    logits_all, h, cache = _cp_forward(cp, cfg, prefill, cache)
    h_last = h[:, -1:]
    # head g=0 on the code0 position
    code = jnp.argmax(linear_head(cp, 0, h_last), -1)[:, 0].astype(jnp.int32)

    codes = [code]
    for g in range(1, tcfg.num_code_groups - 1):
        # codec_embeddings live in the talker dim (reference stacks them for
        # the generation embedding, talker.rs:477-509); project to cp dim
        emb = cp["codec_embeddings"][g - 1][codes[-1]][:, None]  # [B,1,emb]
        x = proj(emb.astype(prefill.dtype))
        _, h, cache = _cp_forward(cp, cfg, x, cache)
        lg = linear_head(cp, g, h)
        codes.append(jnp.argmax(lg[:, -1], -1).astype(jnp.int32))
    return jnp.stack(codes, 1)                                  # [B, 15]


def linear_head(cp: dict, g: int, h: jax.Array) -> jax.Array:
    w = cp["lm_heads"][g]
    return jnp.einsum("btd,vd->btv", h, w.astype(h.dtype))


def _cp_forward(cp: dict, cfg: TransformerConfig, x: jax.Array,
                cache: ModelCache):
    from ominix_mlx_tpu.core.attention import causal_mask

    T = x.shape[1]
    rope = cfg.rope()
    mask = causal_mask(T, cache.layers[0].max_len, cache.offset)
    new_layers = []
    for lp, lc in zip(cp["layers"], cache.layers):
        x, lc = base.decoder_layer(lp, cfg, x, lc, cache.offset, mask, rope)
        new_layers.append(lc)
    h = rms_norm(cp["norm"], x, cfg.rms_norm_eps)
    return None, h, cache.with_layers(new_layers).advance(T)


# ----------------------------------------------------- codec decoder --------

def snake_beta(p: dict, x: jax.Array) -> jax.Array:
    """x + sin^2(alpha x) / (beta + 1e-9); alpha/beta pre-exponentiated
    (reference: speech_tokenizer.rs:76-92, metal_kernels.rs:141)."""
    a, b = p["alpha_exp"], p["beta_exp"]
    s = jnp.sin(a * x.astype(jnp.float32))
    return (x.astype(jnp.float32) + s * s / (b + 1e-9)).astype(x.dtype)


def causal_conv1d(p: dict, x: jax.Array, dilation: int = 1) -> jax.Array:
    K = p["w"].shape[1]
    pad = (K - 1) * dilation
    return conv1d(p, x, padding=[(pad, 0)], dilation=dilation)


def causal_conv_transpose1d(p: dict, x: jax.Array, stride: int) -> jax.Array:
    y = conv_transpose1d(p, x, stride=stride)
    K = p["w"].shape[1]
    trim = K - stride
    return y[:, :y.shape[1] - trim] if trim > 0 else y


def residual_unit(p: dict, x: jax.Array, dilation: int) -> jax.Array:
    h = causal_conv1d(p["conv1"], snake_beta(p["act1"], x), dilation)
    h = causal_conv1d(p["conv2"], snake_beta(p["act2"], h))
    return x + h


def decoder_block(p: dict, x: jax.Array, stride: int) -> jax.Array:
    h = causal_conv_transpose1d(p["conv_t"], snake_beta(p["snake"], x), stride)
    for i, ru in enumerate(p["res_units"]):
        h = residual_unit(ru, h, dilation=3 ** i)
    return h


def convnext_block(p: dict, x: jax.Array) -> jax.Array:
    h = causal_conv1d(p["dwconv"], x)
    h = layer_norm({"w": p["norm_w"], "b": p["norm_b"]}, h)
    h = jnp.einsum("btc,hc->bth", h, p["pw1_w"]) + p["pw1_b"]
    h = jax.nn.gelu(h)
    h = jnp.einsum("bth,ch->btc", h, p["pw2_w"]) + p["pw2_b"]
    return x + p["gamma"] * h


def codec_decode(dec: dict, codes: jax.Array, cfg: dict) -> jax.Array:
    """codes: [T, 16] int32 -> waveform [T * upsample] float32 in [-1, 1]
    (reference: speech_tokenizer.rs:309-400)."""
    codes = codes[None] if codes.ndim == 2 else codes
    B, T, _ = codes.shape
    sem = dec["semantic_codebook"][codes[..., 0]]              # [B,T,d]
    sem = causal_conv1d(dec["rvq_first_output_proj"], sem) \
        if dec["rvq_first_output_proj"]["w"].ndim == 3 else sem
    ac = sum(dec["acoustic_codebooks"][g][codes[..., g + 1]]
             for g in range(15))
    ac = causal_conv1d(dec["rvq_rest_output_proj"], ac) \
        if dec["rvq_rest_output_proj"]["w"].ndim == 3 else ac
    h = sem + ac
    h = causal_conv1d(dec["pre_conv"], h)
    h = linear(dec["pre_transformer_input_proj"], h)
    from ominix_mlx_tpu.core.attention import causal_mask
    from ominix_mlx_tpu.core.cache import KVCache

    tcfg = TransformerConfig(
        vocab_size=1, hidden_size=h.shape[-1],
        num_layers=len(dec["pre_transformer_layers"]),
        num_heads=cfg.get("num_heads", 8),
        num_kv_heads=cfg.get("num_heads", 8),
        head_dim=h.shape[-1] // cfg.get("num_heads", 8),
        intermediate_size=dec["pre_transformer_layers"][0]["gate_proj"]["w"].shape[0],
        sliding_window=cfg.get("sliding_window"))
    mask = causal_mask(T, T, jnp.int32(0), tcfg.sliding_window)
    rope = tcfg.rope()
    for lp in dec["pre_transformer_layers"]:
        kv = KVCache.init(B, tcfg.num_kv_heads, T, tcfg.hd, h.dtype)
        h, _ = base.decoder_layer(lp, tcfg, h, kv, jnp.int32(0), mask, rope)
    h = rms_norm(dec["pre_transformer_norm"], h)
    h = linear(dec["pre_transformer_output_proj"], h)
    for up, cn, stride in zip(dec["upsample_convs"], dec["upsample_convnext"],
                              cfg.get("up_strides", (2, 2))):
        h = causal_conv_transpose1d(up, h, stride)
        h = convnext_block(cn, h)
    h = causal_conv1d(dec["initial_conv"], h)
    for blk, stride in zip(dec["decoder_blocks"],
                           cfg.get("dec_strides", (8, 5, 4, 3))):
        h = decoder_block(blk, h, stride)
    h = snake_beta(dec["final_snake"], h)
    h = causal_conv1d(dec["final_conv"], h)
    return jnp.tanh(h).reshape(-1)


# -------------------------------------------------------------- init --------

def init_params(tcfg: TalkerConfig, key, dtype=jnp.float32) -> dict:
    """Random-init talker + code predictor (tests/benches)."""
    ks = iter(jax.random.split(key, 400))
    cfg = tcfg.transformer
    H = cfg.hidden_size
    params = base.init_params(cfg, next(ks), dtype)
    params.pop("lm_head", None)
    params.pop("embed")
    params["codec_head"] = init_linear(next(ks), H, tcfg.codec_head_size,
                                       False, dtype)
    params["text_embedding"] = jax.random.normal(
        next(ks), (tcfg.text_vocab_size, tcfg.text_embed_dim), dtype) * 0.02
    params["text_projection"] = {
        "fc1": init_linear(next(ks), tcfg.text_embed_dim, H, True, dtype),
        "fc2": init_linear(next(ks), H, H, True, dtype),
    }
    params["codec_embedding"] = jax.random.normal(
        next(ks), (tcfg.codec_head_size, H), dtype) * 0.02
    cp_cfg = TransformerConfig(
        vocab_size=1, hidden_size=tcfg.cp_hidden, num_layers=tcfg.cp_layers,
        num_heads=tcfg.cp_heads, num_kv_heads=tcfg.cp_heads,
        head_dim=tcfg.cp_hidden // tcfg.cp_heads,
        intermediate_size=tcfg.cp_hidden * 3)
    cp = base.init_params(cp_cfg, next(ks), dtype)
    cp.pop("embed")
    cp.pop("lm_head", None)
    cp["codec_embeddings"] = [
        jax.random.normal(next(ks), (tcfg.codec_vocab_size, H), dtype) * 0.02
        for _ in range(tcfg.num_code_groups - 1)]
    cp["lm_heads"] = [
        jax.random.normal(next(ks), (tcfg.codec_vocab_size, tcfg.cp_hidden),
                          dtype) * 0.02
        for _ in range(tcfg.num_code_groups - 1)]
    cp["small_to_mtp_projection"] = init_linear(next(ks), H, tcfg.cp_hidden,
                                                True, dtype)
    params["code_predictor"] = cp
    return params


def init_codec(key, frame_dim: int = 32, n_transformer: int = 1,
               num_heads: int = 4, up_strides=(2,), dec_strides=(2, 2),
               codec_vocab: int = 64, dtype=jnp.float32):
    """Tiny random codec decoder + its static config (tests)."""
    ks = iter(jax.random.split(key, 200))

    def cconv(cin, cout, k):
        return {"w": jax.random.normal(next(ks), (cout, k, cin), dtype) * 0.05,
                "b": jnp.zeros((cout,), dtype)}

    def snake(c):
        return {"alpha_exp": jnp.ones((1, 1, c), jnp.float32),
                "beta_exp": jnp.ones((1, 1, c), jnp.float32)}

    def ru(c):
        return {"act1": snake(c), "conv1": cconv(c, c, 3),
                "act2": snake(c), "conv2": cconv(c, c, 1)}

    d = frame_dim
    tl_cfg = TransformerConfig(
        vocab_size=1, hidden_size=d, num_layers=n_transformer,
        num_heads=num_heads, num_kv_heads=num_heads, head_dim=d // num_heads,
        intermediate_size=2 * d)
    dec = {
        "semantic_codebook": jax.random.normal(next(ks), (codec_vocab, d), dtype) * 0.1,
        "acoustic_codebooks": [
            jax.random.normal(next(ks), (codec_vocab, d), dtype) * 0.1
            for _ in range(15)],
        "rvq_first_output_proj": cconv(d, d, 1),
        "rvq_rest_output_proj": cconv(d, d, 1),
        "pre_conv": cconv(d, d, 3),
        "pre_transformer_input_proj": init_linear(next(ks), d, d, True, dtype),
        "pre_transformer_output_proj": init_linear(next(ks), d, d, True, dtype),
        "pre_transformer_norm": jnp.ones((d,), dtype),
        "pre_transformer_layers": [
            {k2: v for k2, v in base.init_params(tl_cfg, next(ks), dtype)
             ["layers"][0].items()} for _ in range(n_transformer)],
        "upsample_convs": [cconv(d, d, 2 * s) for s in up_strides],
        "upsample_convnext": [{
            "dwconv": cconv(d, d, 3), "norm_w": jnp.ones((d,), dtype),
            "norm_b": jnp.zeros((d,), dtype),
            "pw1_w": jax.random.normal(next(ks), (2 * d, d), dtype) * 0.05,
            "pw1_b": jnp.zeros((2 * d,), dtype),
            "pw2_w": jax.random.normal(next(ks), (d, 2 * d), dtype) * 0.05,
            "pw2_b": jnp.zeros((d,), dtype),
            "gamma": jnp.ones((d,), dtype) * 0.1,
        } for _ in up_strides],
        "initial_conv": cconv(d, d, 3),
        "decoder_blocks": [{
            "snake": snake(d), "conv_t": cconv(d, d, 2 * s),
            "res_units": [ru(d) for _ in range(2)],
        } for s in dec_strides],
        "final_snake": snake(d),
        "final_conv": cconv(d, 1, 3),
    }
    cfg = {"num_heads": num_heads, "sliding_window": None,
           "up_strides": tuple(up_strides), "dec_strides": tuple(dec_strides)}
    return dec, cfg


# --------------------------------------------------------- synthesizer ------

@dataclasses.dataclass
class GenerationResult:
    codes: np.ndarray            # [frames, 16]
    frames: int


class Synthesizer:
    """Dual-track AR generation loop (reference: lib.rs:219-781,
    generate.rs:259). Modes beyond preset-speaker (voice design/clone)
    plug in via prefill embedding builders."""

    def __init__(self, talker_params: dict, tcfg: TalkerConfig,
                 codec_params: Optional[dict] = None,
                 codec_cfg: Optional[dict] = None,
                 spk_params: Optional[dict] = None, spk_cfg=None,
                 speech_enc: Optional[dict] = None, speech_enc_cfg=None):
        self.tp = talker_params
        self.tcfg = tcfg
        self.codec = codec_params
        self.codec_cfg = codec_cfg or {}
        self.spk_params = spk_params            # ECAPA speaker encoder
        self.spk_cfg = spk_cfg
        self.speech_enc = speech_enc            # Mimi-style ref tokenizer
        self.speech_enc_cfg = speech_enc_cfg
        self._step = jax.jit(self._frame_step, donate_argnums=(1,))

    def build_prefill(self, text_tokens: List[int], codec_prefix: List[int],
                      spk_embed: Optional[jax.Array] = None) -> jax.Array:
        """10-position batched prefill embedding (generate.rs:1-14,259):
        text projection + codec control prefix, first text token at the end."""
        tcfg = self.tcfg
        tp = self.tp
        pad = tcfg.tts_pad_token_id
        text_ids = [pad] * len(codec_prefix) + [text_tokens[0]]
        te = embedding(tp["text_embedding"], jnp.asarray([text_ids]))
        te = text_projection(tp["text_projection"], te)
        ce = embedding(tp["codec_embedding"],
                       jnp.asarray([codec_prefix + [tcfg.codec_bos_id]]))
        emb = te + ce
        if spk_embed is not None:
            emb = jnp.concatenate([spk_embed[None, None], emb], 1)
        return emb

    def _frame_step(self, params, cache, prev_codes, text_tok):
        """One frame: build embedding from prev 16 codes + text token,
        talker step, sample code0 greedy, predict codes 1-15."""
        tcfg = self.tcfg
        te = embedding(params["text_embedding"], text_tok[:, None])
        te = text_projection(params["text_projection"], te)
        c0 = embedding(params["codec_embedding"], prev_codes[:, :1])
        rest = sum(params["code_predictor"]["codec_embeddings"][g]
                   [prev_codes[:, g + 1]][:, None]
                   for g in range(tcfg.num_code_groups - 1))
        emb = te + c0 + rest.astype(te.dtype)
        logits, hidden, cache = talker_step(params, tcfg, emb, cache)
        code0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        c0e = embedding(params["codec_embedding"], code0[:, None])
        codes_rest = predict_codes(params["code_predictor"], tcfg,
                                   hidden[:, -1:], c0e)
        return jnp.concatenate([code0[:, None], codes_rest], 1), cache

    def generate_frames(self, text_tokens: List[int],
                        codec_prefix: List[int], max_frames: int = 600,
                        cache: Optional[ModelCache] = None) -> Iterator[np.ndarray]:
        """Yield [16] code frames until EOS (reference: generate.rs:259)."""
        tcfg = self.tcfg
        if cache is None:
            cache = base.init_cache(tcfg.transformer, 1,
                                    len(codec_prefix) + 2 + max_frames + 8,
                                    jnp.bfloat16)
        emb = self.build_prefill(text_tokens, codec_prefix)
        logits, hidden, cache = jax.jit(talker_step, static_argnames=("tcfg",))(
            self.tp, tcfg, emb, cache)
        code0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        c0e = embedding(self.tp["codec_embedding"], code0[:, None])
        rest = predict_codes(self.tp["code_predictor"], tcfg, hidden[:, -1:],
                             c0e)
        codes = jnp.concatenate([code0[:, None], rest], 1)
        text_pos = 1
        for f in range(max_frames):
            c = np.asarray(codes[0])
            if int(c[0]) == tcfg.codec_eos_id:
                break
            yield c
            tok = (text_tokens[text_pos] if text_pos < len(text_tokens)
                   else tcfg.tts_pad_token_id)
            text_pos += 1
            codes, cache = self._step(self.tp, cache, codes,
                                      jnp.asarray([tok], jnp.int32))

    def synthesize_codes(self, text_tokens: List[int],
                         codec_prefix: List[int],
                         max_frames: int = 600) -> GenerationResult:
        frames = list(self.generate_frames(text_tokens, codec_prefix,
                                           max_frames))
        codes = np.stack(frames) if frames else np.zeros((0, 16), np.int32)
        return GenerationResult(codes=codes, frames=len(frames))

    def decode_audio(self, codes: np.ndarray) -> np.ndarray:
        assert self.codec is not None, "codec decoder weights not loaded"
        wav = codec_decode(self.codec, jnp.asarray(codes, jnp.int32),
                           self.codec_cfg)
        return np.asarray(wav, np.float32)

    def stream(self, text_tokens: List[int], codec_prefix: List[int],
               chunk_frames: int = 10, max_frames: int = 600):
        """StreamingSession: yield waveform chunks of ~chunk_frames frames
        (~830ms at 12Hz) as generation proceeds (reference:
        lib.rs:901-999 StreamingSession::next_chunk)."""
        buf = []
        for frame in self.generate_frames(text_tokens, codec_prefix,
                                          max_frames):
            buf.append(frame)
            if len(buf) >= chunk_frames:
                yield self.decode_audio(np.stack(buf)) \
                    if self.codec is not None else np.stack(buf)
                buf = []
        if buf:
            yield self.decode_audio(np.stack(buf)) \
                if self.codec is not None else np.stack(buf)

    # ------------------------------------------------- voice-clone modes ----

    def encode_speaker(self, mel: jax.Array) -> jax.Array:
        """Reference mel [T, mel_dim] -> x-vector [hidden] for the SPK slot
        of the codec prefix (reference: lib.rs:679-689)."""
        from ominix_mlx_tpu.models import speaker_encoder as se
        assert self.spk_params is not None, "speaker encoder not loaded"
        return se.speaker_encoder(self.spk_params, self.spk_cfg,
                                  mel[None])[0]

    def encode_reference(self, samples: jax.Array) -> np.ndarray:
        """Reference waveform -> [frames, 16] codec codes for in-context
        cloning (reference: speech_encoder.rs::encode)."""
        assert self.speech_enc is not None, "speech encoder not loaded"
        codes = speech_encode(self.speech_enc, self.speech_enc_cfg,
                              samples[None])
        return np.asarray(codes[0])

    def generate_frames_clone(self, ref_text_tokens: List[int],
                              text_tokens: List[int],
                              ref_codes: np.ndarray,
                              spk_embed: Optional[jax.Array] = None,
                              codec_prefix: Optional[List[int]] = None,
                              max_frames: int = 600) -> Iterator[np.ndarray]:
        """In-context voice cloning (reference: generate_voice_clone,
        generate.rs): text = ref_text + target_text; the reference audio's
        codec frames are teacher-forced before free generation."""
        tcfg = self.tcfg
        full_text = list(ref_text_tokens) + list(text_tokens)
        codec_prefix = codec_prefix or [tcfg.codec_pad_id] * 4
        n_ref = int(ref_codes.shape[0])
        cache = base.init_cache(
            tcfg.transformer, 1,
            len(codec_prefix) + 2 + n_ref + max_frames + 8, jnp.bfloat16)
        emb = self.build_prefill(full_text, codec_prefix,
                                 spk_embed=spk_embed)
        _, _, cache = jax.jit(talker_step, static_argnames=("tcfg",))(
            self.tp, tcfg, emb, cache)
        text_pos = 1
        # teacher-force the reference frames (codec prompt replay)
        codes = jnp.asarray(ref_codes[0], jnp.int32)[None]
        for f in range(1, n_ref):
            tok = (full_text[text_pos] if text_pos < len(full_text)
                   else tcfg.tts_pad_token_id)
            text_pos += 1
            _, cache = self._step(self.tp, cache, codes,
                                  jnp.asarray([tok], jnp.int32))
            codes = jnp.asarray(ref_codes[f], jnp.int32)[None]
        # free-run generation continues from the reference context
        for f in range(max_frames):
            tok = (full_text[text_pos] if text_pos < len(full_text)
                   else tcfg.tts_pad_token_id)
            text_pos += 1
            codes, cache = self._step(self.tp, cache, codes,
                                      jnp.asarray([tok], jnp.int32))
            c = np.asarray(codes[0])
            if int(c[0]) == tcfg.codec_eos_id:
                break
            yield c

    def synthesize_voice_clone(self, ref_text_tokens: List[int],
                               text_tokens: List[int],
                               ref_mel: Optional[jax.Array] = None,
                               ref_samples: Optional[jax.Array] = None,
                               ref_codes: Optional[np.ndarray] = None,
                               spk_embed: Optional[jax.Array] = None,
                               max_frames: int = 600) -> GenerationResult:
        """Clone facade (reference: synthesize_voice_clone, lib.rs:615):
        speaker x-vector + reference codec replay + target text."""
        if spk_embed is None and ref_mel is not None:
            spk_embed = self.encode_speaker(ref_mel)
        if ref_codes is None:
            assert ref_samples is not None, "need ref_codes or ref_samples"
            ref_codes = self.encode_reference(ref_samples)
        frames = list(self.generate_frames_clone(
            ref_text_tokens, text_tokens, ref_codes, spk_embed,
            max_frames=max_frames))
        codes = np.stack(frames) if frames else np.zeros((0, 16), np.int32)
        return GenerationResult(codes=codes, frames=len(frames))

    def synthesize_voice_clone_instruct(self, ref_text_tokens, text_tokens,
                                        instruct_tokens: List[int],
                                        **kw) -> GenerationResult:
        """Clone + instruction: the instruct text prepends the target text
        (reference: generate_voice_clone_instruct)."""
        return self.synthesize_voice_clone(
            ref_text_tokens, list(instruct_tokens) + list(text_tokens), **kw)



# ------------------------------------------------------------------ MRoPE ---

def apply_mrope_tts(x: jax.Array, offset, temporal_section: int,
                    base: float = 1e6) -> jax.Array:
    """Temporal-only MRoPE with interleaved (traditional) rotation
    (reference: mrope.rs:23-110): the first ``temporal_section`` frequency
    pairs rotate with the temporal position, the rest are identity.

    x: [B, H, L, head_dim]."""
    B, H, L, hd = x.shape
    half = hd // 2
    inv_freq = 1.0 / (base ** (jnp.arange(temporal_section,
                                          dtype=jnp.float32) * 2.0 / hd))
    pos = offset + jnp.arange(L, dtype=jnp.float32)
    ang = pos[:, None] * inv_freq[None, :]                # [L, ts]
    cos = jnp.concatenate(
        [jnp.cos(ang), jnp.ones((L, half - temporal_section))], -1)
    sin = jnp.concatenate(
        [jnp.sin(ang), jnp.zeros((L, half - temporal_section))], -1)
    xf = x.astype(jnp.float32).reshape(B, H, L, half, 2)
    x0, x1 = xf[..., 0], xf[..., 1]                       # interleaved pairs
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], -1).reshape(B, H, L, hd).astype(x.dtype)


# ------------------------------------------------- speech encoder (clone) ---
#
# Mimi-style encoder (reference: speech_encoder.rs:1-470: "SEANet Conv
# Encoder -> Transformer -> Downsample -> RVQ"): turns reference audio into
# the same 16-codebook frame codes the talker consumes, enabling in-context
# voice cloning (the codec prompt replays the reference speech).

def _enc_res_block(p: dict, x: jax.Array) -> jax.Array:
    h = jax.nn.elu(x)
    h = causal_conv1d(p["conv1"], h)                      # C -> C/2, k=3
    h = jax.nn.elu(h)
    h = causal_conv1d(p["conv2"], h)                      # C/2 -> C, k=1
    if "shortcut" in p:
        x = causal_conv1d(p["shortcut"], x)
    return x + h


def _strided_conv(p: dict, x: jax.Array, stride: int) -> jax.Array:
    """Causal strided downsampling conv."""
    k = p["w"].shape[1]
    x = jnp.pad(x, ((0, 0), (k - stride, 0), (0, 0)))
    from ominix_mlx_tpu.nn.layers import conv1d as _c
    return _c(p, x, stride=stride)


def rvq_encode(codebook: jax.Array, x: jax.Array) -> jax.Array:
    """Nearest-neighbor code assignment: [B, T, D] -> [B, T] ids."""
    d = (jnp.sum(x * x, -1, keepdims=True)
         - 2.0 * jnp.einsum("btd,vd->btv", x, codebook)
         + jnp.sum(codebook * codebook, -1)[None, None])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def speech_encode(enc: dict, cfg: dict, samples: jax.Array) -> jax.Array:
    """samples [B, T] -> frame codes [B, frames, 16] (split RVQ: 1 semantic
    + 15 acoustic residual codebooks, speech_encoder.rs:306-360)."""
    x = samples[..., None]                                # [B, T, 1]
    x = causal_conv1d(enc["init_conv"], x)
    for blk, s in zip(enc["blocks"], cfg["enc_strides"]):
        x = _enc_res_block(blk["res"], x)
        x = jax.nn.elu(x)
        x = _strided_conv(blk["down"], x, s)
    x = causal_conv1d(enc["final_conv"], x)
    # transformer over frames
    tcfg = enc["_tcfg"]
    cache = base.init_cache(tcfg, x.shape[0], x.shape[1], x.dtype)
    h = x
    from ominix_mlx_tpu.core.attention import causal_mask
    mask = causal_mask(h.shape[1], h.shape[1], jnp.zeros((), jnp.int32))
    rope = tcfg.rope()
    for lp in enc["transformer_layers"]:
        h, _ = base.decoder_layer(lp, tcfg, h, cache.layers[0],
                                  jnp.zeros((), jnp.int32), mask, rope)
    x = h
    x = _strided_conv(enc["downsample"], x, 2)            # frame-rate halve
    # split RVQ encode: semantic (cb 0) + residual acoustic (cbs 1..15)
    sem_in = causal_conv1d(enc["semantic_input_proj"], x)
    c0 = rvq_encode(enc["semantic_codebook"], sem_in)
    ac_in = causal_conv1d(enc["acoustic_input_proj"], x)
    resid = ac_in
    codes = [c0]
    for cb in enc["acoustic_codebooks"]:
        ci = rvq_encode(cb, resid)
        resid = resid - cb[ci]
        codes.append(ci)
    return jnp.stack(codes, axis=-1)                      # [B, frames, 16]


def init_speech_encoder(key, dim: int = 32, enc_strides=(2, 2),
                        n_transformer: int = 1, num_heads: int = 4,
                        codec_vocab: int = 64, dtype=jnp.float32):
    """Random-init speech encoder + static cfg (tests / structure)."""
    ks = iter(jax.random.split(key, 200))

    def cconv(cin, cout, k):
        return {"w": jax.random.normal(next(ks), (cout, k, cin), dtype) * 0.05,
                "b": jnp.zeros((cout,), dtype)}

    tcfg = TransformerConfig(
        vocab_size=1, hidden_size=dim, num_layers=1, num_heads=num_heads,
        num_kv_heads=num_heads, head_dim=dim // num_heads,
        intermediate_size=2 * dim)
    enc = {
        "init_conv": cconv(1, dim, 7),
        "blocks": [{"res": {"conv1": cconv(dim, dim // 2, 3),
                            "conv2": cconv(dim // 2, dim, 1)},
                    "down": cconv(dim, dim, 2 * s)} for s in enc_strides],
        "final_conv": cconv(dim, dim, 3),
        "transformer_layers": [
            base.init_params(tcfg, next(ks), dtype)["layers"][0]
            for _ in range(n_transformer)],
        "downsample": cconv(dim, dim, 4),
        "semantic_input_proj": cconv(dim, dim, 1),
        "acoustic_input_proj": cconv(dim, dim, 1),
        "semantic_codebook": jax.random.normal(next(ks), (codec_vocab, dim),
                                               dtype) * 0.1,
        "acoustic_codebooks": [
            jax.random.normal(next(ks), (codec_vocab, dim), dtype) * 0.1
            for _ in range(15)],
        "_tcfg": tcfg,
    }
    return enc, {"enc_strides": tuple(enc_strides)}


# --------------------------------------------------------- server adapter ---

@dataclasses.dataclass
class TTSModel:
    """synthesize(text, voice) -> (samples, rate) server contract
    (reference API: README.md:472-490)."""
    synthesizer: Synthesizer
    tokenizer: object = None
    sample_rate: int = 24000
    voices: dict = dataclasses.field(default_factory=dict)  # name -> prefix

    def synthesize(self, text: str, voice: Optional[str] = None):
        toks = (self.tokenizer.encode(text) if self.tokenizer
                else [ord(c) % 1000 for c in text])
        tcfg = self.synthesizer.tcfg
        prefix = self.voices.get(voice or "", [tcfg.codec_pad_id] * 4)
        res = self.synthesizer.synthesize_codes(toks, prefix)
        if self.synthesizer.codec is None:
            raise RuntimeError("codec decoder weights not loaded")
        wav = self.synthesizer.decode_audio(res.codes)
        return wav.reshape(-1), self.sample_rate


def load_model(model_dir: str) -> TTSModel:
    """Canonical save format: talker.* / code_predictor nested under
    talker.*, codec.* tensors; config.json carries talker_config,
    codec_config, sample_rate."""
    import os

    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              unflatten_params)

    raw = load_config(model_dir)
    tc = raw.get("talker_config", {})
    tcfg = TalkerConfig(
        transformer=TransformerConfig.from_hf(tc.get("transformer", raw)),
        **{k: v for k, v in tc.items()
           if k in TalkerConfig.__dataclass_fields__ and k != "transformer"})
    tree = unflatten_params(load_safetensors(model_dir))
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        from ominix_mlx_tpu.utils.tokenizer import Tokenizer
        tok = Tokenizer(model_dir)
    syn = Synthesizer(tree["talker"], tcfg, codec_params=tree.get("codec"),
                      codec_cfg=raw.get("codec_config"),
                      spk_params=tree.get("speaker_encoder"),
                      speech_enc=tree.get("speech_encoder"))
    return TTSModel(synthesizer=syn, tokenizer=tok,
                    sample_rate=raw.get("sample_rate", 24000),
                    voices=raw.get("voices", {}))
