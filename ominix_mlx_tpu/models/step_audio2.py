"""Step-Audio-2-mini: speech-to-speech pipeline (ASR-style understanding +
token-to-speech back-end).

TPU-native counterpart of reference crate step-audio2-mlx:
  - Pipeline presets asr_only / with_think / with_tools / with_tts
    (pipeline.rs:43-108)
  - audio encoder + adaptor + Qwen-style LLM (encoder.rs, llm.rs) — shares
    the funasr_nano encoder/adaptor/splice machinery
  - <think> reasoning-token handling (think.rs) -> utils.tokenizer.ThinkFilter
  - tool-call parsing (tools.rs) -> parse_tool_calls below
  - TTS back-end: audio tokens -> 10-step rectified-flow mel decoder
    (tts/flow.rs:10,126) -> HiFiGAN vocoder (tts/hifigan.rs ->
    models/hifigan.py)
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import hifigan
from ominix_mlx_tpu.models.dit.common import denoise
from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear


# ------------------------------------------------------------ tool calls ----

TOOL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.S)


def parse_tool_calls(text: str):
    """Extract tool-call JSON blocks (reference: tools.rs, 710 LoC)."""
    calls = []
    for m in TOOL_RE.finditer(text):
        try:
            calls.append(json.loads(m.group(1)))
        except json.JSONDecodeError:
            continue
    return calls, TOOL_RE.sub("", text).strip()


# ---------------------------------------------------- rectified flow TTS ----

@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Token-conditioned mel flow decoder (reference: tts/flow.rs)."""
    token_vocab: int = 4096
    token_dim: int = 256
    mel_dim: int = 80
    hidden: int = 256
    layers: int = 4
    num_steps: int = 10


def flow_velocity(p: dict, fcfg: FlowConfig, mel: jax.Array, t: jax.Array,
                  cond: jax.Array) -> jax.Array:
    """Conv/MLP velocity field v(mel_t, t | token embeddings).

    mel: [B, T, mel_dim]; cond: [B, T, token_dim]; t scalar in [0,1].
    """
    from ominix_mlx_tpu.models.dit.common import timestep_embedding

    temb = timestep_embedding(jnp.full((mel.shape[0],), t * 1000.0), 128)
    temb = linear(p["t_proj"], temb.astype(mel.dtype))[:, None]
    h = linear(p["in_proj"], jnp.concatenate([mel, cond], -1)) + temb
    for lp in p["layers"]:
        r = layer_norm(lp["norm"], h)
        from ominix_mlx_tpu.nn.layers import conv1d
        r = conv1d(lp["conv"], jax.nn.gelu(r), padding=2)
        r = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], r)))
        h = h + r
    return linear(p["out_proj"], h)


def flow_decode(p: dict, fcfg: FlowConfig, tokens: jax.Array,
                key=None) -> jax.Array:
    """Audio tokens [B, T] -> mel [B, T, mel_dim] via num_steps Euler flow
    (reference: tts/flow.rs 10-step rectified flow)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    cond = p["token_embed"][tokens]
    B, T, _ = cond.shape
    z = jax.random.normal(key, (B, T, fcfg.mel_dim), jnp.float32)
    ts = np.linspace(1.0, 0.0, fcfg.num_steps + 1).astype(np.float32)

    def v_fn(zz, t):
        return flow_velocity(p, fcfg, zz.astype(cond.dtype), t, cond)

    return denoise(jax.jit(v_fn), z, ts)


def init_flow(fcfg: FlowConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 6 * fcfg.layers + 8))
    h = fcfg.hidden
    return {
        "token_embed": jax.random.normal(
            next(ks), (fcfg.token_vocab, fcfg.token_dim), dtype) * 0.02,
        "t_proj": init_linear(next(ks), 128, h, True, dtype),
        "in_proj": init_linear(next(ks), fcfg.mel_dim + fcfg.token_dim, h,
                               True, dtype),
        "layers": [{
            "norm": {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
            "conv": {"w": jax.random.normal(next(ks), (h, 5, h), dtype) * 0.02,
                     "b": jnp.zeros((h,), dtype)},
            "fc1": init_linear(next(ks), h, 2 * h, True, dtype),
            "fc2": init_linear(next(ks), 2 * h, h, True, dtype),
        } for _ in range(fcfg.layers)],
        "out_proj": init_linear(next(ks), h, fcfg.mel_dim, True, dtype),
    }


# ---------------------------------------------------------- pipeline --------

@dataclasses.dataclass
class Pipeline:
    """asr_only / with_think / with_tools / with_tts presets
    (reference: pipeline.rs:43-108). The understanding side reuses
    funasr_nano's encoder->adaptor->LLM splice; this class adds the
    think/tool postprocessing and the speech back-end."""

    asr: object                              # FunASRNano-like
    flow_params: Optional[dict] = None
    flow_cfg: Optional[FlowConfig] = None
    hifi_params: Optional[dict] = None
    hifi_cfg: Optional[hifigan.HiFiGANConfig] = None
    s3_params: Optional[dict] = None         # speech-input tokenizer
    s3_cfg: Optional["S3Config"] = None
    mode: str = "asr_only"

    def tokenize_speech(self, mel: jax.Array) -> jax.Array:
        """mel [B, T, 128] -> 25Hz discrete codes (S3 tokenizer) — the
        speech INPUT path of speech-to-speech (s3tokenizer_mlx.rs)."""
        assert self.s3_params is not None, "S3 tokenizer weights not loaded"
        return s3_encode(self.s3_params, self.s3_cfg, mel)

    def respond_tokens(self, feats, prompt_prefix, prompt_suffix,
                       max_tokens=128, stop_tokens=()):
        return self.asr.transcribe_tokens(feats, prompt_prefix, prompt_suffix,
                                          max_tokens, stop_tokens)

    def postprocess(self, text: str):
        from ominix_mlx_tpu.utils.tokenizer import ThinkFilter

        calls = []
        if self.mode in ("with_tools",):
            calls, text = parse_tool_calls(text)
        if self.mode in ("with_think", "with_tools"):
            f = ThinkFilter()
            text = f.feed(text + " ")[:-1] if text else text
        return text, calls

    def speak(self, audio_tokens: jax.Array, key=None) -> np.ndarray:
        """audio tokens -> mel (rectified flow) -> waveform (HiFiGAN)."""
        assert self.flow_params is not None and self.hifi_params is not None
        mel = flow_decode(self.flow_params, self.flow_cfg, audio_tokens, key)
        wav = hifigan.vocode(self.hifi_params, self.hifi_cfg,
                             mel.astype(jnp.float32))
        return np.asarray(wav[0], np.float32)


# ----------------------------------------------------------- S3 tokenizer ---
#
# Speech -> discrete 25Hz codes, the INPUT side of speech-to-speech
# (reference: step-audio2-mlx/src/tts/s3tokenizer_mlx.rs, 580 LoC):
# mel 128 -> two k=3 convs (gelu) -> 6 FSMN-attention blocks (depthwise
# temporal-memory conv on V) -> linear to an 8-dim latent -> 81-level
# scalar quantization, code = d0*81 + d1 (codebook 6561).

@dataclasses.dataclass(frozen=True)
class S3Config:
    """Defaults: s3tokenizer_mlx.rs:59-70."""
    mel_dim: int = 128
    hidden_dim: int = 1280
    ffn_dim: int = 5120
    num_heads: int = 8
    num_blocks: int = 6
    fsmn_kernel_size: int = 31
    output_dim: int = 8
    quant_levels: int = 81


def _s3_fsmn(p: dict, v: jax.Array, k: int) -> jax.Array:
    """Depthwise temporal-memory conv added to V (FSMN)."""
    from ominix_mlx_tpu.nn.layers import conv1d
    C = v.shape[-1]
    return v + conv1d(p, v, padding=(k - 1) // 2, groups=C)


def _s3_block(p: dict, cfg: S3Config, x: jax.Array) -> jax.Array:
    from ominix_mlx_tpu.nn.layers import layer_norm, linear
    B, T, C = x.shape
    H = cfg.num_heads
    hd = C // H
    h = layer_norm(p["norm1"], x)
    q = linear(p["q_proj"], h).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = linear(p["k_proj"], h).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    v0 = linear(p["v_proj"], h)
    v0 = _s3_fsmn(p["fsmn"], v0, cfg.fsmn_kernel_size)
    v = v0.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd ** -0.5, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
    x = x + linear(p["out_proj"], o)
    h = layer_norm(p["norm2"], x)
    h = jax.nn.gelu(linear(p["ffn_up"], h))
    return x + linear(p["ffn_down"], h)


def s3_encode(params: dict, cfg: S3Config, mel: jax.Array) -> jax.Array:
    """mel [B, T, 128] -> codes [B, T'] in [0, 6560]
    (reference encode + quantize, s3tokenizer_mlx.rs:440-520)."""
    from ominix_mlx_tpu.nn.layers import conv1d, linear
    h = jax.nn.gelu(conv1d(params["input_conv1"], mel, padding=1))
    h = jax.nn.gelu(conv1d(params["input_conv2"], h, stride=2, padding=1))
    for bp in params["blocks"]:
        h = _s3_block(bp, cfg, h)
    latent = linear(params["output_proj"], h)             # [B, T', 8]
    lv = (cfg.quant_levels - 1) / 2.0                     # 40
    q = jnp.round(jnp.clip(latent, -1.0, 1.0) * lv)
    idx = (q + lv).astype(jnp.int32)                      # [0, 80]
    codes = idx[..., 0] * cfg.quant_levels + idx[..., 1]
    return jnp.clip(codes, 0, cfg.quant_levels ** 2 - 1)


def init_s3(cfg: S3Config, key, dtype=jnp.float32) -> dict:
    from ominix_mlx_tpu.nn.layers import init_linear
    ks = iter(jax.random.split(key, 12 * cfg.num_blocks + 8))

    def cconv(cin, cout, k, groups=1):
        s = (cin * k / groups) ** -0.5
        return {"w": jax.random.uniform(next(ks), (cout, k, cin // groups),
                                        dtype, -s, s),
                "b": jnp.zeros((cout,), dtype)}

    def norm(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    D = cfg.hidden_dim
    return {
        "input_conv1": cconv(cfg.mel_dim, D, 3),
        "input_conv2": cconv(D, D, 3),
        "blocks": [{
            "norm1": norm(D), "norm2": norm(D),
            "q_proj": init_linear(next(ks), D, D, True, dtype),
            "k_proj": init_linear(next(ks), D, D, False, dtype),
            "v_proj": init_linear(next(ks), D, D, True, dtype),
            "fsmn": cconv(D, D, cfg.fsmn_kernel_size, groups=D),
            "out_proj": init_linear(next(ks), D, D, True, dtype),
            "ffn_up": init_linear(next(ks), D, cfg.ffn_dim, True, dtype),
            "ffn_down": init_linear(next(ks), cfg.ffn_dim, D, True, dtype),
        } for _ in range(cfg.num_blocks)],
        "output_proj": init_linear(next(ks), D, cfg.output_dim, True, dtype),
    }


def s3_params_from_flat(flat: dict, cfg: S3Config) -> dict:
    """Checkpoint name map (reference: load_weights name pairs,
    s3tokenizer_mlx.rs:345-415). Conv weights arrive torch [out, in, k]."""
    def conv(name, groups=1):
        w = jnp.asarray(flat[f"{name}.weight"])
        p = {"w": jnp.transpose(w, (0, 2, 1))}
        if f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def lin(name, bias=True):
        p = {"w": jnp.asarray(flat[f"{name}.weight"])}
        if bias and f"{name}.bias" in flat:
            p["b"] = jnp.asarray(flat[f"{name}.bias"])
        return p

    def norm(name):
        return {"w": jnp.asarray(flat[f"{name}.weight"]),
                "b": jnp.asarray(flat[f"{name}.bias"])}

    return {
        "input_conv1": conv("input_conv1"),
        "input_conv2": conv("input_conv2"),
        "blocks": [{
            "norm1": norm(f"blocks.{i}.norm1"),
            "norm2": norm(f"blocks.{i}.norm2"),
            "q_proj": lin(f"blocks.{i}.attn.q_proj"),
            "k_proj": lin(f"blocks.{i}.attn.k_proj", bias=False),
            "v_proj": lin(f"blocks.{i}.attn.v_proj"),
            "fsmn": conv(f"blocks.{i}.attn.fsmn.weight"
                         if f"blocks.{i}.attn.fsmn.weight.weight" in flat
                         else f"blocks.{i}.attn.fsmn"),
            "out_proj": lin(f"blocks.{i}.attn.out_proj"),
            "ffn_up": lin(f"blocks.{i}.ffn.up_proj"),
            "ffn_down": lin(f"blocks.{i}.ffn.down_proj"),
        } for i in range(cfg.num_blocks)],
        "output_proj": lin("output_proj"),
    }


def load_model(model_dir: str):
    """Canonical save format: s3.* / flow.* / hifigan.* / llm.* tensors.
    Returns a Pipeline wired with the S3 tokenizer front and flow+HiFiGAN
    back (reference: pipeline.rs:43-108)."""
    from ominix_mlx_tpu.utils.loading import (load_config, load_safetensors,
                                              unflatten_params)

    raw = load_config(model_dir)
    tree = unflatten_params(load_safetensors(model_dir))
    from ominix_mlx_tpu.models.base import TransformerConfig
    lm_cfg = (TransformerConfig.from_hf(raw["text_config"])
              if "text_config" in raw else None)
    scfg = S3Config(**{k: v for k, v in raw.get("s3_config", {}).items()
                       if k in S3Config.__dataclass_fields__})
    fcfg = FlowConfig(**{k: v for k, v in raw.get("flow_config", {}).items()
                         if k in FlowConfig.__dataclass_fields__}) \
        if "flow_config" in raw else None
    asr = None
    if "encoder" in tree and "llm" in tree and lm_cfg is not None:
        from ominix_mlx_tpu.models import funasr_nano, paraformer
        acfg = funasr_nano.AdaptorConfig(
            out_dim=lm_cfg.hidden_size,
            **{k: v for k, v in raw.get("adaptor_conf", {}).items()
               if k in funasr_nano.AdaptorConfig.__dataclass_fields__
               and k != "out_dim"})
        asr = funasr_nano.FunASRNano(
            enc_params=tree["encoder"],
            enc_cfg=paraformer.ParaformerConfig(
                **{k: v for k, v in raw.get("audio_encoder_conf", {}).items()
                   if k in paraformer.ParaformerConfig.__dataclass_fields__}),
            adaptor_params=tree.get("adaptor"), adaptor_cfg=acfg,
            lm_params=tree["llm"], lm_cfg=lm_cfg)
    return Pipeline(
        asr=asr,
        flow_params=tree.get("flow"), flow_cfg=fcfg,
        hifi_params=tree.get("hifigan"),
        hifi_cfg=hifigan.HiFiGANConfig(**raw.get("hifigan_config", {}))
        if "hifigan_config" in raw else None,
        s3_params=tree.get("s3"), s3_cfg=scfg,
        mode=raw.get("mode", "asr_only"))
