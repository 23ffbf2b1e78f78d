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
    mode: str = "asr_only"

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
