"""CT-Transformer punctuation restoration (FunASR).

TPU-native counterpart of reference funasr-mlx/src/punctuation.rs (which
runs the model via ONNX Runtime): the CT-Transformer is an embedding +
SAN-M encoder stack + 6-class token classifier, so the encoder layers are
shared with models/paraformer.py and the whole forward is one jit. Text
segmentation / reconstruction semantics match punctuation.rs:150-215
(CJK chars tokenize individually, ASCII words group; classes
["<unk>", "", "，", "。", "？", "、"]; output always ends with sentence
punctuation).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.models import paraformer as pf
from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear

PUNC_SYMBOLS = ("<unk>", "", "，", "。", "？", "、")
_SENTENCE_END = ("。", "？", "！", ".", "?", "!")


@dataclasses.dataclass(frozen=True)
class PunctuationConfig:
    vocab_size: int = 272727
    hidden: int = 256
    layers: int = 6
    heads: int = 8
    ffn: int = 1024
    sanm_kernel: int = 11
    num_classes: int = 6


# ----------------------------------------------------------- text utils ----

def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF)


def segment_text(text: str) -> List[str]:
    """CJK characters as single tokens, ASCII words grouped
    (punctuation.rs:150-177)."""
    out: List[str] = []
    word = ""
    for ch in text:
        if _is_cjk(ch):
            if word:
                out.append(word)
                word = ""
            out.append(ch)
        elif ch.isspace():
            if word:
                out.append(word)
                word = ""
        else:
            word += ch
    if word:
        out.append(word)
    return out


def _is_ascii_word(s: str) -> bool:
    return bool(s) and all(ord(c) < 128 for c in s)


def ensure_sentence_ending(text: str) -> str:
    """Append 。 (CJK tail) or . (ASCII tail) when missing
    (punctuation.rs:196-215)."""
    t = text.rstrip()
    if not t or t.endswith(_SENTENCE_END):
        return t
    if t.endswith(("，", "、")):
        t = t[:-1]
    return t + ("。" if _is_cjk(t[-1]) else ".")


# -------------------------------------------------------------- model ------

def forward(params: dict, cfg: PunctuationConfig,
            token_ids: jax.Array) -> jax.Array:
    """[B, T] int32 -> [B, T, num_classes] logits."""
    x = params["embed"][token_ids] * (cfg.hidden ** 0.5)
    T = token_ids.shape[1]
    x = x + jnp.asarray(pf.sinusoid_pe(T, cfg.hidden), x.dtype)[None]
    for lp in params["layers"]:
        x = pf.encoder_layer(lp, x, cfg.heads, residual_attn=True)
    x = layer_norm(params["after_norm"], x)
    return linear(params["classifier"], x)


def init_params(cfg: PunctuationConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.layers + 8))

    def norm_p(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def enc_layer():
        d = cfg.hidden
        return {
            "norm1": norm_p(d), "norm2": norm_p(d),
            "self_attn": {
                "linear_q_k_v": init_linear(next(ks), d, 3 * d, True, dtype),
                "out_proj": init_linear(next(ks), d, d, True, dtype),
                "fsmn_block": {"w": jax.random.normal(
                    next(ks), (d, cfg.sanm_kernel, 1), dtype) * 0.05},
            },
            "ffn_up": init_linear(next(ks), d, cfg.ffn, True, dtype),
            "ffn_down": init_linear(next(ks), cfg.ffn, d, True, dtype),
        }

    return {
        "embed": jax.random.normal(next(ks), (cfg.vocab_size, cfg.hidden),
                                   dtype) * 0.02,
        "layers": [enc_layer() for _ in range(cfg.layers)],
        "after_norm": norm_p(cfg.hidden),
        "classifier": init_linear(next(ks), cfg.hidden, cfg.num_classes,
                                  True, dtype),
    }


class PunctuationModel:
    """punctuate(text) facade (reference PunctuationModel::punctuate)."""

    def __init__(self, params: dict, cfg: PunctuationConfig,
                 vocab: Optional[Dict[str, int]] = None, unk_id: int = 0):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab or {}
        self.unk_id = unk_id
        self._fwd = jax.jit(lambda p, t: forward(p, cfg, t))

    @staticmethod
    def load(model_dir: str) -> "PunctuationModel":
        """Load from a FunASR punc dir: tokens.json + safetensors weights
        (converted via utils/convert.py) or an ONNX export parsed by
        utils/onnx_import.py."""
        with open(os.path.join(model_dir, "tokens.json"), encoding="utf-8") as f:
            toks = json.load(f)
        vocab = ({t: i for i, t in enumerate(toks)}
                 if isinstance(toks, list) else toks)
        cfg = PunctuationConfig(vocab_size=len(vocab))
        from ominix_mlx_tpu.utils.loading import load_safetensors
        flat = load_safetensors(model_dir)
        params = params_from_flat(flat, cfg)
        return PunctuationModel(params, cfg, vocab,
                                unk_id=vocab.get("<unk>", 0))

    def punctuate(self, text: str) -> str:
        if not text:
            return ""
        tokens = segment_text(text)
        if not tokens:
            return text
        ids = jnp.asarray([[self.vocab.get(t, self.unk_id)
                            for t in tokens]], jnp.int32)
        logits = self._fwd(self.params, ids)
        classes = [int(c) for c in jnp.argmax(logits[0], -1)]
        out = []
        for i, tok in enumerate(tokens):
            if i and _is_ascii_word(tok) and _is_ascii_word(tokens[i - 1]):
                out.append(" ")
            out.append(tok)
            c = classes[i]
            if 2 <= c < len(PUNC_SYMBOLS):
                out.append(PUNC_SYMBOLS[c])
        return ensure_sentence_ending("".join(out))


def params_from_flat(flat: dict, cfg: PunctuationConfig) -> dict:
    """Map FunASR CT-Transformer tensor names (punc.pt layout) to ours."""
    import numpy as np

    def j(name):
        return jnp.asarray(np.asarray(flat[name]))

    def lin(pre):
        p = {"w": j(f"{pre}.weight")}
        if f"{pre}.bias" in flat:
            p["b"] = j(f"{pre}.bias")
        return p

    def norm(pre):
        return {"w": j(f"{pre}.weight"), "b": j(f"{pre}.bias")}

    layers = []
    i = 0
    while f"encoder.encoders.{i}.self_attn.linear_q_k_v.weight" in flat:
        pre = f"encoder.encoders.{i}"
        layers.append({
            "norm1": norm(f"{pre}.norm1"),
            "norm2": norm(f"{pre}.norm2"),
            "self_attn": {
                "linear_q_k_v": lin(f"{pre}.self_attn.linear_q_k_v"),
                "out_proj": lin(f"{pre}.self_attn.linear_out"),
                "fsmn_block": {"w": j(f"{pre}.self_attn.fsmn_block.weight")
                               .transpose(0, 2, 1)},
            },
            "ffn_up": lin(f"{pre}.feed_forward.w_1"),
            "ffn_down": lin(f"{pre}.feed_forward.w_2"),
        })
        i += 1
    return {
        "embed": j("embed.0.weight"),
        "layers": layers,
        "after_norm": norm("encoder.after_norm"),
        "classifier": lin("decoder"),
    }
