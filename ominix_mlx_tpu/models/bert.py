"""BERT encoder (post-LayerNorm) — phoneme-level features for GPT-SoVITS.

TPU-native counterpart of reference gpt-sovits-mlx/src/models/bert.rs
(1062 LoC, chinese-roberta-wwm-ext): token/position/type embeddings +
post-LN transformer; GPT-SoVITS extracts word-level hidden states and
repeats them per phoneme as T2S conditioning (voice_clone.rs text path).
HF parity tested against transformers BertModel.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    eps: float = 1e-12


def encode(params: dict, cfg: BertConfig, tokens: jax.Array,
           token_type_ids=None) -> jax.Array:
    """tokens: [B, T] -> hidden states [B, T, D] (bidirectional)."""
    B, T = tokens.shape
    x = (params["word_embeddings"][tokens]
         + params["position_embeddings"][jnp.arange(T)][None])
    tt = token_type_ids if token_type_ids is not None \
        else jnp.zeros_like(tokens)
    x = x + params["token_type_embeddings"][tt]
    x = layer_norm(params["emb_norm"], x, cfg.eps)
    H = cfg.num_heads
    hd = cfg.hidden_size // H
    for p in params["layers"]:
        q = linear(p["q"], x).reshape(B, T, H, hd)
        k = linear(p["k"], x).reshape(B, T, H, hd)
        v = linear(p["v"], x).reshape(B, T, H, hd)
        a = jax.nn.softmax(
            jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd),
            -1)
        o = jnp.einsum("bhts,bshd->bthd", a.astype(v.dtype), v)
        o = linear(p["attn_out"], o.reshape(B, T, cfg.hidden_size))
        x = layer_norm(p["attn_norm"], x + o, cfg.eps)      # post-LN
        h = linear(p["ffn_out"], jax.nn.gelu(linear(p["ffn_in"], x)))
        x = layer_norm(p["ffn_norm"], x + h, cfg.eps)
    return x


def params_from_hf(flat: dict, cfg: BertConfig) -> dict:
    e = "embeddings"
    params = {
        "word_embeddings": flat[f"{e}.word_embeddings.weight"],
        "position_embeddings": flat[f"{e}.position_embeddings.weight"],
        "token_type_embeddings": flat[f"{e}.token_type_embeddings.weight"],
        "emb_norm": {"w": flat[f"{e}.LayerNorm.weight"],
                     "b": flat[f"{e}.LayerNorm.bias"]},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        def lin(name):
            return {"w": flat[f"{p}.{name}.weight"],
                    "b": flat[f"{p}.{name}.bias"]}
        params["layers"].append({
            "q": lin("attention.self.query"),
            "k": lin("attention.self.key"),
            "v": lin("attention.self.value"),
            "attn_out": lin("attention.output.dense"),
            "attn_norm": {"w": flat[f"{p}.attention.output.LayerNorm.weight"],
                          "b": flat[f"{p}.attention.output.LayerNorm.bias"]},
            "ffn_in": lin("intermediate.dense"),
            "ffn_out": lin("output.dense"),
            "ffn_norm": {"w": flat[f"{p}.output.LayerNorm.weight"],
                         "b": flat[f"{p}.output.LayerNorm.bias"]},
        })
    return params


def init_params(cfg: BertConfig, key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_layers + 8))
    D = cfg.hidden_size
    n = lambda: {"w": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}
    return {
        "word_embeddings": jax.random.normal(next(ks), (cfg.vocab_size, D),
                                             dtype) * 0.02,
        "position_embeddings": jax.random.normal(
            next(ks), (cfg.max_position, D), dtype) * 0.02,
        "token_type_embeddings": jax.random.normal(
            next(ks), (cfg.type_vocab_size, D), dtype) * 0.02,
        "emb_norm": n(),
        "layers": [{
            "q": init_linear(next(ks), D, D, True, dtype),
            "k": init_linear(next(ks), D, D, True, dtype),
            "v": init_linear(next(ks), D, D, True, dtype),
            "attn_out": init_linear(next(ks), D, D, True, dtype),
            "attn_norm": n(),
            "ffn_in": init_linear(next(ks), D, cfg.intermediate_size, True,
                                  dtype),
            "ffn_out": init_linear(next(ks), cfg.intermediate_size, D, True,
                                   dtype),
            "ffn_norm": n(),
        } for _ in range(cfg.num_layers)],
    }
