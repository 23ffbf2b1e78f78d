"""Multi-head Latent Attention (DeepSeek-V2/V3 style), absorbed form.

TPU-native counterpart of reference crate glm-4.7-flash-mlx (lib.rs:7-20,
model.rs:172-262): the kv_b_proj up-projection is folded ("absorbed") into
the query/output paths, so the KV cache stores only the 512-d compressed
latent + 64-d RoPE key per token (576 floats vs num_heads*head_dim*2), and
decode attention becomes MQA with a single shared KV head — ideal on TPU
(one [B,H,T,c] x [B,1,S,c] einsum, no GQA head replication).

Math (HF DeepseekV3Attention is the non-absorbed reference):
  q = q_b(rms(q_a(x)))            -> [B,T,H,nope+rope]
  c, k_rot = split(kv_a(x))       -> latent [B,T,Ckv], rope key [B,T,rope]
  absorbed: q_lat = q_nope @ W_UK -> [B,T,H,Ckv]
  scores   = (q_lat . c_s + q_rope . rot(k_rot_s)) * scale
  out      = (softmax(scores) @ c) @ W_UV^T -> o_proj
where kv_b_proj reshapes to W_UK [H, nope, Ckv] and W_UV [H, v, Ckv].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.attention import sdpa
from ominix_mlx_tpu.core.cache import KVCache
from ominix_mlx_tpu.core.rope import RopeConfig, apply_rope, make_rope
from ominix_mlx_tpu.nn.layers import linear, rms_norm


@dataclasses.dataclass(frozen=True)
class MLAConfig:
    num_heads: int
    q_lora_rank: Optional[int]
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_theta: float = 10000.0
    rope_interleave: bool = True
    rope_scaling: Optional[dict] = None
    rms_norm_eps: float = 1e-6

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def scale(self) -> float:
        s = self.qk_head_dim ** -0.5
        if self.rope_scaling:
            m_all = self.rope_scaling.get("mscale_all_dim", 0)
            factor = self.rope_scaling.get("factor", 1.0)
            if m_all and factor > 1.0:
                mscale = 0.1 * m_all * math.log(factor) + 1.0
                s = s * mscale * mscale
        return s

    def rope(self) -> RopeConfig:
        return make_rope(self.qk_rope_head_dim, self.rope_theta,
                         traditional=self.rope_interleave)


def absorb_kv_b(kv_b_weight: jax.Array, mcfg: MLAConfig):
    """kv_b_proj weight [H*(nope+v), Ckv] -> (W_UK [H, nope, Ckv],
    W_UV [H, v, Ckv]) — the load-time fold (reference: lib.rs:7-20)."""
    H = mcfg.num_heads
    w = kv_b_weight.reshape(H, mcfg.qk_nope_head_dim + mcfg.v_head_dim,
                            mcfg.kv_lora_rank)
    return w[:, :mcfg.qk_nope_head_dim], w[:, mcfg.qk_nope_head_dim:]


def init_cache_layer(batch: int, mcfg: MLAConfig, max_len: int,
                     dtype=jnp.bfloat16) -> KVCache:
    """Latent cache: one shared 'head' of (Ckv + rope) dims; the v buffer
    aliases the latent part (stored once, v=k[..., :Ckv] views are free in
    XLA). We keep KVCache shape with v as latent-only for clarity."""
    return KVCache(
        k=jnp.zeros((batch, 1, max_len,
                     mcfg.kv_lora_rank + mcfg.qk_rope_head_dim), dtype),
        v=jnp.zeros((batch, 1, max_len, mcfg.kv_lora_rank), dtype))


def attention_block(lp: dict, mcfg: MLAConfig, x: jax.Array, cache: KVCache,
                    offset: jax.Array, mask: jax.Array):
    """x: [B, T, D] -> ([B, T, D], cache). Absorbed MLA."""
    B, T, _ = x.shape
    H = mcfg.num_heads
    rope = mcfg.rope()

    if mcfg.q_lora_rank is None:
        q = linear(lp["q_proj"], x)
    else:
        q = linear(lp["q_b_proj"],
                   rms_norm(lp["q_a_layernorm"], linear(lp["q_a_proj"], x),
                            mcfg.rms_norm_eps))
    q = q.reshape(B, T, H, mcfg.qk_head_dim)
    q_nope = q[..., :mcfg.qk_nope_head_dim]
    q_rope = q[..., mcfg.qk_nope_head_dim:]

    ckv = linear(lp["kv_a_proj_with_mqa"], x)
    c = rms_norm(lp["kv_a_layernorm"], ckv[..., :mcfg.kv_lora_rank],
                 mcfg.rms_norm_eps)                       # [B, T, Ckv]
    k_rot = ckv[..., mcfg.kv_lora_rank:]                  # [B, T, rope]

    # vector offsets: continuous-batching slots decode at per-row positions
    positions = (offset[:, None] if getattr(offset, "ndim", 0) == 1
                 else offset) + jnp.arange(T, dtype=jnp.int32)
    # [B, H, T, rope] / [B, 1, T, rope]
    q_rope = apply_rope(q_rope.transpose(0, 2, 1, 3), positions, rope)
    k_rot = apply_rope(k_rot[:, None], positions, rope)

    w_uk, w_uv = lp["w_uk"], lp["w_uv"]                   # [H, nope|v, Ckv]
    q_lat = jnp.einsum("bthn,hnc->bhtc", q_nope, w_uk)    # [B, H, T, Ckv]
    q_cat = jnp.concatenate([q_lat, q_rope], -1)          # [B, H, T, Ckv+rope]

    k_new = jnp.concatenate([c[:, None], k_rot], -1)      # [B, 1, T, Ckv+rope]
    cache = cache.update(k_new, c[:, None], offset)

    out_lat = sdpa(q_cat, cache.k, cache.v, scale=mcfg.scale, mask=mask)
    out = jnp.einsum("bhtc,hvc->bthv", out_lat.astype(x.dtype), w_uv)
    return linear(lp["o_proj"], out.reshape(B, T, -1)), cache
