"""Gated DeltaNet linear attention (Qwen3-Next / qwen3.5 hybrid layers).

TPU-native counterpart of reference qwen3.5-35B-mlx/src/deltanet.rs:27-135:
fixed-size recurrent state + causal depthwise conv window, with a separate
decode step and sequence prefill. Recurrence (delta rule with per-head decay,
matches HF torch_recurrent_gated_delta_rule):

    S_t = S_{t-1} * exp(g_t)
    delta_t = (v_t - k_t^T S_t) * beta_t
    S_t += outer(k_t, delta_t)
    o_t = q_t^T S_t        (q, k are l2-normalized; q scaled dk^-0.5)

Prefill runs the recurrence under lax.scan (compiler-friendly sequential
form; the chunked-parallel Pallas kernel is the planned fast path, reference
chunked prefill: deltanet.rs:135). State cache: [B, Hv, dk, dv] + conv
window [B, K-1, conv_dim] — O(1) memory in sequence length.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import linear, rms_norm


@dataclasses.dataclass(frozen=True)
class DeltaNetConfig:
    num_v_heads: int
    num_k_heads: int
    head_k_dim: int
    head_v_dim: int
    conv_kernel: int = 4
    rms_norm_eps: float = 1e-6

    @property
    def key_dim(self):
        return self.head_k_dim * self.num_k_heads

    @property
    def value_dim(self):
        return self.head_v_dim * self.num_v_heads

    @property
    def conv_dim(self):
        return 2 * self.key_dim + self.value_dim


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RecurrentCache:
    """Reference: qwen3.5-35B-mlx/src/cache.rs:9-36 RecurrentState."""
    state: jax.Array       # [B, Hv, dk, dv] f32
    conv: jax.Array        # [B, K-1, conv_dim]

    @staticmethod
    def init(batch: int, dcfg: DeltaNetConfig, dtype=jnp.bfloat16):
        return RecurrentCache(
            state=jnp.zeros((batch, dcfg.num_v_heads, dcfg.head_k_dim,
                             dcfg.head_v_dim), jnp.float32),
            conv=jnp.zeros((batch, dcfg.conv_kernel - 1, dcfg.conv_dim),
                           dtype))


def _split_qkvz_ba(qkvz, ba, dcfg: DeltaNetConfig):
    """HF fix_query_key_value_ordering: per-k-head interleaved packing."""
    B, T, _ = qkvz.shape
    Hk, Hv = dcfg.num_k_heads, dcfg.num_v_heads
    r = Hv // Hk
    dk, dv = dcfg.head_k_dim, dcfg.head_v_dim
    qkvz = qkvz.reshape(B, T, Hk, 2 * dk + 2 * r * dv)
    q = qkvz[..., :dk]
    k = qkvz[..., dk:2 * dk]
    v = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(B, T, Hv, dv)
    z = qkvz[..., 2 * dk + r * dv:].reshape(B, T, Hv, dv)
    ba = ba.reshape(B, T, Hk, 2 * r)
    b = ba[..., :r].reshape(B, T, Hv)
    a = ba[..., r:].reshape(B, T, Hv)
    return q, k, v, z, b, a


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


def _causal_conv(lp, x, conv_state, dcfg: DeltaNetConfig):
    """Depthwise causal conv over [B, T, conv_dim] with carried window.
    Returns (silu(conv(x)), new window of last K-1 inputs)."""
    K = dcfg.conv_kernel
    w = lp["conv1d"]["w"]            # [conv_dim, K, 1] (MLX layout) or [conv_dim, 1, K]
    w = w.reshape(dcfg.conv_dim, K)  # depthwise taps
    full = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # [B, K-1+T, C]
    T = x.shape[1]
    idx = jnp.arange(T)[:, None] + jnp.arange(K)[None, :]
    windows = full[:, idx]                       # [B, T, K, C]
    out = jnp.einsum("btkc,ck->btc", windows, w.astype(x.dtype))
    new_state = full[:, -(K - 1):] if K > 1 else conv_state
    return jax.nn.silu(out), new_state


def block(lp: dict, dcfg: DeltaNetConfig, x: jax.Array,
          cache: RecurrentCache):
    """x: [B, T, D] -> ([B, T, D], new cache)."""
    B, T, _ = x.shape
    qkvz = linear(lp["in_proj_qkvz"], x)
    ba = linear(lp["in_proj_ba"], x)
    q, k, v, z, b, a = _split_qkvz_ba(qkvz, ba, dcfg)

    mixed = jnp.concatenate([q.reshape(B, T, -1), k.reshape(B, T, -1),
                             v.reshape(B, T, -1)], -1)
    mixed, conv_state = _causal_conv(lp, mixed, cache.conv, dcfg)
    kd, vd = dcfg.key_dim, dcfg.value_dim
    q = mixed[..., :kd].reshape(B, T, dcfg.num_k_heads, dcfg.head_k_dim)
    k = mixed[..., kd:2 * kd].reshape(B, T, dcfg.num_k_heads, dcfg.head_k_dim)
    v = mixed[..., 2 * kd:].reshape(B, T, dcfg.num_v_heads, dcfg.head_v_dim)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))                  # [B, T, Hv]
    g = (-jnp.exp(lp["A_log"].astype(jnp.float32))
         * jax.nn.softplus(a.astype(jnp.float32)
                           + lp["dt_bias"].astype(jnp.float32)))  # [B, T, Hv]

    r = dcfg.num_v_heads // dcfg.num_k_heads
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    q = _l2norm(q.astype(jnp.float32)) * dcfg.head_k_dim ** -0.5
    k = _l2norm(k.astype(jnp.float32))
    v = v.astype(jnp.float32)

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp                 # [B,Hv,dk] etc.
        S = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        S = S + jnp.einsum("bhk,bhv->bhkv", k_t, delta)
        o_t = jnp.einsum("bhkv,bhk->bhv", S, q_t)
        return S, o_t

    seq = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
           v.transpose(1, 0, 2, 3), g.transpose(1, 0, 2),
           beta.transpose(1, 0, 2))
    S, outs = jax.lax.scan(step, cache.state, seq)
    out = outs.transpose(1, 0, 2, 3)                  # [B, T, Hv, dv]

    # gated RMSNorm: rms(out) * silu(z), then out_proj
    out = rms_norm(lp["norm"], out.astype(x.dtype), dcfg.rms_norm_eps)
    out = out * jax.nn.silu(z)
    out = out.reshape(B, T, -1)
    return linear(lp["out_proj"], out), RecurrentCache(state=S,
                                                       conv=conv_state)
