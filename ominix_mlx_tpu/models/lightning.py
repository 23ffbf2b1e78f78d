"""Lightning (GLA) linear attention with ALiBi decay — MiniCPM-SALA's
O(1)-state mixer.

TPU-native counterpart of reference minicpm-sala-mlx/src/attention/
lightning.rs: ALiBi decay slopes (:47-78), chunked prefill with
intra/inter-chunk decay tensors (:492-575, fused Metal kernels
metal_kernels.rs:379-592), single recurrent decode step (:449-490),
GroupNorm-free output RMSNorm + sigmoid output gate.

On TPU the chunked form is pure einsum + lax.scan over chunks — XLA fuses
the decay-mask elementwise work into the MXU matmuls, which is exactly what
the reference's hand-written Metal kernels do by hand.

    state_{c+1} = chunk_decay * state_c + (K_c * rev_decay)^T V_c
    out_c       = (Q_c K_c^T * intra_mask) V_c + (Q_c * q_decay) state_c
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GLACache:
    """Reference: LightningCache (lightning.rs:22-40)."""
    state: jax.Array   # [B, H, D, D] float32

    @staticmethod
    def init(batch: int, n_heads: int, head_dim: int) -> "GLACache":
        return GLACache(state=jnp.zeros((batch, n_heads, head_dim, head_dim),
                                        jnp.float32))


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Negated ALiBi slopes (reference: lightning.rs:47-76)."""
    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3.0)))
        return [start * start ** i for i in range(n)]

    def slopes(n):
        if math.log2(n).is_integer():
            return pow2(n)
        c = 2 ** int(math.floor(math.log2(n)))
        s = pow2(c)
        extra = slopes(2 * c)
        s += extra[0::2][: n - c]
        return s[:n]

    return -np.asarray(slopes(n_heads), np.float32)


def decay_tensors(chunk: int, slopes: np.ndarray):
    """(intra_mask [1,H,C,C], q_decay [1,H,C,1], rev_decay [1,H,C,1],
    chunk_decay [1,H,1,1]) — reference lightning.rs:88-151."""
    H = len(slopes)
    i = np.arange(chunk)
    s = slopes[:, None, None]
    intra = np.where(i[None, :, None] >= i[None, None, :],
                     np.exp(s * (i[:, None] - i[None, :])), 0.0)  # [H,C,C]
    q_dec = np.exp(slopes[:, None] * (i + 1))                     # [H,C]
    rev_dec = np.exp(slopes[:, None] * (chunk - i - 1))           # [H,C]
    chk_dec = np.exp(slopes * chunk)                              # [H]
    return (jnp.asarray(intra[None], jnp.float32),
            jnp.asarray(q_dec[None, :, :, None], jnp.float32),
            jnp.asarray(rev_dec[None, :, :, None], jnp.float32),
            jnp.asarray(chk_dec[None, :, None, None], jnp.float32))


def gla_decode_step(q, k, v, slopes, cache: GLACache):
    """Single step: state = exp(slope)*state + k^T v; out = q @ state
    (reference: lightning.rs:449-490). q/k/v: [B, H, 1, D]."""
    decay = jnp.exp(slopes)[None, :, None, None]
    kv = jnp.einsum("bhtd,bhte->bhde", k.astype(jnp.float32),
                    v.astype(jnp.float32))
    state = cache.state * decay + kv
    out = jnp.einsum("bhtd,bhde->bhte", q.astype(jnp.float32), state)
    return out, GLACache(state=state)


def gla_chunked(q, k, v, slopes, cache: GLACache, chunk: int = 64):
    """Chunked prefill (reference: lightning.rs:492-575). q/k/v: [B,H,L,D],
    any L (static). A zero-padded final chunk leaves the state scaled by
    exp(slope*(C-m)) (pads contribute nothing but the decay still runs C
    steps), so the state gets the exact static correction exp(slope*(m-C))."""
    B, H, L, D = q.shape
    slopes = np.asarray(slopes)
    pad = (-L) % chunk
    if pad:
        zp = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v = zp(q), zp(k), zp(v)
    Lp = L + pad
    intra, q_dec, rev_dec, chk_dec = decay_tensors(chunk, slopes)
    nc = Lp // chunk

    qc = q.reshape(B, H, nc, chunk, D).transpose(2, 0, 1, 3, 4).astype(jnp.float32)  # noqa: E501
    kc = k.reshape(B, H, nc, chunk, D).transpose(2, 0, 1, 3, 4).astype(jnp.float32)
    vc = v.reshape(B, H, nc, chunk, D).transpose(2, 0, 1, 3, 4).astype(jnp.float32)

    def step(state, qkv):
        q_c, k_c, v_c = qkv
        attn = jnp.einsum("bhtd,bhsd->bhts", q_c, k_c) * intra
        intra_out = jnp.einsum("bhts,bhsd->bhtd", attn, v_c)
        inter_out = jnp.einsum("bhtd,bhde->bhte", q_c * q_dec, state)
        state = state * chk_dec + jnp.einsum(
            "bhtd,bhte->bhde", k_c * rev_dec, v_c)
        return state, intra_out + inter_out

    state, outs = jax.lax.scan(step, cache.state, (qc, kc, vc))
    if pad:
        corr = jnp.asarray(np.exp(slopes * -pad), jnp.float32)
        state = state * corr[None, :, None, None]
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, Lp, D)[:, :, :L]
    return out, GLACache(state=state)
