"""Group-wise affine quantization, checkpoint-compatible with MLX layout.

The reference exposes ``quantize`` / ``dequantize`` / ``quantized_matmul`` /
``gather_qmm`` (reference: mlx-rs/src/ops/quantization.rs:41-226) and builds
``QuantizedLinear{weight, scales, biases}`` from mlx-community safetensors
checkpoints (reference: qwen3-mlx/src/model.rs:570-596).

MLX layout (what mlx-community checkpoints contain):
  - ``weight``: uint32, shape [out_features, in_features * bits / 32].
    Elements are packed little-endian within each uint32: element j of a
    32/bits-element pack occupies bits [j*bits, (j+1)*bits).
  - ``scales``: [out_features, in_features / group_size]
  - ``biases``: [out_features, in_features / group_size]
  - dequant: w[o, i] = scales[o, i//gs] * q[o, i] + biases[o, i//gs]
    where q is the *unsigned* integer in [0, 2^bits).

On TPU we keep the same on-disk layout for compatibility, but unpack into an
int8 tensor at load time (``unpack_to_int8``) so the hot path is an int8 x
bf16 grouped matmul (MXU-friendly) rather than bit-twiddling per step. A
Pallas fused dequant-matmul lives in ``ominix_mlx_tpu.ops.quant_matmul``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """A group-quantized 2D tensor in unpacked, *centered* (signed int8) form.

    ``q`` holds signed codes in [-2^(bits-1), 2^(bits-1)); the MLX unsigned
    offset is folded into ``biases`` at load time (biases' = biases +
    scales * 2^(bits-1)) so kernels work directly on signed int8.
    Dequant: ``w = scales[..., None] * q.reshape(out, groups, gs) + biases[..., None]``.
    """

    q: jax.Array          # [out, in] int8 (signed centered codes)
    scales: jax.Array     # [out, in // group_size]
    biases: jax.Array     # [out, in // group_size]
    group_size: int = dataclasses.field(metadata=dict(static=True), default=64)
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)

    @property
    def shape(self):
        return self.q.shape


def quantize(w: jax.Array, group_size: int = 64, bits: int = 4):
    """Quantize a [out, in] float matrix to MLX-compatible group-affine codes.

    Returns (packed_uint32, scales, biases) with the MLX on-disk layout
    (reference semantics: mlx-rs/src/ops/quantization.rs:41-80).
    """
    out_f, in_f = w.shape
    assert in_f % group_size == 0, (in_f, group_size)
    n_levels = (1 << bits) - 1
    grouped = w.reshape(out_f, in_f // group_size, group_size).astype(jnp.float32)
    w_min = grouped.min(axis=-1)
    w_max = grouped.max(axis=-1)
    # affine: w ~= scale * q + bias, q in [0, n_levels]
    scale = (w_max - w_min) / n_levels
    scale = jnp.where(scale == 0, 1e-8, scale)
    bias = w_min
    q = jnp.clip(jnp.round((grouped - bias[..., None]) / scale[..., None]), 0, n_levels)
    q = q.astype(jnp.uint32).reshape(out_f, in_f)
    packed = pack_codes(q, bits)
    return packed, scale.astype(w.dtype), bias.astype(w.dtype)


def pack_codes(q: jax.Array, bits: int) -> jax.Array:
    """Pack unsigned codes [out, in] (uint32) into MLX uint32 words."""
    per_word = 32 // bits
    out_f, in_f = q.shape
    assert in_f % per_word == 0
    q = q.reshape(out_f, in_f // per_word, per_word)
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)[None, None, :]
    return jnp.sum(q << shifts, axis=-1, dtype=jnp.uint32)


def unpack_to_int8(packed: jax.Array, bits: int) -> jax.Array:
    """Unpack MLX uint32-packed codes to int8 unsigned codes [out, in]."""
    per_word = 32 // bits
    out_f, n_words = packed.shape
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)[None, None, :]
    mask = jnp.uint32((1 << bits) - 1)
    codes = (packed[..., None] >> shifts) & mask
    return codes.reshape(out_f, n_words * per_word).astype(jnp.int8)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize to a dense [out, in] matrix."""
    out_f, in_f = qt.q.shape
    gs = qt.group_size
    q = qt.q.astype(jnp.float32).reshape(out_f, in_f // gs, gs)
    w = (qt.scales[..., None].astype(jnp.float32) * q
         + qt.biases[..., None].astype(jnp.float32))
    return w.reshape(out_f, in_f).astype(dtype)


def from_mlx_arrays(packed: jax.Array, scales: jax.Array, biases: jax.Array,
                    group_size: int, bits: int) -> QuantizedTensor:
    """Build a QuantizedTensor from MLX-layout checkpoint arrays, centering
    the unsigned codes into signed int8 and folding the offset into biases."""
    center = 1 << (bits - 1)
    unsigned = unpack_to_int8(packed, bits)
    if bits == 8:
        q = (unsigned.view(jnp.uint8).astype(jnp.int16) - center).astype(jnp.int8)
    else:
        q = (unsigned - center).astype(jnp.int8)
    biases = (biases.astype(jnp.float32)
              + scales.astype(jnp.float32) * center).astype(biases.dtype)
    return QuantizedTensor(q=q, scales=scales, biases=biases,
                           group_size=group_size, bits=bits)


def quantize_tensor(w: jax.Array, group_size: int = 64, bits: int = 4) -> QuantizedTensor:
    packed, scales, biases = quantize(w, group_size, bits)
    return from_mlx_arrays(packed, scales, biases, group_size, bits)


@functools.partial(jax.jit, static_argnames=("dtype",))
def quantized_matmul(x: jax.Array, qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """x @ W^T with W group-quantized ([out, in] layout, like reference
    ``quantized_matmul`` with transpose=True, mlx-rs/src/ops/quantization.rs:92).

    XLA path: dequantize then matmul — XLA fuses the dequant into the matmul
    epilogue reasonably well for decode (memory-bound) shapes; the Pallas
    kernel in ops/quant_matmul.py is used for the hot paths.
    """
    w = dequantize(qt, dtype)
    return jnp.dot(x.astype(dtype), w.T, preferred_element_type=dtype)


def quantize_tree(params, group_size: int = 64, bits: int = 4,
                  pack: bool = True, min_dim: int = 256, batched: bool = False,
                  scheme: str = "group"):
    """Generic post-hoc quantizer for ANY param tree: every dict holding a
    2D "w" whose shapes satisfy the kernel constraints (rows/cols 128-
    aligned, K divisible by the group size, both dims >= min_dim) gets its
    weight group-quantized in place; everything else (norms, convs,
    embeddings, small projections) is left dense.

    scheme="channel8" swaps in per-output-channel symmetric int8
    (ChannelQuantizedTensor → pure XLA int8 MXU matmul, no Pallas) — the
    batched/prefill-shape scheme; group_size/bits/pack are ignored there.

    This is what lets non-base architectures (hybrid GLA/sparse mixers,
    adapters, DiT towers) run the quantized paths without a bespoke
    walker — nn.layers.linear dispatches on the leaf type.
    """
    import jax

    from ominix_mlx_tpu.ops.quant_matmul import channel_quantize, prepare

    def eligible(w):
        return (isinstance(w, jax.Array) and w.ndim == 2
                and w.shape[0] % 128 == 0 and w.shape[1] % 128 == 0
                and (scheme == "channel8" or w.shape[1] % group_size == 0)
                and min(w.shape) >= min_dim)

    def quant(w):
        if scheme == "channel8":
            return channel_quantize(jnp.asarray(w, jnp.float32))
        qt = quantize_tensor(jnp.asarray(w, jnp.float32), group_size, bits)
        return prepare(qt, batched=batched) if pack else qt

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and eligible(v):
                    out[k] = quant(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        return node

    return walk(params)
