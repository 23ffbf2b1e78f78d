"""Fused paged decode attention — hand-pipelined Pallas kernel.

Why a kernel at decode: XLA lowers sdpa-over-the-gathered-view as separate
QK / softmax / AV fusions, each re-streaming K or V (measured v5e: 285us
per layer at B=8, S=2048 — 3.5x the 82us HBM roofline; the page-table
gather itself is free, XLA fuses it). The stock
jax.experimental.pallas.ops.tpu.paged_attention kernel was measured
SLOWER than XLA here (365-448us across its block sizes) — consistent with
the round-2 finding that Mosaic's auto grid pipelining does not overlap
panel DMAs on this target. So, as with ops/quant_matmul.py, the kernel
hand-rolls the pipeline: grid=(), one flat fori_loop over (row, chunk)
pairs, double-buffered per-page DMAs, online softmax carried in VMEM, and
every dot_general in standard orientation (lhs lanes x rhs sublanes —
non-standard orientations stall the remote Mosaic service).

Layout contract (core/paged_cache.py): k pages stored TRANSPOSED
[n_kv, P, D, ps] so the QK dot reads kT panels [D, ps] contiguously and
the per-page DMA destination is a 128-lane-aligned slice (requires
page_size == 128); v pages natural [n_kv, P, ps, D] for the AV dot.

The query side arrives BLOCK-DIAGONAL (``_block_diag_q``): one
[H, n_kv*D] @ [n_kv*D, CHUNK] dot computes every head's scores against
its own kv head in a single MXU op instead of n_kv small ones.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_CP = 8          # pages per chunk (CHUNK = _CP * page_size tokens); v5e
                 # sweep at B=8/S=2048: cp=2 258us, 4 248, 8 245, 16 265


def supported() -> bool:
    return jax.default_backend() == "tpu"


def _pick_cp(max_pages: int, cp: int = 0) -> int:
    """Largest chunk size <= the requested/default _CP that divides
    max_pages (a non-dividing CP would floor NCH and drop tail pages)."""
    want = min(cp or _CP, max_pages)
    while want > 1 and max_pages % want:
        want -= 1
    return max(want, 1)


def use_paged_kernel(n_kv: int, page_size: int, max_pages: int,
                     head_dim: int) -> bool:
    # Measured on v5e (B=8, S=2048, GQA 32/8, benchmarks/paged_attn_probe.py,
    # 2026-08-18): XLA over the gathered page view beats this kernel at every
    # fill fraction (fill 1.0: 217 vs 245us; 0.5: 170 vs 213; 0.25: 177 vs
    # 216). GQA decode is MXU-tile-bound (G=4 useful rows per 128-row tile),
    # so the kernel's single-pass HBM advantage never materializes as time.
    # Default OFF; set OMINIX_PAGED_KERNEL=1 to opt in (e.g. future shapes
    # where the gather view's O(capacity) cost dominates).
    if os.environ.get("OMINIX_PAGED_KERNEL", "0") != "1":
        return False
    cp = _pick_cp(max_pages)
    # double-buffered K+V slabs: 2 slots x 2 pools x NKV x D x CHUNK x 2B
    # must fit comfortably under the kernel's VMEM budget
    vmem = 8 * n_kv * head_dim * cp * page_size
    return (supported() and page_size == 128 and head_dim % 128 == 0
            and max_pages % cp == 0 and vmem <= 64 * 1024 * 1024)


def _pa_kernel(*refs, B: int, NKV: int, G: int, D: int, PS: int, CP: int,
               NCH: int, window: int = 0, quant: bool = False):
    if quant:
        (table_ref, len_ref, qbd_ref, onehot_ref, k_hbm, v_hbm, ks_hbm,
         vs_hbm, out_ref, kbuf, vbuf, ksc, vsc, m_s, l_s, acc_s, ksems,
         vsems, kssems, vssems) = refs
    else:
        (table_ref, len_ref, qbd_ref, k_hbm, v_hbm, out_ref, kbuf, vbuf,
         m_s, l_s, acc_s, ksems, vsems) = refs
    H = NKV * G
    CHUNK = CP * PS

    def win_start(b):
        # sliding window: only positions [len - window, len) attend
        if window <= 0:
            return 0
        return jnp.maximum(len_ref[b, 0] - window, 0)

    def valid(t):
        b = jax.lax.div(t, NCH)
        c = jax.lax.rem(t, NCH)
        ok = c * CHUNK < len_ref[b, 0]
        if window > 0:
            ok = ok & ((c + 1) * CHUNK > win_start(b))
        return ok

    def dmas(slot, t):
        b = jax.lax.div(t, NCH)
        c = jax.lax.rem(t, NCH)
        ops = []
        for p in range(CP):
            pid = table_ref[b, c * CP + p]
            ops.append(pltpu.make_async_copy(
                k_hbm.at[:, pid],                       # [NKV, D, PS]
                kbuf.at[slot, :, :, pl.ds(p * PS, PS)],
                ksems.at[slot, p]))
            ops.append(pltpu.make_async_copy(
                v_hbm.at[:, pid],                       # [NKV, PS, D]
                vbuf.at[slot, :, pl.ds(p * PS, PS), :],
                vsems.at[slot, p]))
            if quant:
                ops.append(pltpu.make_async_copy(
                    ks_hbm.at[:, pid],                  # [NKV, PS]
                    ksc.at[slot, :, pl.ds(p * PS, PS)],
                    kssems.at[slot, p]))
                ops.append(pltpu.make_async_copy(
                    vs_hbm.at[:, pid],
                    vsc.at[slot, :, pl.ds(p * PS, PS)],
                    vssems.at[slot, p]))
        return ops

    @pl.when(valid(0))
    def _():
        for op in dmas(0, 0):
            op.start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        b = jax.lax.div(t, NCH)
        c = jax.lax.rem(t, NCH)

        # clamp the lookahead index: `&` does not short-circuit in traced
        # code, so valid(t+1) at the final iteration would read
        # len_ref[B, 0] one row past the SMEM buffer
        tn = jnp.minimum(t + 1, B * NCH - 1)

        @pl.when((t + 1 < B * NCH) & valid(tn))
        def _():
            for op in dmas(jax.lax.rem(tn, 2), tn):
                op.start()

        @pl.when(c == 0)
        def _():
            m_s[...] = jnp.full((H, 128), _NEG, jnp.float32)
            l_s[...] = jnp.zeros((H, 128), jnp.float32)
            acc_s[...] = jnp.zeros((H, D), jnp.float32)

        @pl.when(valid(t))
        def _():
            for op in dmas(slot, t):
                op.wait()
            if quant:
                # int8 pages: cast the slab to bf16 (1 op/elem ~ stream
                # rate, but the DMA moved HALF the bytes), expand the
                # per-(head, token) scales to all H rows with one one-hot
                # matmul (Mosaic cannot broadcast along lanes otherwise)
                kT = kbuf[slot].astype(jnp.bfloat16).reshape(NKV * D, CHUNK)
            else:
                kT = kbuf[slot].reshape(NKV * D, CHUNK)
            s = jax.lax.dot_general(
                qbd_ref[b], kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [H, CHUNK]
            if quant:
                ks_exp = jax.lax.dot_general(
                    onehot_ref[...], ksc[slot], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [H, CHUNK]
                s = s * ks_exp
            rem = len_ref[b, 0] - c * CHUNK
            lane = jax.lax.broadcasted_iota(jnp.int32, (H, CHUNK), 1)
            ok = lane < rem
            if window > 0:
                ok = ok & (lane >= win_start(b) - c * CHUNK)
            s = jnp.where(ok, s, _NEG)
            m_prev = m_s[:, :1]
            m_curr = jnp.max(s, axis=1, keepdims=True)   # [H, 1]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)             # [H, 1]
            p = jnp.exp(s - m_next)                      # [H, CHUNK] f32
            l_next = alpha * l_s[:, :1] + jnp.sum(p, axis=1, keepdims=True)
            m_s[...] = jnp.broadcast_to(m_next, (H, 128))
            l_s[...] = jnp.broadcast_to(l_next, (H, 128))
            if quant:
                # fold the per-token V scale into p BEFORE the AV dot (the
                # contraction mixes tokens with different scales)
                vs_exp = jax.lax.dot_general(
                    onehot_ref[...], vsc[slot], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = p * vs_exp
            pb = p.astype(jnp.bfloat16)
            for j in range(NKV):
                vj = vbuf[slot, j]
                if quant:
                    vj = vj.astype(jnp.bfloat16)
                acc_s[j * G:(j + 1) * G, :] = (
                    acc_s[j * G:(j + 1) * G, :] * alpha[j * G:(j + 1) * G]
                    + jax.lax.dot_general(
                        pb[j * G:(j + 1) * G], vj,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))

        @pl.when(c == NCH - 1)
        def _():
            linv = 1.0 / jnp.maximum(l_s[:, :1], 1e-30)
            out_ref[b] = (acc_s[...] * linv).astype(out_ref.dtype)

        return ()

    jax.lax.fori_loop(0, B * NCH, body, ())


def _block_diag_q(q: jax.Array, n_kv: int, scale: float) -> jax.Array:
    """q [B, H, D] -> block-diagonal [B, H, n_kv*D]: row j*G+g holds
    q[b, j*G+g] * scale in lane block j*D..(j+1)*D, zeros elsewhere."""
    B, H, D = q.shape
    G = H // n_kv
    qg = (q * scale).reshape(B, n_kv, G, D)
    eye = jnp.eye(n_kv, dtype=q.dtype)
    qbd = jnp.einsum("bjgd,je->bjged", qg.astype(q.dtype), eye)
    return qbd.reshape(B, H, n_kv * D)


@functools.partial(jax.jit, static_argnames=("interpret", "window", "cp"))
def _paged_decode_call(qbd, k_pool, v_pool, table, lengths,
                       k_scale=None, v_scale=None,
                       interpret: bool = False, window: int = 0,
                       cp: int = 0):
    # NOTE: the softmax scale is already folded into qbd (_block_diag_q)
    NKV, P, D, PS = k_pool.shape
    B, H, _ = qbd.shape
    G = H // NKV
    MP = table.shape[1]
    CP = _pick_cp(MP, cp)
    # a non-dividing chunk size would FLOOR the chunk count and silently
    # drop the trailing pages from attention
    assert MP % CP == 0, (MP, CP)
    NCH = MP // CP
    CHUNK = CP * PS
    quant = k_scale is not None
    lens2 = lengths.reshape(B, 1).astype(jnp.int32)
    kern = functools.partial(_pa_kernel, B=B, NKV=NKV, G=G, D=D, PS=PS,
                             CP=CP, NCH=NCH, window=window, quant=quant)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # table [B, MP]
        pl.BlockSpec(memory_space=pltpu.SMEM),   # lengths [B, 1]
        pl.BlockSpec(memory_space=pltpu.VMEM),   # qbd [B, H, NKV*D]
    ]
    args = [table.astype(jnp.int32), lens2, qbd]
    if quant:
        # static one-hot expanding per-kv-head rows to all H rows
        onehot = jnp.repeat(jnp.eye(NKV, dtype=jnp.float32), G, axis=0)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(onehot)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),    # k_pool
                 pl.BlockSpec(memory_space=pl.ANY)]    # v_pool
    args += [k_pool, v_pool]
    scratch = [
        pltpu.VMEM((2, NKV, D, CHUNK), k_pool.dtype),
        pltpu.VMEM((2, NKV, CHUNK, D), v_pool.dtype),
    ]
    if quant:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # k_scale
                     pl.BlockSpec(memory_space=pl.ANY)]   # v_scale
        args += [k_scale, v_scale]
        scratch += [pltpu.VMEM((2, NKV, CHUNK), jnp.float32),
                    pltpu.VMEM((2, NKV, CHUNK), jnp.float32)]
    scratch += [
        pltpu.VMEM((H, 128), jnp.float32),
        pltpu.VMEM((H, 128), jnp.float32),
        pltpu.VMEM((H, D), jnp.float32),
        pltpu.SemaphoreType.DMA((2, CP)),
        pltpu.SemaphoreType.DMA((2, CP)),
    ]
    if quant:
        scratch += [pltpu.SemaphoreType.DMA((2, CP)),
                    pltpu.SemaphoreType.DMA((2, CP))]
    itemsize = 1 if quant else 2
    return pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * MP * PS * D * 2,
            bytes_accessed=2 * B * NKV * MP * PS * D * itemsize,
            transcendentals=B * H * MP * PS),
        interpret=interpret,
    )(*args)


def paged_decode_attention(q: jax.Array, k_pool: jax.Array,
                           v_pool: jax.Array, page_table: jax.Array,
                           lengths: jax.Array, scale: float,
                           interpret: bool = False, window: int = 0,
                           k_scale=None, v_scale=None,
                           pages_per_chunk: int = 0) -> jax.Array:
    """q: [B, H, D] (one decode step); k_pool [n_kv, P, D, ps] (transposed
    pages), v_pool [n_kv, P, ps, D]; page_table [B, max_pages]; lengths [B]
    valid tokens per row (INCLUDING the token written this step).
    Returns [B, H, D]. Only streams the pages the table maps, one fused
    pass over K and V; window > 0 restricts attention to the last
    ``window`` positions (sliding-window models) and skips chunks outside
    it. k_scale/v_scale [n_kv, P, ps] switch to int8 pages (half the DMA
    bytes; scales applied in-kernel). interpret=True runs the kernel in
    the Pallas interpreter (CPU tests). pages_per_chunk overrides the
    default DMA chunking (_CP pages per double-buffered slab; the table
    width must divide by it)."""
    NKV = k_pool.shape[0]
    qbd = _block_diag_q(q.astype(jnp.bfloat16), NKV, scale)
    out = _paged_decode_call(qbd, k_pool, v_pool, page_table, lengths,
                             k_scale=k_scale, v_scale=v_scale,
                             interpret=interpret, window=window,
                             cp=pages_per_chunk)
    return out.astype(q.dtype)
