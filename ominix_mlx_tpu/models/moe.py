"""Mixture-of-experts layer: SwitchGLU experts + top-k routing.

TPU-native counterpart of the reference's MoE machinery:
  - ``QuantizedSwitchLinear`` stacked expert weights + ``gather_qmm``
    (reference: qwen3-mlx/src/qwen3_moe.rs:304-425)
  - token sort-by-expert for coalesced access (qwen3_moe.rs:339)
  - ``MoeBlock`` top-k via argpartition (qwen3_moe.rs:460)
  - Mixtral top-2 softmax routing (mixtral-mlx/src/model.rs:282-298)
  - GLM4-MoE sigmoid scores + e_score_correction_bias + norm_topk_prob +
    shared experts (glm4-moe-mlx/src/model.rs:343-583)

TPU design: expert weights live stacked [E, N, K] in HBM. Decode (few
tokens) gathers just the top-k experts' weights per token (the gather IS the
memory traffic, same as the reference's gather_qmm). Prefill (many tokens)
runs every expert densely and combines with routing weights — on the MXU the
E/k-fold extra FLOPs are cheaper than scatter/gather plumbing until E is
large; a capacity-bucketed sorted dispatch is the later optimization.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.nn.layers import ACTIVATIONS, linear


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    num_experts: int
    top_k: int
    norm_topk_prob: bool = False
    routing: str = "softmax"          # "softmax" (qwen/mixtral) | "sigmoid" (glm4-moe)
    softmax_after_topk: bool = False  # mixtral style: softmax over the k scores
    routed_scaling_factor: float = 1.0
    n_shared_experts: int = 0
    hidden_act: str = "silu"
    moe_intermediate_size: int = 0
    # DeepSeek-style node-limited group routing (glm4-moe): pick topk_group
    # groups by their top-2 score sums, then top_k within those groups
    n_group: int = 1
    topk_group: int = 1


def route(lp: dict, mcfg: MoEConfig, x: jax.Array):
    """x: [T, D] -> (weights [T, k], indices [T, k]).

    Covers the three reference routing styles (see module docstring)."""
    scores = linear(lp["gate"], x.astype(jnp.float32))   # [T, E]
    if mcfg.routing == "sigmoid":
        scores = jax.nn.sigmoid(scores)
        sel = scores
        if "e_score_correction_bias" in lp:
            sel = scores + lp["e_score_correction_bias"].astype(jnp.float32)
        if mcfg.n_group > 1:
            # node-limited routing (HF Glm4MoeTopkRouter.get_topk_indices)
            T = sel.shape[0]
            g = sel.reshape(T, mcfg.n_group, -1)
            group_scores = jnp.sum(jax.lax.top_k(g, 2)[0], axis=-1)
            _, gidx = jax.lax.top_k(group_scores, mcfg.topk_group)
            gmask = jnp.zeros_like(group_scores).at[
                jnp.arange(T)[:, None], gidx].set(1.0)
            sel = jnp.where(
                (gmask[:, :, None] > 0), g, 0.0).reshape(T, -1)
        _, idx = jax.lax.top_k(sel, mcfg.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1)
    else:
        if mcfg.softmax_after_topk:
            w, idx = jax.lax.top_k(scores, mcfg.top_k)
            w = jax.nn.softmax(w, axis=-1)
        else:
            probs = jax.nn.softmax(scores, axis=-1)
            w, idx = jax.lax.top_k(probs, mcfg.top_k)
    if mcfg.norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    w = w * mcfg.routed_scaling_factor
    return w, idx


def _group_matmul(xs: jax.Array, w_eid: jax.Array, gs: jax.Array,
                  use_gmm: bool, tm: int = 128) -> jax.Array:
    """Grouped matmul over expert-sorted rows: rows of ``xs`` [S, K] are
    sorted by expert; ``gs`` [E] gives each expert's row count; ``w_eid``
    is the stacked expert weight [E, N, K] (HF layout, output-major).
    Returns f32 [S, N]. On TPU this rides the Mosaic megablox gmm kernel
    (one pass over each expert's weight slab, MXU-dense); elsewhere
    ``jax.lax.ragged_dot`` (XLA-native grouped dot).

    tm: row-tile size. Group row counts are ceil-quantized to tm, so at
    many groups a small tm wastes less MXU work (measured v5e E=64 M=2048
    k=8: tm=128 -> 5.8ms vs tm=512 -> 8.5ms per 3-matmul MoE layer)."""
    if use_gmm:
        from jax.experimental.pallas.ops.tpu.megablox import gmm
        # transpose_rhs contracts lhs lanes against rhs's LAST axis, so the
        # HF [E, N, K] layout is consumed natively (no transposed copy)
        return gmm(xs, w_eid, gs, preferred_element_type=jnp.float32,
                   tiling=(tm, 512, 512), transpose_rhs=True)
    return jax.lax.ragged_dot(xs, jnp.swapaxes(w_eid, 1, 2), gs,
                              preferred_element_type=jnp.float32)


def sorted_expert_mlp(xt: jax.Array, ex: dict, w: jax.Array, idx: jax.Array,
                      num_experts: int, act) -> jax.Array:
    """Sort-by-expert dispatch for MoE prefill (TPU-native counterpart of
    the reference's coalesced sorted gather_qmm, qwen3-mlx/src/qwen3_moe.rs:339).

    Token copies are sorted by routed expert id so each expert's matmul
    contracts a CONTIGUOUS row block against its weight slab: total MXU
    FLOPs are the routed k/E fraction of the dense all-expert pass instead
    of running every expert on every token. Exact (no capacity dropping):
    group sizes are data-dependent but every shape is static, so the whole
    thing jits.

    xt: [M, D] tokens; w/idx: [M, k] routing weights/expert ids;
    ex: stacked bf16 expert weights {gate_proj/up_proj [E, I, D],
    down_proj [E, D, I]}. Returns f32 [M, D].
    """
    M, D = xt.shape
    k = idx.shape[1]
    flat_e = idx.reshape(-1)                        # [M*k]
    order = jnp.argsort(flat_e)                     # stable: ties keep token order
    tok = order // k                                # source token per sorted copy
    xs = jnp.take(xt, tok, axis=0)                  # [M*k, D] expert-sorted
    gs = jnp.bincount(flat_e, length=num_experts).astype(jnp.int32)
    use_gmm = (jax.default_backend() == "tpu"
               and os.environ.get("OMINIX_MOE_GMM", "1") == "1")
    g = _group_matmul(xs, ex["gate_proj"], gs, use_gmm)      # f32 [M*k, I]
    u = _group_matmul(xs, ex["up_proj"], gs, use_gmm)
    h = (act(g) * u).astype(xt.dtype)
    ys = _group_matmul(h, ex["down_proj"], gs, use_gmm)      # f32 [M*k, D]
    wf = jnp.take(w.reshape(-1).astype(jnp.float32), order)
    return jnp.zeros((M, D), jnp.float32).at[tok].add(ys * wf[:, None])


def _expert_mlp(wg, wu, wd, x, act):
    """SwiGLU for one (gathered) expert weight set.

    wg/wu: [..., I, D]; wd: [..., D, I]; x: [..., D]."""
    g = jnp.einsum("...id,...d->...i", wg, x)
    u = jnp.einsum("...id,...d->...i", wu, x)
    h = act(g) * u
    return jnp.einsum("...di,...i->...d", wd, h)


def moe_block(lp: dict, mcfg: MoEConfig, x: jax.Array) -> jax.Array:
    """x: [B, T, D] -> [B, T, D].

    lp: {"gate": linear, "experts": {"gate_proj": [E, I, D],
    "up_proj": [E, I, D], "down_proj": [E, D, I]},
    optional "shared_expert": dense mlp params,
    optional "shared_expert_gate", "e_score_correction_bias"}.
    """
    from ominix_mlx_tpu.ops.quant_matmul import (ChannelQuantizedExperts,
                                                 PackedQuantizedExperts,
                                                 channel_expert_matmul_q,
                                                 channel_gather_qmm,
                                                 dequantize_expert,
                                                 gather_qmm,
                                                 quantize_act_channel)

    B, T, D = x.shape
    act = ACTIVATIONS[mcfg.hidden_act]
    xt = x.reshape(B * T, D)
    w, idx = route(lp, mcfg, xt)                         # [M, k]
    M = B * T
    k = mcfg.top_k
    ex = lp["experts"]
    quant = isinstance(ex["gate_proj"], PackedQuantizedExperts)
    chan = isinstance(ex["gate_proj"], ChannelQuantizedExperts)

    if M <= 8 and chan:
        # decode, channelwise-int8 experts (w8a8 batched serving): the int8
        # gather streams half of bf16's bytes; int8 MXU dots are exact
        g = channel_gather_qmm(xt, ex["gate_proj"], idx)  # f32 [M, k, I]
        u = channel_gather_qmm(xt, ex["up_proj"], idx)
        h = act(g) * u                                    # f32 [M, k, I]
        I = h.shape[-1]
        y = channel_gather_qmm(h.reshape(M * k, I), ex["down_proj"],
                               idx.reshape(M * k, 1)).reshape(M, k, D)
        y = jnp.einsum("mkd,mk->md", y, w.astype(jnp.float32))
    elif M <= 8 and quant:
        # decode, quantized experts: stream ONLY the top-k experts' int4/8
        # slabs (reference gather_qmm, qwen3-mlx/src/qwen3_moe.rs:304-425)
        g = gather_qmm(xt, ex["gate_proj"], idx)         # [M, k, I]
        u = gather_qmm(xt, ex["up_proj"], idx)
        h = (act(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(x.dtype)                           # [M, k, I]
        I = h.shape[-1]
        y = gather_qmm(h.reshape(M * k, I), ex["down_proj"],
                       idx.reshape(M * k, 1)).reshape(M, k, D)
        y = jnp.einsum("mkd,mk->md", y.astype(jnp.float32),
                       w.astype(jnp.float32))
    elif M <= 8:
        # decode: gather only the selected experts' weights
        wg = ex["gate_proj"][idx]                        # [M, k, I, D]
        wu = ex["up_proj"][idx]
        wd = ex["down_proj"][idx]
        y = _expert_mlp(wg, wu, wd, xt[:, None, :], act)  # [M, k, D]
        y = jnp.einsum("mkd,mk->md", y.astype(jnp.float32),
                       w.astype(jnp.float32))
    else:
        # prefill: all-expert pass with one-hot combine
        comb = jnp.zeros((M, mcfg.num_experts), jnp.float32)
        comb = jax.vmap(lambda c, i, ww: c.at[i].add(ww))(comb, idx,
                                                          w.astype(jnp.float32))
        if chan:
            # channelwise prefill: activations quantized ONCE, every expert
            # contraction runs on the int8 MXU (2x bf16 rate)
            xq, sx = quantize_act_channel(xt.astype(jnp.float32))

            def step(acc, e):
                g = channel_expert_matmul_q(xq, sx, ex["gate_proj"], e)
                u = channel_expert_matmul_q(xq, sx, ex["up_proj"], e)
                hq, sh = quantize_act_channel(act(g) * u)
                ye = channel_expert_matmul_q(hq, sh, ex["down_proj"], e)
                return acc + ye * comb[:, e][:, None], None
            y, _ = jax.lax.scan(step, jnp.zeros((M, D), jnp.float32),
                                jnp.arange(mcfg.num_experts))
        elif quant:
            # scan over experts, dequantizing ONE slab at a time — bounds
            # peak memory to a single bf16 expert while staying MXU-dense
            def step(acc, e):
                wg = dequantize_expert(ex["gate_proj"], e)
                wu = dequantize_expert(ex["up_proj"], e)
                wd = dequantize_expert(ex["down_proj"], e)
                h = act(xt @ wg.T) * (xt @ wu.T)
                ye = (h @ wd.T).astype(jnp.float32)
                return acc + ye * comb[:, e][:, None], None
            y, _ = jax.lax.scan(step, jnp.zeros((M, D), jnp.float32),
                                jnp.arange(mcfg.num_experts))
        elif os.environ.get("OMINIX_MOE_SORTED", "1") == "1":
            # sorted dispatch: k/E of the dense pass's FLOPs (the dense
            # all-expert fallback below wastes ~E/k x MXU work at scale —
            # ~20x at GLM4-MoE's top-8-of-160)
            y = sorted_expert_mlp(xt, ex, w, idx, mcfg.num_experts, act)
        else:
            g = jnp.einsum("md,eid->mei", xt, ex["gate_proj"])
            u = jnp.einsum("md,eid->mei", xt, ex["up_proj"])
            h = act(g) * u                                # [M, E, I]
            ye = jnp.einsum("mei,edi->med", h, ex["down_proj"])
            y = jnp.einsum("med,me->md", ye.astype(jnp.float32), comb)

    y = y.astype(x.dtype)
    if "shared_expert" in lp:
        se = lp["shared_expert"]
        sh = linear(se["down_proj"],
                    act(linear(se["gate_proj"], xt)) * linear(se["up_proj"], xt))
        if "shared_expert_gate" in lp:
            sh = sh * jax.nn.sigmoid(linear(lp["shared_expert_gate"], xt))
        y = y + sh
    return y.reshape(B, T, D)


def quantize_experts_params(lp: dict, group_size: int = 64,
                            bits: int = 4, scheme: str = "group") -> dict:
    """Quantize a MoE layer's stacked expert weights in place-style (returns
    a new dict). This is what lets Mixtral-8x7B / Qwen3-30B-A3B-class MoE
    fit one chip (reference ships 3/4-bit MoE checkpoints; gather_qmm is the
    decode path, qwen3-mlx/src/qwen3_moe.rs:304-425).

    scheme="channel8": per-(expert, output-channel) int8 (w8a8) — the
    batched-serving scheme (pure XLA int8 MXU, no Pallas)."""
    from ominix_mlx_tpu.ops.quant_matmul import (channel_quantize_experts,
                                                 quantize_experts)

    out = dict(lp)
    ex = dict(lp["experts"])
    for name in ("gate_proj", "up_proj", "down_proj"):
        if name in ex and isinstance(ex[name], jax.Array):
            if scheme == "channel8":
                ex[name] = channel_quantize_experts(ex[name])
            else:
                ex[name] = quantize_experts(ex[name], group_size, bits)
    out["experts"] = ex
    return out


def init_moe_params(key, hidden_size: int, mcfg: MoEConfig,
                    dtype=jnp.bfloat16) -> dict:
    I = mcfg.moe_intermediate_size
    E = mcfg.num_experts
    ks = jax.random.split(key, 5)
    s = hidden_size ** -0.5
    lp = {
        "gate": {"w": jax.random.uniform(ks[0], (E, hidden_size), dtype, -s, s)},
        "experts": {
            "gate_proj": jax.random.uniform(ks[1], (E, I, hidden_size), dtype, -s, s),
            "up_proj": jax.random.uniform(ks[2], (E, I, hidden_size), dtype, -s, s),
            "down_proj": jax.random.uniform(ks[3], (E, hidden_size, I), dtype,
                                            -(I ** -0.5), I ** -0.5),
        },
    }
    return lp
