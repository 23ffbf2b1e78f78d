"""Device mesh + sharding rules — the genuinely new layer of the TPU build.

The reference has NO distributed execution (SURVEY.md §2.7: single device,
Apple unified memory). On TPU, models larger than one chip's HBM (qwen3.5-35B,
qwen-image 20B, big MoE) shard over the ICI mesh instead. Design:

  - one global ``Mesh`` with axes ("dp", "tp") (expert-parallel adds "ep"
    on top of "tp" for MoE, sequence/context parallel adds "sp")
  - parameters get ``NamedSharding`` specs by tree-structure rules
    (megatron-style TP: column-shard qkv/gate/up, row-shard o/down, so each
    decoder layer needs exactly one psum on the attention output and one on
    the MLP output — inserted automatically by GSPMD)
  - KV caches shard their head axis on "tp" and batch on "dp"
  - everything runs through plain ``jax.jit``; XLA inserts the collectives
    and rides ICI

Multi-host (DCN) extends the same mesh via ``jax.distributed.initialize``;
nothing else changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices=None, sp: int = 1) -> Mesh:
    """Create a (dp, tp[, sp]) mesh. tp defaults to n_devices // (dp*sp).
    sp > 1 adds a sequence/context-parallel axis (ring attention,
    parallel/context_parallel.py) as the innermost dim so its ppermute
    hops ride nearest-neighbor ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * sp)
    assert dp * tp * sp == n, f"dp*tp*sp={dp * tp * sp} != devices={n}"
    if sp > 1:
        arr = np.asarray(devices).reshape(dp, tp, sp)
        return Mesh(arr, ("dp", "tp", "sp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def dense_param_specs(cfg, params: dict) -> dict:
    """PartitionSpec tree for a models.base dense transformer.

    Megatron-style tensor parallel:
      q/k/v/gate/up: column-parallel (shard out_features)
      o/down:        row-parallel (shard in_features)
      embed/lm_head: vocab-sharded
      norms:         replicated
    """
    def linear_spec(col: bool):
        return {"w": P("tp", None) if col else P(None, "tp"),
                "b": P("tp") if col else P(None)}

    def spec_for_layer(lp: dict) -> dict:
        out = {}
        for name in lp:
            if name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
                out[name] = _prune(linear_spec(True), lp[name])
            elif name in ("o_proj", "down_proj"):
                out[name] = _prune(linear_spec(False), lp[name])
            else:  # norms
                out[name] = P(None)
        return out

    specs = {
        "embed": P("tp", None),
        "layers": [spec_for_layer(lp) for lp in params["layers"]],
        "norm": P(None),
    }
    if "lm_head" in params:
        specs["lm_head"] = _prune({"w": P("tp", None), "b": P("tp")},
                                  params["lm_head"])
    return specs


def _prune(spec: dict, actual: dict) -> dict:
    """Keep only spec entries whose keys exist in the actual param dict, and
    expand QuantizedTensor leaves to per-field specs."""
    from ominix_mlx_tpu.core.quant import QuantizedTensor

    out = {}
    for k, v in actual.items():
        s = spec.get(k, P(None))
        if isinstance(v, QuantizedTensor):
            # q: [out, in], scales/biases: [out, groups] — shard same axis
            out[k] = QuantizedTensor(q=s, scales=s, biases=s,
                                     group_size=v.group_size, bits=v.bits)
        else:
            out[k] = s
    return out


def moe_param_specs(lp_moe: dict) -> dict:
    """Expert-parallel specs: shard the expert axis of the stacked weights
    over "tp" (serving as the EP axis). In the dense all-expert prefill
    path the one-hot combine contracts the expert axis, so GSPMD lowers it
    to per-device expert compute + one psum — textbook EP without any
    manual dispatch.

    Quantized expert stacks shard the same way: every side-band array
    (scales/biases) leads with the expert axis, so axis 0 goes on the EP
    axis and the rest replicate."""
    from ominix_mlx_tpu.ops.quant_matmul import (ChannelQuantizedExperts,
                                                 PackedQuantizedExperts)

    def expert_spec(v):
        if isinstance(v, (PackedQuantizedExperts, ChannelQuantizedExperts)):
            return jax.tree.map(
                lambda a: P(*(("tp",) + (None,) * (a.ndim - 1))), v)
        return P("tp", None, None)

    specs = jax.tree.map(lambda _: P(None), lp_moe)
    specs["experts"] = {k: expert_spec(lp_moe["experts"][k])
                        for k in lp_moe["experts"]}
    return specs


def mmdit_param_specs(params: dict) -> dict:
    """TP specs for the Qwen-Image MMDiT (models/qwen_image.py) — the 20B
    image family's multi-chip path (SURVEY §2.7: larger than one chip's
    HBM in bf16 + activations at 1024px).

    Megatron-style within each joint block: every projection INTO head/ffn
    space is column-parallel, every projection back to model dim is
    row-parallel -> exactly two psums per stream per block. adaLN
    modulations and norms replicate (tiny)."""
    COL = ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj",
           "ff_in", "ff_ctx_in")
    ROW = ("to_out", "to_add_out", "ff_out", "ff_ctx_out")

    def lin(col: bool, p):
        return _prune({"w": P("tp", None) if col else P(None, "tp"),
                       "b": P("tp") if col else P(None)}, p)

    def blk(bp: dict) -> dict:
        out = {}
        for k, v in bp.items():
            if k == "attn":
                # QK-RMSNorm weights ([head_dim]) replicate
                out[k] = {ak: (lin(True, av) if ak in COL else
                               lin(False, av) if ak in ROW else P(None))
                          for ak, av in v.items()}
            elif k in COL:
                out[k] = lin(True, v)
            elif k in ROW:
                out[k] = lin(False, v)
            else:                               # img_mod/txt_mod + norms
                out[k] = jax.tree.map(lambda _: P(None), v)
        return out

    specs = {k: jax.tree.map(lambda _: P(None), v)
             for k, v in params.items() if k != "blocks"}
    specs["blocks"] = [blk(bp) for bp in params["blocks"]]
    return specs


def cache_specs(cache) -> object:
    """PartitionSpec tree for a ModelCache: shard KV heads on tp, batch on dp."""
    from ominix_mlx_tpu.core.cache import KVCache, ModelCache, RotatingKVCache
    from ominix_mlx_tpu.core.paged_cache import PagedKVCache
    from ominix_mlx_tpu.models.sparse_attention import SparseKVCache

    def layer_spec(lc):
        if isinstance(lc, PagedKVCache):
            # pool [n_kv, P, page, D]: KV heads on tp; page table replicated;
            # int8 pools carry per-(head, page, token) scales, heads on tp
            pool = P("tp", None, None, None)
            sc = P("tp", None, None) if lc.quantized else None
            return PagedKVCache(k_pool=pool, v_pool=pool,
                                page_table=P(None, None),
                                k_scale=sc, v_scale=sc)
        if isinstance(lc, (KVCache, RotatingKVCache, SparseKVCache)):
            kv = P("dp", "tp", None, None)
            if isinstance(lc, RotatingKVCache):
                return RotatingKVCache(k=kv, v=kv, slot_pos=P(None))
            if isinstance(lc, SparseKVCache):
                return SparseKVCache(k=kv, v=kv, comp=kv,
                                     kernel_size=lc.kernel_size)
            return KVCache(k=kv, v=kv)
        return jax.tree.map(lambda _: P(None), lc)

    return ModelCache(layers=[layer_spec(lc) for lc in cache.layers],
                      offset=P())


def shard_tree(tree, specs, mesh: Mesh):
    """device_put a pytree with NamedShardings from a matching spec tree.
    None leaves (absent optional fields, e.g. bf16 pools' scale slots)
    pass through."""
    return jax.tree.map(
        lambda x, s: None if x is None
        else jax.device_put(x, NamedSharding(mesh, s)),
        tree, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or x is None)


def shard_params(cfg, params: dict, mesh: Mesh) -> dict:
    specs = dense_param_specs(cfg, params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s = jax.tree.leaves(specs)
    assert len(flat_p) == len(flat_s), "spec tree mismatch"
    placed = [jax.device_put(p, NamedSharding(mesh, s))
              for p, s in zip(flat_p, flat_s)]
    return jax.tree.unflatten(treedef, placed)
