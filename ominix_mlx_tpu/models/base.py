"""Generic dense decoder-only transformer: the shared skeleton behind
Qwen2/Qwen3/Mistral/GLM4 (reference crates qwen3-mlx, mistral-mlx, glm4-mlx
— which are ~90% identical Rust modules; here the variation is config
switches: QK-norm, partial RoPE, attention bias, tied embeddings,
sliding window).

Reference anatomy being re-expressed TPU-first:
  - Attention with GQA + optional QK-RMSNorm: qwen3-mlx/src/model.rs:69-146
  - SwiGLU MLP: qwen3-mlx/src/model.rs:232-263
  - Decoder layer + final norm + (tied) lm_head: qwen3-mlx/src/model.rs:318-486
  - partial RoPE (rotary_factor): glm4-mlx/src/model.rs:116-133

Design: params are nested dicts mirroring HF tensor names; ``forward`` is a
pure function of (params, cfg, tokens, cache) -> (logits, cache), jit-safe
with static shapes (fixed-capacity cache + offset masking).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ominix_mlx_tpu.core.attention import causal_mask, sdpa
from ominix_mlx_tpu.core.cache import KVCache, ModelCache
from ominix_mlx_tpu.core.quant import QuantizedTensor, from_mlx_arrays
from ominix_mlx_tpu.core.rope import RopeConfig, apply_rope, make_rope
from ominix_mlx_tpu.nn.layers import (ACTIVATIONS, embedding,
                                      embedding_as_linear, init_linear,
                                      linear, rms_norm)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    intermediate_size: int
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    rope_traditional: bool = False     # interleaved-pair rotary (GLM)
    partial_rotary_factor: float = 1.0
    use_qk_norm: bool = False          # Qwen3
    attention_bias: bool = False       # Qwen2 q/k/v bias
    attention_out_bias: bool = False
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    hidden_act: str = "silu"
    sliding_window: Optional[int] = None
    logits_scale: float = 1.0          # muP-style scaling (minicpm)
    moe: Optional[object] = None       # MoEConfig for layers that carry "moe"
    mla: Optional[object] = None       # MLAConfig for MLA attention layers
    deltanet: Optional[object] = None  # DeltaNetConfig for "linear_attn" layers
    # hybrid layer plan ("linear_attention"/"full_attention" per layer);
    # None = all full attention
    layer_types: Optional[tuple] = None

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    def rope(self) -> RopeConfig:
        return make_rope(self.hd, self.rope_theta, self.rope_scaling,
                         self.partial_rotary_factor,
                         traditional=self.rope_traditional)

    @staticmethod
    def from_hf(d: dict) -> "TransformerConfig":
        """Build from an HF config.json dict (the reference's serde
        ``ModelArgs``, qwen3-mlx/src/model.rs:47-64)."""
        return TransformerConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            num_kv_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
            intermediate_size=d["intermediate_size"],
            head_dim=d.get("head_dim"),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=d.get("rope_scaling"),
            partial_rotary_factor=d.get("partial_rotary_factor", 1.0),
            use_qk_norm=d.get("model_type") in ("qwen3", "qwen3_moe"),
            attention_bias=d.get("attention_bias",
                                 d.get("model_type") == "qwen2"),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            hidden_act=d.get("hidden_act", "silu"),
            sliding_window=(d.get("sliding_window")
                            if d.get("use_sliding_window", False) else None),
        )


# ------------------------------------------------------------ init ----------

def init_params(cfg: TransformerConfig, key, dtype=jnp.bfloat16) -> dict:
    """Random-init parameter tree mirroring HF names (for tests/benches)."""
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 4))
    hd = cfg.hd
    layers = []
    for _ in range(cfg.num_layers):
        lp = {
            "input_layernorm": jnp.ones((cfg.hidden_size,), dtype),
            "post_attention_layernorm": jnp.ones((cfg.hidden_size,), dtype),
            "q_proj": init_linear(next(keys), cfg.hidden_size,
                                  cfg.num_heads * hd, cfg.attention_bias, dtype),
            "k_proj": init_linear(next(keys), cfg.hidden_size,
                                  cfg.num_kv_heads * hd, cfg.attention_bias, dtype),
            "v_proj": init_linear(next(keys), cfg.hidden_size,
                                  cfg.num_kv_heads * hd, cfg.attention_bias, dtype),
            "o_proj": init_linear(next(keys), cfg.num_heads * hd,
                                  cfg.hidden_size, cfg.attention_out_bias, dtype),
            "gate_proj": init_linear(next(keys), cfg.hidden_size,
                                     cfg.intermediate_size, cfg.mlp_bias, dtype),
            "up_proj": init_linear(next(keys), cfg.hidden_size,
                                   cfg.intermediate_size, cfg.mlp_bias, dtype),
            "down_proj": init_linear(next(keys), cfg.intermediate_size,
                                     cfg.hidden_size, cfg.mlp_bias, dtype),
        }
        if cfg.use_qk_norm:
            lp["q_norm"] = jnp.ones((hd,), dtype)
            lp["k_norm"] = jnp.ones((hd,), dtype)
        layers.append(lp)
    params = {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, cfg.hidden_size),
                                   dtype) * 0.02,
        "layers": layers,
        "norm": jnp.ones((cfg.hidden_size,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init_linear(next(keys), cfg.hidden_size,
                                        cfg.vocab_size, False, dtype)
    return params


# ------------------------------------------------------- forward ------------

def attention_block(lp: dict, cfg: TransformerConfig, x: jax.Array,
                    cache: KVCache, offset: jax.Array,
                    mask: jax.Array, rope: RopeConfig,
                    fresh_prefill: bool = False,
                    kv_limit: Optional[int] = None,
                    ring_axis: Optional[str] = None,
                    in_norm: Optional[tuple] = None):
    """GQA attention with optional QK-RMSNorm and partial RoPE.

    x: [B, T, D_model]. Returns ([B, T, D_model], new KVCache).

    ring_axis (static): name of a sequence-parallel mesh axis — the call is
    running INSIDE shard_map with x/cache holding this device's sequence
    shard; attention runs as ring attention over the axis (ICI ppermute,
    parallel/ring_attention.py) and RoPE positions are globalized by the
    device's axis index. Context-parallel prefill, SURVEY §5.7.
    """
    B, T, _ = x.shape
    hd = cfg.hd
    if "qkv_proj" in lp:
        # fused projection: one weight stream instead of three; in_norm
        # rides the kernel prologue at decode (norm-fused qmm)
        qkv = linear(lp["qkv_proj"], x, norm=in_norm)
        qd = cfg.num_heads * hd
        kvd = cfg.num_kv_heads * hd
        q, k, v = (qkv[..., :qd], qkv[..., qd:qd + kvd], qkv[..., qd + kvd:])
        q = q.reshape(B, T, cfg.num_heads, hd)
        k = k.reshape(B, T, cfg.num_kv_heads, hd)
        v = v.reshape(B, T, cfg.num_kv_heads, hd)
    else:
        q = linear(lp["q_proj"], x, norm=in_norm).reshape(
            B, T, cfg.num_heads, hd)
        k = linear(lp["k_proj"], x, norm=in_norm).reshape(
            B, T, cfg.num_kv_heads, hd)
        v = linear(lp["v_proj"], x, norm=in_norm).reshape(
            B, T, cfg.num_kv_heads, hd)
    if cfg.use_qk_norm:
        q = rms_norm(lp["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(lp["k_norm"], k, cfg.rms_norm_eps)
    # [B, H, T, hd]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    positions = (offset[:, None] if getattr(offset, "ndim", 0) == 1
                 else offset) + jnp.arange(T, dtype=jnp.int32)
    if ring_axis is not None:
        # globalize positions: this device holds sequence shard [idx*T,
        # (idx+1)*T) of the fresh prompt
        positions = positions + jax.lax.axis_index(ring_axis) * T
    q = apply_rope(q, positions, rope)
    k = apply_rope(k, positions, rope)
    cache = cache.update(k, v, offset)
    from ominix_mlx_tpu.ops import flash_attention as fa
    if ring_axis is not None and T > 1:
        from ominix_mlx_tpu.parallel.ring_attention import ring_attention
        out = ring_attention(q, k, v, axis_name=ring_axis, causal=True,
                             scale=hd ** -0.5,
                             window=cfg.sliding_window or 0)
    elif fresh_prefill and T > 1 and fa.use_flash(T, hd) \
            and cfg.sliding_window is None:
        # first prefill: queries attend exactly the fresh tokens — use the
        # Pallas flash kernel instead of materializing the [T, S] mask
        out = fa.flash_prefill(q, k, v, scale=hd ** -0.5)
    elif kv_limit is not None:
        # continuation chunk of a long prefill: attend only the STATIC
        # prefix of the cache that can hold written keys (O(kv_limit), not
        # O(capacity) — VERDICT r2 weak #2). Flash (prefix-unmasked +
        # chunk-causal, LSE-merged) avoids materializing the f32 [T, S]
        # scores that XLA spills past S~6k; dense masked SDPA otherwise.
        pos = kv_limit - T
        if fa.use_flash_chunk(T, pos, hd) and cfg.sliding_window is None:
            out = fa.flash_chunk_prefill(
                q, cache.k[:, :, :kv_limit], cache.v[:, :, :kv_limit],
                pos, hd ** -0.5)
        else:
            out = sdpa(q, cache.k[:, :, :kv_limit], cache.v[:, :, :kv_limit],
                       scale=hd ** -0.5, mask=mask)
    else:
        from ominix_mlx_tpu.core.paged_cache import PagedKVCache
        from ominix_mlx_tpu.ops import paged_attention as pa
        if T == 1 and isinstance(cache, PagedKVCache) \
                and pa.use_paged_kernel(cfg.num_kv_heads, cache.page_size,
                                        cache.page_table.shape[1], hd):
            # fused decode attention over the page pool: ONE pass over K/V
            # instead of XLA's separate QK/softmax/AV fusions (3.5x HBM);
            # sliding-window models skip chunks outside the window
            lengths = (offset if getattr(offset, "ndim", 0) == 1
                       else jnp.broadcast_to(offset, (B,))) + 1
            o = pa.paged_decode_attention(
                q[:, :, 0, :], cache.k_pool, cache.v_pool,
                cache.page_table, lengths, hd ** -0.5,
                window=cfg.sliding_window or 0,
                k_scale=cache.k_scale, v_scale=cache.v_scale)
            out = o[:, :, None, :]
        else:
            out = sdpa(q, cache.k, cache.v, scale=hd ** -0.5, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, cfg.num_heads * hd)
    if "g_proj" in lp:  # gated attention output (Qwen3-Next attention.rs:24)
        out = out * jax.nn.sigmoid(linear(lp["g_proj"], x, norm=in_norm))
    return linear(lp["o_proj"], out), cache


def mlp_block(lp: dict, cfg: TransformerConfig, x: jax.Array,
              norm: Optional[tuple] = None) -> jax.Array:
    act = ACTIVATIONS[cfg.hidden_act]
    if "gate_up_proj" in lp:
        gu = linear(lp["gate_up_proj"], x, norm=norm)
        gate, up = jnp.split(gu, 2, axis=-1)
        return linear(lp["down_proj"], act(gate) * up)
    return linear(lp["down_proj"],
                  act(linear(lp["gate_proj"], x, norm=norm))
                  * linear(lp["up_proj"], x, norm=norm))


def decoder_layer(lp: dict, cfg: TransformerConfig, x, cache, offset, mask,
                  rope, fresh_prefill: bool = False,
                  kv_limit: Optional[int] = None,
                  ring_axis: Optional[str] = None):
    in_norm = (lp["input_layernorm"], cfg.rms_norm_eps)
    if "linear_attn" in lp:                # GatedDeltaNet (Qwen3-Next hybrid)
        from ominix_mlx_tpu.models import deltanet
        h_in = rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        h, cache = deltanet.block(lp["linear_attn"], cfg.deltanet, h_in, cache)
    elif "kv_a_proj_with_mqa" in lp:       # MLA attention (DeepSeek/GLM-4.7)
        from ominix_mlx_tpu.models import mla
        h_in = rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        h, cache = mla.attention_block(lp, cfg.mla, h_in, cache, offset, mask)
    else:
        # norm threaded into the projections (fused-prologue qmm at decode)
        h, cache = attention_block(lp, cfg, x, cache, offset, mask, rope,
                                   fresh_prefill, kv_limit, ring_axis,
                                   in_norm=in_norm)
    if "post_self_attn_layernorm" in lp:   # GLM4 sandwich norm
        h = rms_norm(lp["post_self_attn_layernorm"], h, cfg.rms_norm_eps)
    x = x + h
    post_norm = (lp["post_attention_layernorm"], cfg.rms_norm_eps)
    if "moe" in lp:
        from ominix_mlx_tpu.models.moe import moe_block
        h2 = rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        h2 = moe_block(lp["moe"], cfg.moe, h2)
    else:
        h2 = mlp_block(lp, cfg, x, norm=post_norm)
    if "post_mlp_layernorm" in lp:         # GLM4 sandwich norm
        h2 = rms_norm(lp["post_mlp_layernorm"], h2, cfg.rms_norm_eps)
    return x + h2, cache


def forward(params: dict, cfg: TransformerConfig, tokens: jax.Array,
            cache: ModelCache, fresh_prefill: bool = False,
            kv_limit: Optional[int] = None, skip_logits: bool = False,
            ring_axis: Optional[str] = None):
    """tokens: [B, T] -> (logits [B, T, V], new ModelCache).

    fresh_prefill=True (static) asserts the cache is empty, enabling the
    Pallas flash-attention prefill path. kv_limit (static) bounds the
    attended cache prefix during chunked prefill. skip_logits=True
    (static) returns the final hidden states instead of logits — non-final
    chunks of a long prefill only need the KV writes, and the lm_head is
    ~1.6 TFLOP + a [T, V] HBM write per 2k chunk on a 150k vocab.
    ring_axis (static): running inside shard_map with tokens/cache holding
    this device's sequence shard — see parallel/context_parallel.py."""
    return forward_embeds(params, cfg, embedding(params["embed"], tokens),
                          cache, fresh_prefill, kv_limit, skip_logits,
                          ring_axis)


def forward_embeds(params: dict, cfg: TransformerConfig, x: jax.Array,
                   cache: ModelCache, fresh_prefill: bool = False,
                   kv_limit: Optional[int] = None,
                   skip_logits: bool = False,
                   ring_axis: Optional[str] = None):
    """Like ``forward`` but takes input embeddings [B, T, D] directly —
    the splice point for multimodal prompts (audio features, image patches;
    reference: deepseek-ocr2 prepare_inputs lib.rs:522, qwen3-asr)."""
    T = x.shape[1]
    rope = cfg.rope()
    from ominix_mlx_tpu.core.paged_cache import PagedKVCache
    kv_caps = [lc.max_len for lc in cache.layers
               if isinstance(lc, (KVCache, PagedKVCache))]
    if kv_limit is not None and kv_caps:
        kv_limit = min(kv_limit, kv_caps[0])
    mask_cols = kv_limit if kv_limit is not None else (kv_caps[0]
                                                       if kv_caps else None)
    mask = (causal_mask(T, mask_cols, cache.offset, cfg.sliding_window)
            if kv_caps else None)
    new_layers = []
    for lp, lc in zip(params["layers"], cache.layers):
        x, lc = decoder_layer(lp, cfg, x, lc, cache.offset, mask, rope,
                              fresh_prefill, kv_limit, ring_axis)
        new_layers.append(lc)
    if skip_logits:
        x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
        return x, cache.with_layers(new_layers).advance(T)
    # final norm fused into the lm_head projection at decode
    f_norm = (params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = embedding_as_linear(params["embed"], x, norm=f_norm)
    else:
        logits = linear(params["lm_head"], x, norm=f_norm)
    if cfg.logits_scale != 1.0:
        logits = logits * cfg.logits_scale
    return logits, cache.with_layers(new_layers).advance(T)


def init_cache(cfg: TransformerConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> ModelCache:
    return ModelCache.init_dense(cfg.num_layers, batch, cfg.num_kv_heads,
                                 max_len, cfg.hd, dtype)


def init_paged_cache(cfg: TransformerConfig, batch: int, max_len: int,
                     page_size: int = 128, dtype=jnp.bfloat16,
                     quantized: bool = False) -> ModelCache:
    """Fully-backed paged cache with per-row contiguous page tables (page 0
    is the null page). Same capacity semantics as ``init_cache``; decode
    attention rides the fused Pallas kernel (ops/paged_attention.py) and
    streams only the pages written so far instead of full capacity.
    quantized=True stores int8 pages + per-(head, token) scales (half the
    pool HBM and half the decode-kernel DMA bytes)."""
    from ominix_mlx_tpu.core.paged_cache import PagedKVCache

    assert max_len % page_size == 0, (max_len, page_size)
    mp = max_len // page_size
    num_pages = batch * mp + 1
    # each layer gets its OWN table buffer: jits donate the whole cache,
    # and a shared buffer would be donated twice in one call
    layers = [PagedKVCache.init(
        batch, cfg.num_kv_heads, num_pages, page_size, cfg.hd, mp, dtype,
        page_table=(jnp.arange(batch * mp, dtype=jnp.int32)
                    .reshape(batch, mp) + 1),
        quantized=quantized)
              for _ in range(cfg.num_layers)]
    return ModelCache(layers=layers, offset=jnp.zeros((), jnp.int32))


PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
              "gate_proj", "up_proj", "down_proj",
              "qkv_proj", "gate_up_proj")


def _stack_weights(ws: list):
    """Row-concatenate linear weights (dense, QuantizedTensor or
    PackedQuantizedTensor) for fused projections."""
    from ominix_mlx_tpu.core.quant import QuantizedTensor
    from ominix_mlx_tpu.ops.quant_matmul import PackedQuantizedTensor

    w0 = ws[0]
    if isinstance(w0, QuantizedTensor):
        return QuantizedTensor(
            q=jnp.concatenate([w.q for w in ws], 0),
            scales=jnp.concatenate([w.scales for w in ws], 0),
            biases=jnp.concatenate([w.biases for w in ws], 0),
            group_size=w0.group_size, bits=w0.bits)
    if isinstance(w0, PackedQuantizedTensor):
        return PackedQuantizedTensor(
            data=jnp.concatenate([w.data for w in ws], 0),
            scales=jnp.concatenate([w.scales for w in ws], 0),
            biases=jnp.concatenate([w.biases for w in ws], 0),
            group_size=w0.group_size, bits=w0.bits,
            in_features=w0.in_features, act_bits=w0.act_bits,
            batched=all(w.batched for w in ws))
    from ominix_mlx_tpu.ops.quant_matmul import ChannelQuantizedTensor
    if isinstance(w0, ChannelQuantizedTensor):
        return ChannelQuantizedTensor(
            data=jnp.concatenate([w.data for w in ws], 0),
            scale=jnp.concatenate([w.scale for w in ws], 0))
    return jnp.concatenate(ws, 0)


def transpose_packed_params(params):
    """Re-tile every non-batched PackedQuantizedTensor into the
    transposed-panel layout of the M=1 decode kernel (to_panels_t —
    contiguous panel DMA + output rows on the MXU lanes; ineligible or
    batched tensors pass through). Walks dicts/lists/tuples so it applies
    to any model family's param tree, including the (tied) embedding —
    gather_rows understands the tiled layout. OMINIX_QMM_TP=0 disables."""
    import os

    from ominix_mlx_tpu.ops.quant_matmul import (PackedQuantizedTensor,
                                                 to_panels_t)
    if os.environ.get("OMINIX_QMM_TP", "1") != "1":
        return params

    def walk(node):
        if isinstance(node, PackedQuantizedTensor):
            return to_panels_t(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def fuse_layer_projections(params: dict) -> dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj per layer: one
    weight stream + one kernel launch instead of three/two (TPU-native
    version of the reference's per-proj Metal launches). Group-quantized
    weights additionally re-tile into the transposed-panel decode layout
    (transpose_packed_params) after fusing."""
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        nlp = dict(lp)
        if all(k in nlp for k in ("q_proj", "k_proj", "v_proj")):
            parts = [nlp.pop("q_proj"), nlp.pop("k_proj"), nlp.pop("v_proj")]
            fused = {"w": _stack_weights([p["w"] for p in parts])}
            if all("b" in p for p in parts):
                fused["b"] = jnp.concatenate([p["b"] for p in parts], 0)
            nlp["qkv_proj"] = fused
        if all(k in nlp for k in ("gate_proj", "up_proj")):
            parts = [nlp.pop("gate_proj"), nlp.pop("up_proj")]
            fused = {"w": _stack_weights([p["w"] for p in parts])}
            if all("b" in p for p in parts):
                fused["b"] = jnp.concatenate([p["b"] for p in parts], 0)
            nlp["gate_up_proj"] = fused
        out["layers"].append(nlp)
    return transpose_packed_params(out)


def quantize_params(params: dict, group_size: int = 64, bits: int = 4,
                    pack: bool = True, quantize_embed: bool = True,
                    consume: bool = True, batched: bool = False,
                    scheme: str = "group") -> dict:
    """Quantize all linear projection weights (post-hoc, like the
    reference's on-the-fly ``QuantizedLinear::try_from_linear`` path).

    scheme="group": MLX-compatible group quantization (Pallas decode
    kernels). scheme="channel8": per-output-channel symmetric int8 (w8a8)
    — the batched-serving scheme; a pure XLA int8 MXU matmul, fastest at
    decode M>1 (see ops/quant_matmul.py channelwise section).

    pack=True converts to the Pallas kernel layout (ops.quant_matmul.prepare)
    — use on TPU. consume=True deletes each original weight as it is
    quantized so peak memory stays ~1 weight above the quantized size.
    """
    from ominix_mlx_tpu.core.quant import quantize_tensor
    from ominix_mlx_tpu.ops.quant_matmul import channel_quantize, prepare

    def q(holder, key):
        w = holder[key]
        if scheme == "channel8":
            cq = jax.block_until_ready(channel_quantize(w))
            if consume:
                holder[key] = None
            return cq
        if w.shape[-1] % group_size:   # ineligible (tiny dims): keep dense
            return w
        qt = quantize_tensor(jnp.asarray(w, jnp.float32), group_size, bits)
        qt = jax.block_until_ready(qt)
        if consume:
            holder[key] = None  # drop the dense weight before the next one
        return prepare(qt, batched=batched) if pack else qt

    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for name in PROJ_NAMES:
            if name in nlp and not isinstance(nlp[name]["w"], dict):
                w = q(nlp[name], "w")
                nlp[name] = {**lp[name], "w": w}
        if "moe" in nlp and isinstance(nlp["moe"], dict):
            # stacked experts quantize by the same scheme (router gate is
            # tiny [E, D] — left dense); shared experts are plain linears
            from ominix_mlx_tpu.models.moe import quantize_experts_params
            moe = quantize_experts_params(
                nlp["moe"], group_size, bits, scheme=scheme)
            for sname in ("shared_expert",):
                if sname in moe and isinstance(moe[sname], dict):
                    se = {}
                    for pn, pv in moe[sname].items():
                        if isinstance(pv, dict) and "w" in pv \
                                and not isinstance(pv["w"], dict):
                            se[pn] = {**pv, "w": q(dict(pv), "w")}
                        else:
                            se[pn] = pv
                    moe[sname] = se
            nlp["moe"] = moe
        out["layers"].append(nlp)
    if quantize_embed and isinstance(params.get("embed"), jax.Array):
        # tied lm_head reads the embedding as a linear; quantizing it also
        # shrinks the biggest single tensor. Lookup dequantizes rows.
        # consume must clear the CALLER's reference (q(out, ...) would only
        # null the copy, keeping the dense tensor alive)
        out["embed"] = q(params, "embed")
    if "lm_head" in params:
        out["lm_head"] = {**params["lm_head"],
                          "w": q(params["lm_head"], "w")}
    return out


def init_quantized_params(cfg: TransformerConfig, key, group_size: int = 64,
                          bits: int = 4, pack: bool = True,
                          batched: bool = False,
                          scheme: str = "group") -> dict:
    """Random-init a quantized param tree directly (benchmarks/tests) —
    never materializes the dense bf16 weights."""
    from ominix_mlx_tpu.core.quant import QuantizedTensor
    from ominix_mlx_tpu.ops.quant_matmul import (ChannelQuantizedTensor,
                                                 prepare)

    hd = cfg.hd
    lim = 1 << (bits - 1)

    def qrand(k, out_f, in_f):
        k1, k2 = jax.random.split(k)
        if scheme == "channel8":
            return ChannelQuantizedTensor(
                data=jax.random.randint(k1, (out_f, in_f), -127, 128,
                                        jnp.int8),
                scale=jnp.full((out_f,), (in_f ** -0.5) / 127.0,
                               jnp.float32))
        qt = QuantizedTensor(
            q=jax.random.randint(k1, (out_f, in_f), -lim, lim, jnp.int8),
            scales=jnp.full((out_f, in_f // group_size),
                            (in_f ** -0.5) / lim, jnp.bfloat16),
            biases=jnp.zeros((out_f, in_f // group_size), jnp.bfloat16),
            group_size=group_size, bits=bits)
        return prepare(qt, batched=batched) if pack else qt

    keys = iter(jax.random.split(key, 9 * cfg.num_layers + 4))
    layers = []
    for _ in range(cfg.num_layers):
        lp = {
            "input_layernorm": jnp.ones((cfg.hidden_size,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((cfg.hidden_size,), jnp.bfloat16),
            "q_proj": {"w": qrand(next(keys), cfg.num_heads * hd, cfg.hidden_size)},
            "k_proj": {"w": qrand(next(keys), cfg.num_kv_heads * hd, cfg.hidden_size)},
            "v_proj": {"w": qrand(next(keys), cfg.num_kv_heads * hd, cfg.hidden_size)},
            "o_proj": {"w": qrand(next(keys), cfg.hidden_size, cfg.num_heads * hd)},
            "gate_proj": {"w": qrand(next(keys), cfg.intermediate_size, cfg.hidden_size)},
            "up_proj": {"w": qrand(next(keys), cfg.intermediate_size, cfg.hidden_size)},
            "down_proj": {"w": qrand(next(keys), cfg.hidden_size, cfg.intermediate_size)},
        }
        if cfg.use_qk_norm:
            lp["q_norm"] = jnp.ones((hd,), jnp.bfloat16)
            lp["k_norm"] = jnp.ones((hd,), jnp.bfloat16)
        layers.append(lp)
    params = {
        "embed": qrand(next(keys), cfg.vocab_size, cfg.hidden_size),
        "layers": layers,
        "norm": jnp.ones((cfg.hidden_size,), jnp.bfloat16),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": qrand(next(keys), cfg.vocab_size,
                                        cfg.hidden_size)}
    return params


def encode_hidden(params: dict, cfg: TransformerConfig, tokens: jax.Array,
                  num_layers: Optional[int] = None,
                  final_norm: bool = True) -> jax.Array:
    """Run the decoder as a TEXT ENCODER and return hidden states [B, T, D]
    (causal). This is how the DiT pipelines condition on text — flux-klein's
    Qwen3 encoder (qwen3_encoder.rs), zimage's layer-34 features
    (cap_feat_dim), qwen-image's Qwen2.5-VL encoder."""
    x = embedding(params["embed"], tokens)
    T = tokens.shape[1]
    rope = cfg.rope()
    mask = causal_mask(T, T, jnp.zeros((), jnp.int32), cfg.sliding_window)
    n = num_layers if num_layers is not None else cfg.num_layers
    for lp in params["layers"][:n]:
        lc = KVCache.init(tokens.shape[0], cfg.num_kv_heads, T, cfg.hd,
                          x.dtype)
        x, _ = decoder_layer(lp, cfg, x, lc, jnp.zeros((), jnp.int32), mask,
                             rope)
    if final_norm:
        x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return x


# ------------------------------------------------- HF weight loading --------

def _maybe_quantized(flat: dict, prefix: str, qcfg: Optional[dict]):
    """Return weight for ``prefix`` — dense [out,in] or QuantizedTensor if the
    checkpoint carries MLX-style {weight(packed u32), scales, biases}."""
    if f"{prefix}.scales" in flat:
        gs = qcfg.get("group_size", 64) if qcfg else 64
        bits = qcfg.get("bits", 4) if qcfg else 4
        return from_mlx_arrays(flat[f"{prefix}.weight"],
                               flat[f"{prefix}.scales"],
                               flat[f"{prefix}.biases"], gs, bits)
    return flat[f"{prefix}.weight"]


def _linear_params(flat: dict, prefix: str, qcfg):
    p = {"w": _maybe_quantized(flat, prefix, qcfg)}
    if f"{prefix}.bias" in flat:
        p["b"] = flat[f"{prefix}.bias"]
    return p


def params_from_flat(flat: dict, cfg: TransformerConfig,
                     qcfg: Optional[dict] = None) -> dict:
    """Build the param tree from a flat {hf_name: array} dict (works for both
    HF fp checkpoints and mlx-community quantized checkpoints)."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": flat[f"{p}.input_layernorm.weight"],
            "post_attention_layernorm":
                flat[f"{p}.post_attention_layernorm.weight"],
            "q_proj": _linear_params(flat, f"{p}.self_attn.q_proj", qcfg),
            "k_proj": _linear_params(flat, f"{p}.self_attn.k_proj", qcfg),
            "v_proj": _linear_params(flat, f"{p}.self_attn.v_proj", qcfg),
            "o_proj": _linear_params(flat, f"{p}.self_attn.o_proj", qcfg),
            "gate_proj": _linear_params(flat, f"{p}.mlp.gate_proj", qcfg),
            "up_proj": _linear_params(flat, f"{p}.mlp.up_proj", qcfg),
            "down_proj": _linear_params(flat, f"{p}.mlp.down_proj", qcfg),
        }
        if cfg.use_qk_norm:
            lp["q_norm"] = flat[f"{p}.self_attn.q_norm.weight"]
            lp["k_norm"] = flat[f"{p}.self_attn.k_norm.weight"]
        layers.append(lp)
    params = {
        "embed": _maybe_quantized(flat, "model.embed_tokens", qcfg),
        "layers": layers,
        "norm": flat["model.norm.weight"],
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in flat:
        params["lm_head"] = _linear_params(flat, "lm_head", qcfg)
    return params
