"""Continuous batching: slot-refill decode must produce exactly the same
greedy tokens as single-sequence generation, with requests of different
lengths arriving and finishing at different times."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.serving.batching import ContinuousBatcher

CFG = TransformerConfig(
    vocab_size=96, hidden_size=32, num_layers=2, num_heads=2,
    num_kv_heads=1, head_dim=16, intermediate_size=48,
    tie_word_embeddings=True)


def _reference(params, prompt, max_tokens):
    eng = Engine(lambda p, t, c: base.forward(p, CFG, t, c), params)
    cache = base.init_cache(CFG, 1, 128, jnp.float32)
    return list(eng.generate(jnp.asarray(prompt), cache,
                             max_tokens=max_tokens))


def test_continuous_batching_matches_single_sequence():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    reqs = [("a", [3, 7, 11], 6), ("b", [5, 2], 9), ("c", [9, 1, 4, 8], 4),
            ("d", [13], 7)]
    cb = ContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
        slots=2, max_len=128)
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


def test_continuous_batching_slot_reuse():
    """More requests than slots: every slot gets reused and every request
    completes."""
    params = base.init_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    cb = ContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
        slots=2, max_len=64)
    reqs = [(i, [i + 1, i + 2], 3) for i in range(5)]
    got = cb.run_all(reqs)
    assert set(got) == set(range(5))
    assert all(len(v) >= 1 for v in got.values())


def test_batcher_sampled_rows_mix_with_greedy():
    """Sampled + greedy requests in one batcher: greedy outputs still match
    single-sequence reference exactly; sampled outputs are deterministic
    per seed and vary across seeds."""
    from ominix_mlx_tpu.core.sampling import SamplerConfig

    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)

    def run(seed):
        cb = ContinuousBatcher(
            lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
            lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
            slots=2, max_len=128)
        cb.submit("g", [3, 7, 11], 6)                     # greedy
        cb.submit("s", [5, 2], 8,
                  sampler=SamplerConfig(temperature=1.2, top_k=20),
                  seed=seed)
        done = cb.run_all([])
        return done

    d1, d2, d3 = run(1), run(1), run(2)
    want = _reference(params, [3, 7, 11], 6)
    assert d1["g"] == want[:len(d1["g"])]
    assert d1["s"] == d2["s"]                 # same seed -> same draw
    assert d1["s"] != d3["s"] or d1["s"] == d3["s"] and len(d1["s"]) < 3
    assert all(0 <= t < CFG.vocab_size for t in d1["s"])


def _spec_batcher(params, slots=2, max_len=128, nd=3, draft_layers=None,
                  paged=False, **kw):
    """Batched speculative: draft = same weights (acceptance 1) or the
    first draft_layers layers (self-spec, partial acceptance)."""
    import dataclasses as dc
    if draft_layers is None:
        dcfg, dparams = CFG, params
    else:
        dcfg = dc.replace(CFG, num_layers=draft_layers)
        dparams = dict(params)
        dparams["layers"] = params["layers"][:draft_layers]
    dfwd = lambda p, t, c: base.forward(p, dcfg, t, c)
    dinit = lambda s, ml: base.init_cache(dcfg, s, ml, jnp.float32)
    if paged:
        from ominix_mlx_tpu.serving.batching import PagedContinuousBatcher
        return PagedContinuousBatcher(
            lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
            slots=slots, max_len=max_len, dtype=jnp.float32,
            draft_forward_fn=dfwd, draft_params=dparams,
            draft_init_cache_fn=dinit, num_draft_tokens=nd, **kw)
    return ContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
        slots=slots, max_len=max_len,
        draft_forward_fn=dfwd, draft_params=dparams,
        draft_init_cache_fn=dinit, num_draft_tokens=nd, **kw)


@pytest.mark.slow
def test_spec_batcher_acceptance_one_matches_greedy():
    """Draft == target: every draft verifies, outputs equal plain greedy
    token-for-token and rounds emit multiple tokens."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    reqs = [("a", [3, 7, 11], 9), ("b", [5, 2], 7), ("c", [9, 1, 4, 8], 8)]
    cb = _spec_batcher(params, nd=3)
    steps = 0
    got = {}
    for rid, toks, mt in reqs:
        cb.submit(rid, toks, mt)
    while cb.pending():
        for rid, out in cb.step():
            got[rid] = out
        steps += 1
        assert steps < 200
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)
    # acceptance-1 speculative needs far fewer rounds than tokens
    total = sum(len(v) for v in got.values())
    assert steps < total


def test_spec_batcher_partial_acceptance_matches_greedy():
    """Self-speculative draft (first layer only): acceptance < 1, output
    STILL equals plain greedy token-for-token (verify corrects)."""
    params = base.init_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    reqs = [("a", [3, 7, 11], 8), ("b", [5, 2], 10), ("c", [13], 6)]
    cb = _spec_batcher(params, nd=3, draft_layers=1)
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


@pytest.mark.slow
def test_spec_batcher_paged_pool():
    """Speculative + paged pool + continuous refill: exact greedy match;
    page growth reserves the round's nd+1 transient writes."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    reqs = [("a", [3, 7, 11], 8), ("b", [5, 2], 9), ("c", [9, 1, 4, 8], 6),
            ("d", [13], 7)]
    cb = _spec_batcher(params, nd=3, draft_layers=1, paged=True,
                       page_size=16)
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)
    assert all(not v for v in cb.alloc.owned.values())


def test_spec_batcher_rejects_sampled():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    from ominix_mlx_tpu.core.sampling import SamplerConfig
    cb = _spec_batcher(params, nd=2)
    try:
        cb.submit("s", [3, 7], 4, sampler=SamplerConfig(temperature=0.8))
        assert False, "expected ValueError"
    except ValueError:
        pass


@pytest.mark.slow
def test_spec_batcher_composes_with_prefix_cache():
    """Speculative + prefix caching + paged pool in one batcher: the
    second identical prompt reuses pages (hit) and still matches plain
    greedy exactly."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    cb = _spec_batcher(params, nd=3, draft_layers=1, paged=True,
                       page_size=16, prefix_cache=True,
                       chunk_forward_fn=lambda p, t, c, kl: base.forward(
                           p, CFG, t, c, kv_limit=kl))
    prompt = [(i * 7 + 3) % 96 for i in range(35)]
    got1 = cb.run_all([("a", prompt, 7)])["a"]
    got2 = cb.run_all([("b", prompt, 7)])["b"]
    assert cb.prefix.hits == 1
    want = _reference(params, prompt, 7)
    for got in (got1, got2):
        assert got == want[:len(got)] and len(got) >= len(want) - 1, (
            got, want)


@pytest.mark.slow
def test_batcher_chunked_adoption_prefill_matches_greedy():
    """Prompts longer than prefill_chunk adopt via the engine's chunked
    prefill (flash continuation path) and still match plain greedy."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    cb = ContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        lambda cfg, b, ml: base.init_cache(cfg, b, ml, jnp.float32),
        slots=2, max_len=128,
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, CFG, t, c, kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: base.forward(
            p, CFG, t, c, kv_limit=kl, skip_logits=True),
        prefill_chunk=16)
    prompt = [(i * 5 + 2) % 96 for i in range(41)]   # 3 chunks
    got = cb.run_all([("a", prompt, 6), ("b", prompt[:7], 6)])
    for rid, p, mt in (("a", prompt, 6), ("b", prompt[:7], 6)):
        want = _reference(params, p, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


def _hybrid_setup():
    """Tiny 2-layer hybrid: layer 0 GatedDeltaNet (RecurrentCache), layer 1
    full attention (KVCache) — the Qwen3-Next layer mix on base.forward."""
    import dataclasses

    from ominix_mlx_tpu.core.cache import KVCache, ModelCache
    from ominix_mlx_tpu.models.deltanet import DeltaNetConfig, RecurrentCache

    dcfg = DeltaNetConfig(num_v_heads=4, num_k_heads=2, head_k_dim=8,
                          head_v_dim=8, conv_kernel=3)
    cfg = dataclasses.replace(CFG, deltanet=dcfg)
    params = base.init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    keys = iter(jax.random.split(jax.random.PRNGKey(3), 8))
    lin = lambda o, i: {"w": 0.08 * jax.random.normal(
        next(keys), (o, i), jnp.float32)}
    r = dcfg.num_v_heads // dcfg.num_k_heads
    la = {
        "in_proj_qkvz": lin(dcfg.num_k_heads * (2 * dcfg.head_k_dim
                            + 2 * r * dcfg.head_v_dim), cfg.hidden_size),
        "in_proj_ba": lin(dcfg.num_k_heads * 2 * r, cfg.hidden_size),
        "conv1d": {"w": 0.3 * jax.random.normal(
            next(keys), (dcfg.conv_dim, dcfg.conv_kernel, 1), jnp.float32)},
        "A_log": jnp.zeros((dcfg.num_v_heads,), jnp.float32),
        "dt_bias": jnp.zeros((dcfg.num_v_heads,), jnp.float32),
        "norm": jnp.ones((dcfg.head_v_dim,), jnp.float32),
        "out_proj": lin(cfg.hidden_size, dcfg.value_dim),
    }
    lp0 = params["layers"][0]
    params["layers"][0] = {
        "input_layernorm": lp0["input_layernorm"],
        "post_attention_layernorm": lp0["post_attention_layernorm"],
        "gate_proj": lp0["gate_proj"], "up_proj": lp0["up_proj"],
        "down_proj": lp0["down_proj"], "linear_attn": la}

    def init_cache(cfg_, b, ml):
        return ModelCache(
            layers=[RecurrentCache.init(b, dcfg, jnp.float32),
                    KVCache.init(b, cfg.num_kv_heads, ml, cfg.hd,
                                 jnp.float32)],
            offset=jnp.zeros((), jnp.int32))

    return cfg, params, init_cache


def test_batcher_hybrid_deltanet_matches_single_sequence():
    """Continuous batching over a HYBRID cache (RecurrentCache + KVCache):
    adoption must carry the recurrent state and conv window of the fresh
    prefill into the slot row, not just the KV layers."""
    cfg, params, init_cache = _hybrid_setup()
    fwd = lambda p, t, c: base.forward(p, cfg, t, c)

    def ref(prompt, mt):
        eng = Engine(fwd, params)
        return list(eng.generate(jnp.asarray(prompt), init_cache(cfg, 1, 64),
                                 max_tokens=mt))

    cb = ContinuousBatcher(fwd, params, cfg, init_cache, slots=2, max_len=64)
    reqs = [("a", [3, 7, 11], 6), ("b", [5, 2], 8), ("c", [9, 1, 4, 8], 5)]
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = ref(prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


def _mla_setup():
    """Tiny 2-layer MLA model (absorbed DeepSeek-style latent attention)
    on base.forward — exercises vector-offset decode through mla.py."""
    import dataclasses

    from ominix_mlx_tpu.core.cache import ModelCache
    from ominix_mlx_tpu.models import mla

    mcfg = mla.MLAConfig(num_heads=2, q_lora_rank=None, kv_lora_rank=16,
                         qk_nope_head_dim=8, qk_rope_head_dim=8,
                         v_head_dim=8)
    cfg = dataclasses.replace(CFG, mla=mcfg)
    params = base.init_params(cfg, jax.random.PRNGKey(4), jnp.float32)
    keys = iter(jax.random.split(jax.random.PRNGKey(5), 16))
    lin = lambda o, i: {"w": 0.08 * jax.random.normal(
        next(keys), (o, i), jnp.float32)}
    for lp in params["layers"]:
        for k in ("q_proj", "k_proj", "v_proj", "o_proj", "q_norm",
                  "k_norm"):
            lp.pop(k, None)
        lp["q_proj"] = lin(mcfg.num_heads * mcfg.qk_head_dim,
                           cfg.hidden_size)
        lp["kv_a_proj_with_mqa"] = lin(
            mcfg.kv_lora_rank + mcfg.qk_rope_head_dim, cfg.hidden_size)
        lp["kv_a_layernorm"] = jnp.ones((mcfg.kv_lora_rank,), jnp.float32)
        kv_b = 0.08 * jax.random.normal(
            next(keys), (mcfg.num_heads * (mcfg.qk_nope_head_dim
                                           + mcfg.v_head_dim),
                         mcfg.kv_lora_rank), jnp.float32)
        lp["w_uk"], lp["w_uv"] = mla.absorb_kv_b(kv_b, mcfg)
        lp["o_proj"] = lin(cfg.hidden_size,
                           mcfg.num_heads * mcfg.v_head_dim)

    def init_cache(cfg_, b, ml):
        return ModelCache(
            layers=[mla.init_cache_layer(b, mcfg, ml, jnp.float32)
                    for _ in range(cfg.num_layers)],
            offset=jnp.zeros((), jnp.int32))

    return cfg, params, init_cache


def test_batcher_mla_matches_single_sequence():
    """Continuous batching over an MLA model: per-row vector offsets must
    drive the latent-attention RoPE/mask/KV-writes correctly."""
    cfg, params, init_cache = _mla_setup()
    fwd = lambda p, t, c: base.forward(p, cfg, t, c)

    def ref(prompt, mt):
        eng = Engine(fwd, params)
        return list(eng.generate(jnp.asarray(prompt), init_cache(cfg, 1, 64),
                                 max_tokens=mt))

    cb = ContinuousBatcher(fwd, params, cfg, init_cache, slots=2, max_len=64)
    reqs = [("a", [3, 7, 11], 6), ("b", [5, 2], 8), ("c", [9, 1, 4, 8], 5)]
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = ref(prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


def test_batcher_minicpm_hybrid_matches_single_sequence():
    """Continuous batching over MiniCPM-SALA (InfLLMv2 sparse + GLA
    mixers): per-row vector offsets must drive the sparse cache scatter,
    compressed-key re-pooling, per-row window/top-k selection and GLA
    rope positions correctly."""
    from ominix_mlx_tpu.models import minicpm_sala as mc
    from ominix_mlx_tpu.models.sparse_attention import SparseConfig

    cfg = mc.MiniCPMConfig(
        vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=48,
        mixer_types=("minicpm4", "lightning-attn"),
        sparse=SparseConfig(kernel_size=4, block_size=4, init_blocks=1,
                            window_size=8, topk=2),
        scale_emb=12.0, scale_depth=1.4, dim_model_base=32,
        tie_word_embeddings=True)
    params = mc.init_params(cfg, jax.random.PRNGKey(6))
    fwd = lambda p, t, c: mc.forward(p, cfg, t, c)
    init_cache = lambda cfg_, b, ml: mc.init_cache(cfg, b, ml, jnp.float32)

    def ref(prompt, mt):
        eng = Engine(fwd, params)
        return list(eng.generate(jnp.asarray(prompt), init_cache(cfg, 1, 64),
                                 max_tokens=mt))

    cb = ContinuousBatcher(fwd, params, cfg, init_cache, slots=2, max_len=64)
    reqs = [("a", [3, 7, 11], 8), ("b", [5, 2], 10), ("c", [9, 1, 4, 8], 6)]
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = ref(prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)


def test_hybrid_chunked_prefill_matches_whole():
    """prefill_chunked on the deltanet hybrid: exact-width chunks (no
    padding through the recurrence) + kv_limit attention prefix must equal
    one whole-prompt prefill."""
    cfg, params, init_cache = _hybrid_setup()
    fwd = lambda p, t, c: base.forward(p, cfg, t, c)
    eng = Engine(
        fwd, params,
        chunk_forward_fn=lambda p, t, c, kl: base.forward(p, cfg, t, c,
                                                          kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: base.forward(
            p, cfg, t, c, kv_limit=kl, skip_logits=True))
    toks = jnp.asarray([[7, 3, 11, 5, 2, 9, 1, 8, 4, 6, 10, 12, 13]])
    last_w, cache_w = eng.prefill(toks, init_cache(cfg, 1, 32))
    last_c, cache_c = eng.prefill_chunked(toks, init_cache(cfg, 1, 32),
                                          chunk_size=4)
    np.testing.assert_allclose(np.asarray(last_c), np.asarray(last_w),
                               rtol=2e-4, atol=2e-4)
    lg_w, _ = base.forward(params, cfg, jnp.asarray([[2]]), cache_w)
    lg_c, _ = base.forward(params, cfg, jnp.asarray([[2]]), cache_c)
    np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_w),
                               rtol=2e-4, atol=2e-4)


def test_batcher_moe_matches_single_sequence():
    """Continuous batching over an MoE model (top-k routed experts in each
    layer) — completes the family matrix: dense, MoE, hybrid, MLA."""
    import dataclasses

    from ominix_mlx_tpu.models.moe import MoEConfig, init_moe_params

    mcfg = MoEConfig(num_experts=4, top_k=2, norm_topk_prob=True,
                     moe_intermediate_size=32)
    cfg = dataclasses.replace(CFG, moe=mcfg)
    params = base.init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    for i, lp in enumerate(params["layers"]):
        for k in ("gate_proj", "up_proj", "down_proj"):
            lp.pop(k, None)
        lp["moe"] = init_moe_params(jax.random.PRNGKey(20 + i),
                                    cfg.hidden_size, mcfg, jnp.float32)
    fwd = lambda p, t, c: base.forward(p, cfg, t, c)
    init_cache = lambda cfg_, b, ml: base.init_cache(cfg, b, ml, jnp.float32)

    def ref(prompt, mt):
        eng = Engine(fwd, params)
        return list(eng.generate(jnp.asarray(prompt), init_cache(cfg, 1, 64),
                                 max_tokens=mt))

    cb = ContinuousBatcher(fwd, params, cfg, init_cache, slots=2, max_len=64)
    reqs = [("a", [3, 7, 11], 6), ("b", [5, 2], 8)]
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = ref(prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)
