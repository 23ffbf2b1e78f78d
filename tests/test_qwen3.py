"""Qwen3 end-to-end slice: shapes, prefill/decode consistency, HF logit
parity (the reference's cross-impl parity methodology, SURVEY.md §4), and the
generation engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.core.sampling import SamplerConfig
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig

TINY = TransformerConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=96, head_dim=16, use_qk_norm=True,
    tie_word_embeddings=True, rope_theta=10000.0)


def tiny_model(dtype=jnp.float32):
    params = base.init_params(TINY, jax.random.PRNGKey(0), dtype)
    return params


def test_forward_shapes():
    params = tiny_model()
    cache = base.init_cache(TINY, 1, 32, jnp.float32)
    tokens = jnp.asarray([[1, 2, 3, 4, 5]])
    logits, cache = base.forward(params, TINY, tokens, cache)
    assert logits.shape == (1, 5, TINY.vocab_size)
    assert int(cache.offset) == 5


def test_prefill_decode_consistency():
    """Token-by-token decode must reproduce the one-shot prefill logits."""
    params = tiny_model()
    tokens = jnp.asarray([[7, 3, 11, 5, 2, 9]])
    cache = base.init_cache(TINY, 1, 32, jnp.float32)
    full_logits, _ = base.forward(params, TINY, tokens, cache)

    cache = base.init_cache(TINY, 1, 32, jnp.float32)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, cache = base.forward(params, TINY, tokens[:, t:t + 1], cache)
        step_logits.append(lg[:, 0])
    got = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full_logits),
                               rtol=2e-4, atol=2e-4)


def test_hf_parity_qwen3():
    """Logit parity vs HF transformers Qwen3 with identical random weights."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config
    from transformers.models.qwen3 import Qwen3ForCausalLM

    from ominix_mlx_tpu.utils.loading import torch_to_jnp

    hf_cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, tie_word_embeddings=True, rope_theta=10000.0,
        attention_bias=False)
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(hf_cfg).eval()

    cfg = TransformerConfig.from_hf(hf_cfg.to_dict() | {"model_type": "qwen3"})
    flat = {k: torch_to_jnp(v).astype(jnp.float32)
            for k, v in hf.state_dict().items()}
    params = base.params_from_flat(flat, cfg)

    tokens = np.array([[5, 17, 99, 3, 42, 7, 18]])
    with torch.no_grad():
        want = hf(torch.tensor(tokens)).logits.numpy()
    cache = base.init_cache(cfg, 1, 16, jnp.float32)
    got, _ = base.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_engine_greedy_generate_matches_scan():
    params = tiny_model()
    engine = Engine(lambda p, t, c: base.forward(p, TINY, t, c), params,
                    SamplerConfig())
    prompt = jnp.asarray([1, 2, 3])

    cache = base.init_cache(TINY, 1, 64, jnp.float32)
    streamed = list(engine.generate(prompt, cache, max_tokens=8))

    cache = base.init_cache(TINY, 1, 64, jnp.float32)
    toks, _ = engine.generate_scan(prompt, cache, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(streamed),
                                  np.asarray(toks[0]))


def test_engine_prefill_bucketing_consistent():
    """A bucketed (padded) prefill must produce the same next-token logits as
    an exact-length forward."""
    params = tiny_model()
    engine = Engine(lambda p, t, c: base.forward(p, TINY, t, c), params)
    prompt = jnp.asarray([[4, 9, 1, 7, 3]])  # length 5 -> bucket 16

    cache = base.init_cache(TINY, 1, 64, jnp.float32)
    last, cache = engine.prefill(prompt, cache)
    assert int(cache.offset) == 5

    cache2 = base.init_cache(TINY, 1, 64, jnp.float32)
    full, _ = base.forward(params, TINY, prompt, cache2)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_generate_batch_per_sequence_finish():
    """Batched decode: each sequence stops at its own EOS; output padded."""
    params = tiny_model()
    engine = Engine(lambda p, t, c: base.forward(p, TINY, t, c), params)
    prompts = jnp.asarray([[1, 2, 3], [9, 8, 7]])
    cache = base.init_cache(TINY, 2, 64, jnp.float32)
    toks, lengths = engine.generate_batch(prompts, cache, max_tokens=10,
                                          pad_id=-1)
    assert toks.shape == (2, 10)
    # must match single-sequence greedy for each row
    for b in range(2):
        c = base.init_cache(TINY, 1, 64, jnp.float32)
        want = list(engine.generate(prompts[b], c, max_tokens=10))
        got = [int(t) for t in toks[b] if int(t) != -1][: len(want)]
        assert got == want[: len(got)]
        assert len(got) == 10  # no EOS in tiny model -> all 10 real


def test_prefill_chunked_matches_single_shot():
    params = tiny_model()
    engine = Engine(lambda p, t, c: base.forward(p, TINY, t, c), params)
    prompt = jnp.asarray([np.arange(1, 23) % 100])
    c1 = base.init_cache(TINY, 1, 64, jnp.float32)
    want, c1 = engine.prefill(prompt, c1)
    c2 = base.init_cache(TINY, 1, 64, jnp.float32)
    got, c2 = engine.prefill_chunked(prompt, c2, chunk_size=8)
    assert int(c2.offset) == 22
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # decode continues identically from both caches
    t1, _, _, _ = engine._decode_jit(params, c1, jnp.asarray([5]),
                                     jax.random.PRNGKey(0),
                                     jnp.full((1, 64), -1, jnp.int32),
                                     sampler=engine.sampler)
    t2, _, _, _ = engine._decode_jit(params, c2, jnp.asarray([5]),
                                     jax.random.PRNGKey(0),
                                     jnp.full((1, 64), -1, jnp.int32),
                                     sampler=engine.sampler)
    assert int(t1[0]) == int(t2[0])


def test_flash_chunk_merge_partials_exact():
    """LSE-merge of two disjoint-key partial attentions (the flash
    continuation-chunk path, ops/flash_attention.py) equals dense softmax
    attention over the concatenated keys."""
    from ominix_mlx_tpu.ops.flash_attention import _merge_partials

    B, H, T, D, S1, S2 = 1, 2, 4, 8, 6, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k1 = jax.random.normal(ks[1], (B, H, S1, D))
    v1 = jax.random.normal(ks[2], (B, H, S1, D))
    k2 = jax.random.normal(ks[3], (B, H, S2, D))
    v2 = jax.random.normal(ks[4], (B, H, S2, D))

    def partial_attn(k, v):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k)
        m = jnp.max(s, axis=-1, keepdims=True)          # [B,H,T,1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhts,bhsd->bhtd", p / l, v)
        # flash stores l/m broadcast along a 128-lane axis; 2 lanes suffice
        rep = lambda x: jnp.repeat(x, 2, axis=-1)
        return o, rep(l), rep(m)

    got = _merge_partials(*partial_attn(k1, v1), *partial_attn(k2, v2))
    s = jnp.einsum("bhtd,bhsd->bhts", q,
                   jnp.concatenate([k1, k2], axis=2))
    want = jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(s, axis=-1),
                      jnp.concatenate([v1, v2], axis=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_prefill_chunked_capacity_cap_fallback():
    """A chunk whose padded window would exceed cache capacity routes
    through plain prefill (the flash chunk contract kv_limit==pos+T cannot
    hold there) and still equals single-shot prefill."""
    params = tiny_model()
    engine = Engine(
        lambda p, t, c: base.forward(p, TINY, t, c), params,
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, TINY, t, c, fresh_prefill=True),
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, TINY, t, c, kv_limit=kl))
    prompt = jnp.asarray([np.arange(1, 29) % 100])      # 28 tokens, cap 30
    c1 = base.init_cache(TINY, 1, 30, jnp.float32)
    want, _ = engine.prefill(prompt, c1)
    c2 = base.init_cache(TINY, 1, 30, jnp.float32)
    got, c2 = engine.prefill_chunked(prompt, c2, chunk_size=8)
    assert int(c2.offset) == 28
    # last chunk (pos=24) pads only to capacity: kv_limit 30, never 32
    assert all(kl <= 30 for kl, _ in engine._chunk_jits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_multiturn_prefill_near_capacity_exact_fit():
    """Resuming prefill on a partly-full cache: the padded bucket must not
    overflow capacity (dynamic_update_slice would clamp and overwrite real
    slots), and an over-long continuation raises instead of corrupting."""
    params = tiny_model()
    engine = Engine(lambda p, t, c: base.forward(p, TINY, t, c), params)
    full = jnp.asarray([np.arange(1, 29) % 100])        # 28 tokens, cap 30
    c1 = base.init_cache(TINY, 1, 30, jnp.float32)
    want, _ = engine.prefill(full, c1)
    # turn 1: 22 tokens; turn 2: 6 more (bucket would be 8 > free 8? free=8
    # so exact-fit trims padding to the free tail)
    c2 = base.init_cache(TINY, 1, 30, jnp.float32)
    _, c2 = engine.prefill(full[:, :22], c2)
    got, c2 = engine.prefill(full[:, 22:], c2, fresh=False)
    assert int(c2.offset) == 28
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError, match="remaining capacity"):
        engine.prefill(full[:, :8], c2, fresh=False)    # 8 > free 2


def test_encode_hidden_as_text_encoder():
    params = tiny_model()
    h = base.encode_hidden(params, TINY, jnp.asarray([[1, 2, 3, 4]]))
    assert h.shape == (1, 4, TINY.hidden_size)
    h2 = base.encode_hidden(params, TINY, jnp.asarray([[1, 2, 3, 4]]),
                            num_layers=1, final_norm=False)
    assert h2.shape == h.shape
    assert not np.allclose(np.asarray(h), np.asarray(h2))


def test_prefill_chunked_kv_limit_matches_single_shot():
    """chunk_forward_fn path (static kv_limit continuation chunks, the
    O(written)-per-chunk long-prefill fix) must equal one-shot prefill."""
    params = tiny_model()
    engine = Engine(
        lambda p, t, c: base.forward(p, TINY, t, c), params,
        prefill_forward_fn=lambda p, t, c: base.forward(
            p, TINY, t, c, fresh_prefill=True),
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, TINY, t, c, kv_limit=kl),
        chunk_hidden_forward_fn=lambda p, t, c, kl: base.forward(
            p, TINY, t, c, kv_limit=kl, skip_logits=True))
    prompt = jnp.asarray([np.arange(1, 23) % 100])
    c1 = base.init_cache(TINY, 1, 64, jnp.float32)
    want, c1 = engine.prefill(prompt, c1)
    c2 = base.init_cache(TINY, 1, 64, jnp.float32)
    got, c2 = engine.prefill_chunked(prompt, c2, chunk_size=8)
    assert int(c2.offset) == 22
    # static kv_limits compiled; the non-final chunk used the lm-head-free
    # hidden variant, the final one the logits variant
    assert set(engine._chunk_jits) == {(16, True), (24, False)}
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # caches agree where written
    for l1, l2 in zip(c1.layers, c2.layers):
        np.testing.assert_allclose(np.asarray(l1.k[:, :, :22]),
                                   np.asarray(l2.k[:, :, :22]),
                                   rtol=2e-4, atol=2e-4)


def test_generate_batch_unequal_prompt_lengths():
    """Right-padded prompts with per-row lengths: each row must match its
    single-sequence greedy decode exactly (pads must not contaminate
    attention or RoPE positions)."""
    params = tiny_model()
    engine = Engine(lambda p, t, c: base.forward(p, TINY, t, c), params)
    rows = [[1, 2, 3, 4, 5], [9, 8], [6, 6, 6, 2]]
    T = max(len(r) for r in rows)
    prompts = jnp.asarray([r + [0] * (T - len(r)) for r in rows])
    lengths = [len(r) for r in rows]
    cache = base.init_cache(TINY, 3, 64, jnp.float32)
    toks, _ = engine.generate_batch(prompts, cache, max_tokens=8,
                                    pad_id=-1, prompt_lengths=lengths)
    for b, r in enumerate(rows):
        c = base.init_cache(TINY, 1, 64, jnp.float32)
        want = list(engine.generate(jnp.asarray(r), c, max_tokens=8))
        got = [int(t) for t in toks[b] if int(t) != -1]
        assert got == want, (b, got, want)


def test_flash_block_sizes_divisibility():
    """_block_sizes must always return tiles that divide (Tq, S): the v5e
    defaults (bq=256, bkm=512) only apply when they divide the shape, and
    the halving fallback must terminate at a divisor for any 128-multiple
    input (flash shapes are 128-aligned by use_flash/use_flash_chunk)."""
    from ominix_mlx_tpu.ops.flash_attention import _block_sizes

    for Tq in (128, 256, 384, 2048, 8192):
        for S in (128, 256, 640, 1920, 8192, 30720):
            bs = _block_sizes(Tq, S)
            assert Tq % bs.block_q == 0, (Tq, S, bs.block_q)
            assert S % bs.block_k_major == 0, (Tq, S, bs.block_k_major)
            assert bs.block_k_major % bs.block_k == 0
            assert bs.block_q >= 1 and bs.block_k >= 1
    # the tuned defaults survive on shapes they divide
    bs = _block_sizes(8192, 8192)
    assert bs.block_q == 256 and bs.block_k_major == 512
