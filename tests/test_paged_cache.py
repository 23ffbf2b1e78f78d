"""Paged KV cache: pool+page-table views must be bit-identical to the dense
cache, and the paged continuous batcher must reproduce single-sequence
greedy decoding while drawing pages from a shared (oversubscribed) pool."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core.cache import KVCache
from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.core.paged_cache import PageAllocator, PagedKVCache
from ominix_mlx_tpu.models import base
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.serving.batching import PagedContinuousBatcher

CFG = TransformerConfig(
    vocab_size=96, hidden_size=32, num_layers=2, num_heads=2,
    num_kv_heads=1, head_dim=16, intermediate_size=48,
    tie_word_embeddings=True)


def test_paged_view_matches_dense():
    B, n_kv, d, ps, mp = 2, 3, 8, 4, 4
    dense = KVCache.init(B, n_kv, mp * ps, d, jnp.float32)
    # identity page layout: row b owns pages [b*mp+1 .. b*mp+mp]
    table = jnp.asarray(
        [[1 + b * mp + i for i in range(mp)] for b in range(B)], jnp.int32)
    paged = PagedKVCache.init(B, n_kv, 1 + B * mp, ps, d, mp, jnp.float32,
                              page_table=table)
    rng = jax.random.PRNGKey(0)
    off = 0
    for T in (3, 1, 5, 1):
        rng, r1, r2 = jax.random.split(rng, 3)
        k = jax.random.normal(r1, (B, n_kv, T, d))
        v = jax.random.normal(r2, (B, n_kv, T, d))
        offs = jnp.asarray([off, off], jnp.int32)
        dense = dense.update(k, v, offs)
        paged = paged.update(k, v, offs)
        off += T
    np.testing.assert_array_equal(np.asarray(paged.k), np.asarray(dense.k))
    np.testing.assert_array_equal(np.asarray(paged.v), np.asarray(dense.v))


def test_paged_vector_offsets():
    B, n_kv, d, ps, mp = 2, 1, 8, 4, 2
    table = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    paged = PagedKVCache.init(B, n_kv, 5, ps, d, mp, jnp.float32,
                              page_table=table)
    k = jnp.ones((B, n_kv, 1, d))
    paged = paged.update(k, k, jnp.asarray([0, 5], jnp.int32))
    kv = np.asarray(paged.k)
    assert kv[0, 0, 0].sum() == d and kv[0, 0, 5].sum() == 0
    assert kv[1, 0, 5].sum() == d and kv[1, 0, 0].sum() == 0


def test_allocator_reuse_and_exhaustion():
    a = PageAllocator(num_pages=5, page_size=4)     # 4 usable pages
    assert a.alloc(0, 7) == a.owned[0] and len(a.owned[0]) == 2
    a.alloc(1, 8)
    try:
        a.alloc(2, 4)
        assert False, "expected MemoryError"
    except MemoryError:
        pass
    a.release(1)
    assert len(a.alloc(2, 4)) == 1                   # freed pages reused


def _reference(params, prompt, max_tokens):
    eng = Engine(lambda p, t, c: base.forward(p, CFG, t, c), params)
    cache = base.init_cache(CFG, 1, 128, jnp.float32)
    return list(eng.generate(jnp.asarray(prompt), cache,
                             max_tokens=max_tokens))


def test_paged_batcher_matches_single_sequence():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    reqs = [("a", [3, 7, 11], 6), ("b", [5, 2], 9), ("c", [9, 1, 4, 8], 4),
            ("d", [13], 7)]
    # oversubscribed pool: 2 slots x 8 max pages would need 16 pages fully
    # backed; 9 usable pages suffice because sequences stay short
    cb = PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        slots=2, max_len=128, page_size=16, num_pages=10,
        dtype=jnp.float32)
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)
    # every slot released its pages at completion
    assert not cb.alloc.owned or all(not v for v in cb.alloc.owned.values())
    assert len(cb.alloc.free) == 9


def test_paged_batcher_preempts_on_pool_exhaustion():
    """Pool too small to extend every in-flight sequence: the batcher must
    PREEMPT (release + requeue as a continuation) instead of raising
    MemoryError, and every request must still finish with the exact greedy
    tokens (continuation replay is exact for greedy decode)."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    # page_size=4, 2 slots: each request needs ceil((T+out)/4) pages; with
    # only 5 usable pages two growing sequences WILL collide mid-decode
    cb = PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        slots=2, max_len=64, page_size=4, num_pages=6,
        dtype=jnp.float32)
    reqs = [("a", [3, 7, 11], 10), ("b", [5, 2], 12), ("c", [9, 1, 4, 8], 8)]
    got = cb.run_all(reqs)
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)
    assert not cb.alloc.owned or all(not v for v in cb.alloc.owned.values())


@pytest.mark.slow
def test_paged_batcher_preemption_replays_sampled_rep_penalty():
    """Preemption replay must be exact for SAMPLED decode with repetition
    penalty: the requeued continuation re-derives each position's key via
    fold_in AND resumes the rep-penalty window from its generated history
    (the adoption prefill samples with the request's out-tail as recent)."""
    from ominix_mlx_tpu.core.sampling import SamplerConfig

    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    scfg = SamplerConfig(temperature=0.8, repetition_penalty=1.4)
    reqs = [("a", [3, 7, 11], 10), ("b", [5, 2], 12), ("c", [9, 1, 4, 8], 8)]

    def run(num_pages):
        cb = PagedContinuousBatcher(
            lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
            slots=2, max_len=64, page_size=4, num_pages=num_pages,
            dtype=jnp.float32)
        for rid, prompt, mt in reqs:
            cb.submit(rid, prompt, mt, sampler=scfg, seed=17)
        out = {}
        while cb.pending():
            for rid, toks in cb.step():
                out[rid] = toks
        return out

    full = run(2 * 16 + 1)   # fully backed: no preemption possible
    tight = run(6)           # 5 usable pages: preemption guaranteed
    for rid, _, _ in reqs:
        n = min(len(full[rid]), len(tight[rid]))
        assert n >= 4 and tight[rid][:n] == full[rid][:n], \
            (rid, tight[rid], full[rid])


def test_paged_batcher_abort_all_unblocks_emits():
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    cb = PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        slots=2, max_len=64, page_size=8, num_pages=17, dtype=jnp.float32)
    sink = {"a": [], "b": [], "c": []}
    for rid in sink:
        cb.submit(rid, [3, 7], 20, emit=sink[rid].append)
    cb.step()  # adopt + first decode
    cb.abort_all()
    assert not cb.pending()
    for rid, toks in sink.items():
        assert toks and toks[-1] is None, (rid, toks)


def test_paged_batcher_rejects_never_fitting_request():
    """A prompt that can never fit in the whole pool must be failed (emit
    None) rather than stalling the queue forever."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    cb = PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        slots=1, max_len=64, page_size=4, num_pages=4, dtype=jnp.float32)
    big, small = [], []
    cb.submit("big", list(range(1, 40)), 4, emit=big.append)
    cb.submit("small", [3, 7], 4, emit=small.append)
    done = cb.run_all([])
    assert big == [None]
    assert "small" in done and len(done["small"]) >= 1


def test_paged_decode_attention_kernel_interpret_matches_sdpa():
    """The hand-rolled paged decode-attention kernel (Pallas interpreter on
    CPU) equals masked sdpa over the gathered dense view, across ragged
    per-row lengths including page-boundary cases."""
    import numpy as np

    from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
    from ominix_mlx_tpu.core.paged_cache import PagedKVCache
    from ominix_mlx_tpu.ops.paged_attention import paged_decode_attention

    B, H, NKV, D, PS, MP = 4, 8, 2, 128, 128, 4
    S = MP * PS
    num_pages = B * MP + 1
    pc = PagedKVCache(
        k_pool=jax.random.normal(jax.random.PRNGKey(0),
                                 (NKV, num_pages, D, PS), jnp.float32),
        v_pool=jax.random.normal(jax.random.PRNGKey(1),
                                 (NKV, num_pages, PS, D), jnp.float32),
        page_table=jax.random.permutation(
            jax.random.PRNGKey(2),
            jnp.arange(1, num_pages, dtype=jnp.int32)).reshape(B, MP))
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, D), jnp.float32)
    lengths = jnp.asarray([1, 128, 129, 512], jnp.int32)

    got = paged_decode_attention(q, pc.k_pool, pc.v_pool, pc.page_table,
                                 lengths, D ** -0.5, interpret=True)
    mask = jnp.where(jnp.arange(S)[None, None, :] < lengths[:, None, None],
                     0.0, NEG_INF).astype(jnp.float32)
    want = sdpa(q[:, :, None, :], pc.k, pc.v, scale=D ** -0.5,
                mask=mask)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # non-default DMA chunking (tuning knob) must not change the result
    got2 = paged_decode_attention(q, pc.k_pool, pc.v_pool, pc.page_table,
                                  lengths, D ** -0.5, interpret=True,
                                  pages_per_chunk=2)
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_engine_generate_scan_paged_equals_dense():
    """Engine decode over init_paged_cache (the bench/serving paged path)
    equals the dense cache token-for-token."""
    from ominix_mlx_tpu.core.generate import Engine

    cfg = base.TransformerConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=8,
        num_kv_heads=4, head_dim=16, intermediate_size=128,
        use_qk_norm=True, tie_word_embeddings=True)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = Engine(lambda p, t, c: base.forward(p, cfg, t, c), params)
    prompt = jnp.asarray([[3, 7, 11, 2], [5, 9, 1, 4]])
    td, _ = eng.generate_scan(
        prompt, base.init_cache(cfg, 2, 64, jnp.float32), max_tokens=8)
    tp, _ = eng.generate_scan(
        prompt, base.init_paged_cache(cfg, 2, 64, page_size=16,
                                      dtype=jnp.float32), max_tokens=8)
    assert [int(t) for t in td.ravel()] == [int(t) for t in tp.ravel()]


def test_paged_cache_int8_update_roundtrip():
    """Quantized pool .k/.v views equal explicit quantize-dequantize of the
    written values (per-token symmetric int8 over the head dim)."""
    from ominix_mlx_tpu.core.paged_cache import quantize_kv_tokens

    B, n_kv, d, ps, mp = 2, 3, 8, 4, 4
    table = jnp.asarray(
        [[1 + b * mp + i for i in range(mp)] for b in range(B)], jnp.int32)
    paged = PagedKVCache.init(B, n_kv, 1 + B * mp, ps, d, mp,
                              page_table=table, quantized=True)
    assert paged.quantized and paged.k_pool.dtype == jnp.int8
    rng = jax.random.PRNGKey(0)
    off = 0
    want_k = np.zeros((B, n_kv, mp * ps, d), np.float32)
    want_v = np.zeros((B, n_kv, mp * ps, d), np.float32)
    for T in (3, 1, 5, 1):
        rng, r1, r2 = jax.random.split(rng, 3)
        k = jax.random.normal(r1, (B, n_kv, T, d))
        v = jax.random.normal(r2, (B, n_kv, T, d))
        paged = paged.update(k, v, jnp.asarray([off, off], jnp.int32))
        for x, out in ((k, want_k), (v, want_v)):
            q, s = quantize_kv_tokens(x)
            dq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
            out[:, :, off:off + T] = dq
        off += T
    np.testing.assert_allclose(
        np.asarray(paged.k, np.float32)[:, :, :off], want_k[:, :, :off],
        rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(paged.v, np.float32)[:, :, :off], want_v[:, :, :off],
        rtol=1e-2, atol=1e-2)


def test_paged_decode_attention_kernel_int8_interpret():
    """int8-paged kernel (interpret mode) equals masked sdpa over the
    dequantized dense view, ragged lengths."""
    from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
    from ominix_mlx_tpu.core.paged_cache import (PagedKVCache,
                                                 quantize_kv_tokens)
    from ominix_mlx_tpu.ops.paged_attention import paged_decode_attention

    B, H, NKV, D, PS, MP = 4, 8, 2, 128, 128, 4
    S = MP * PS
    num_pages = B * MP + 1
    kn = jax.random.normal(jax.random.PRNGKey(0),
                           (NKV, num_pages, PS, D), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(1),
                           (NKV, num_pages, PS, D), jnp.float32)
    kq, ks = quantize_kv_tokens(kn)       # [NKV, P, PS, D] / [NKV, P, PS]
    vq, vs = quantize_kv_tokens(vn)
    pc = PagedKVCache(
        k_pool=jnp.transpose(kq, (0, 1, 3, 2)),     # [NKV, P, D, PS]
        v_pool=vq,
        page_table=jax.random.permutation(
            jax.random.PRNGKey(2),
            jnp.arange(1, num_pages, dtype=jnp.int32)).reshape(B, MP),
        k_scale=ks.astype(jnp.float32), v_scale=vs.astype(jnp.float32))
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, D), jnp.float32)
    lengths = jnp.asarray([1, 128, 129, 512], jnp.int32)

    got = paged_decode_attention(q, pc.k_pool, pc.v_pool, pc.page_table,
                                 lengths, D ** -0.5, interpret=True,
                                 k_scale=pc.k_scale, v_scale=pc.v_scale)
    mask = jnp.where(jnp.arange(S)[None, None, :] < lengths[:, None, None],
                     0.0, NEG_INF).astype(jnp.float32)
    want = sdpa(q[:, :, None, :], pc.k, pc.v, scale=D ** -0.5,
                mask=mask)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_paged_int8_decode_logits_close_to_dense():
    """Full decode step through base.forward with an int8 paged cache:
    logits stay close to the dense-cache logits (quantization noise only),
    and the batcher's quantize_kv mode completes end-to-end."""
    cfg = base.TransformerConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=8,
        num_kv_heads=4, head_dim=16, intermediate_size=128,
        tie_word_embeddings=True)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    prompt = jnp.asarray([[3, 7, 11, 2], [5, 9, 1, 4]])
    dense = base.init_cache(cfg, 2, 64, jnp.float32)
    paged = base.init_paged_cache(cfg, 2, 64, page_size=16,
                                  dtype=jnp.float32, quantized=True)
    assert paged.layers[0].quantized
    ld, dense = base.forward(params, cfg, prompt, dense)
    lp, paged = base.forward(params, cfg, prompt, paged)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                               rtol=0.1, atol=0.15)
    nxt = jnp.argmax(ld[:, -1:], axis=-1)
    ld2, _ = base.forward(params, cfg, nxt, dense)
    lp2, _ = base.forward(params, cfg, nxt, paged)
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(ld2),
                               rtol=0.1, atol=0.2)

    cb = PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, cfg, t, c), params, cfg,
        slots=2, max_len=64, page_size=16, num_pages=9,
        dtype=jnp.float32, quantize_kv=True)
    got = cb.run_all([("a", [3, 7, 11], 6), ("b", [5, 2], 6)])
    assert len(got["a"]) >= 5 and len(got["b"]) >= 5


def test_allocator_refcount_share():
    a = PageAllocator(num_pages=6, page_size=4)
    owned = a.alloc(0, 8)                    # 2 pages, refs 1
    a.retain(owned[0])                       # cache-style extra ref
    a.release(0)
    assert owned[0] not in a.free and owned[1] in a.free
    a.share(1, [owned[0]])                   # slot 1 maps the shared page
    full = a.alloc(1, 8)                     # 1 more page
    assert full[0] == owned[0] and len(full) == 2
    assert a.refs[owned[0]] == 2
    a.release(1)
    assert a.refs[owned[0]] == 1             # cache ref survives
    a.drop(owned[0])
    assert owned[0] in a.free and not a.refs


def _paged_cb(params, prefix_cache=True, num_pages=None, slots=2):
    from ominix_mlx_tpu.serving.batching import PagedContinuousBatcher
    return PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        slots=slots, max_len=128, page_size=16, num_pages=num_pages,
        dtype=jnp.float32, prefix_cache=prefix_cache,
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, CFG, t, c, kv_limit=kl))


def test_prefix_cache_exact_reuse():
    """Second request with the same prompt reuses the first one's pages:
    suffix-only prefill, identical greedy tokens to the full-prefill
    reference."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    prompt = [(i * 7 + 3) % 96 for i in range(35)]      # 2 full pages + 3
    cb = _paged_cb(params)
    got1 = cb.run_all([("a", prompt, 6)])["a"]
    assert cb.prefix.misses >= 1 and cb.prefix.hits == 0
    assert len(cb.prefix.entries) == 2                   # 35 // 16 pages
    got2 = cb.run_all([("b", prompt, 6)])["b"]
    assert cb.prefix.hits == 1 and cb.prefix.hit_tokens == 32
    want = _reference(params, prompt, 6)
    assert got1 == want[:len(got1)] and len(got1) >= len(want) - 1
    assert got2 == want[:len(got2)] and len(got2) >= len(want) - 1


@pytest.mark.slow
def test_prefix_cache_shared_system_prompt():
    """Different requests sharing a long system prefix each match their
    own full-prefill reference; pages are physically shared while both
    are in flight (pool smaller than 2 full sequences)."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    sys_prefix = [(i * 5 + 11) % 96 for i in range(32)]  # exactly 2 pages
    reqs = [("a", sys_prefix + [7, 9], 5), ("b", sys_prefix + [13], 5),
            ("c", sys_prefix + [21, 2, 8], 5)]
    cb = _paged_cb(params)
    # warm the cache with the first request alone, then serve the rest
    got = cb.run_all([reqs[0]])
    got.update(cb.run_all(reqs[1:]))
    assert cb.prefix.hits >= 2
    for rid, prompt, mt in reqs:
        want = _reference(params, prompt, mt)
        assert got[rid] == want[:len(got[rid])] and \
            len(got[rid]) >= len(want) - 1, (rid, got[rid], want)
    # all slots released: only the cache's own refs remain
    assert all(not v for v in cb.alloc.owned.values())
    assert all(cb.alloc.refs[p] == 1 for p in cb.prefix.entries.values())


@pytest.mark.slow
def test_prefix_cache_eviction_under_pressure():
    """Pool too small to keep cached pages AND admit new work: LRU cache
    pages are evicted (they are capacity, not reservations) and requests
    still complete exactly."""
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    # 9 usable pages; each request needs ~3; cached prefixes pile up
    cb = _paged_cb(params, num_pages=10, slots=2)
    prompts = [[(i * k + 5) % 96 for i in range(20)] for k in (3, 7, 11, 13)]
    for j, p in enumerate(prompts):
        got = cb.run_all([(j, p, 5)])[j]
        want = _reference(params, p, 5)
        assert got == want[:len(got)] and len(got) >= len(want) - 1
    # the pool stayed within bounds throughout and the batcher is clean
    assert all(not v for v in cb.alloc.owned.values())


def test_prefix_cache_int8_pool_reuse():
    """Prefix caching composes with int8 KV pages: the gather dequantizes
    shared pages into the suffix prefill cache and requests complete."""
    from ominix_mlx_tpu.serving.batching import PagedContinuousBatcher
    params = base.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    cb = PagedContinuousBatcher(
        lambda p, t, c: base.forward(p, CFG, t, c), params, CFG,
        slots=2, max_len=128, page_size=16, dtype=jnp.float32,
        prefix_cache=True, quantize_kv=True,
        chunk_forward_fn=lambda p, t, c, kl: base.forward(
            p, CFG, t, c, kv_limit=kl))
    prompt = [(i * 7 + 3) % 96 for i in range(35)]
    got1 = cb.run_all([("a", prompt, 6)])["a"]
    got2 = cb.run_all([("b", prompt, 6)])["b"]
    assert cb.prefix.hits == 1
    assert len(got1) >= 5 and len(got2) >= 5


def test_paged_decode_attention_kernel_sliding_window():
    """window > 0: the kernel attends only the last `window` positions,
    equal to masked sdpa with the same window."""
    import numpy as np

    from ominix_mlx_tpu.core.attention import NEG_INF, sdpa
    from ominix_mlx_tpu.core.paged_cache import PagedKVCache
    from ominix_mlx_tpu.ops.paged_attention import paged_decode_attention

    B, H, NKV, D, PS, MP, W = 3, 4, 2, 128, 128, 4, 200
    S = MP * PS
    num_pages = B * MP + 1
    pc = PagedKVCache(
        k_pool=jax.random.normal(jax.random.PRNGKey(0),
                                 (NKV, num_pages, D, PS), jnp.float32),
        v_pool=jax.random.normal(jax.random.PRNGKey(1),
                                 (NKV, num_pages, PS, D), jnp.float32),
        page_table=jnp.arange(1, num_pages, dtype=jnp.int32).reshape(B, MP))
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, D), jnp.float32)
    lengths = jnp.asarray([150, 300, 512], jnp.int32)   # below/above window

    got = paged_decode_attention(q, pc.k_pool, pc.v_pool, pc.page_table,
                                 lengths, D ** -0.5, interpret=True,
                                 window=W)
    pos = jnp.arange(S)[None, None, :]
    ok = (pos < lengths[:, None, None]) & \
         (pos >= jnp.maximum(lengths - W, 0)[:, None, None])
    mask = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
    want = sdpa(q[:, :, None, :], pc.k, pc.v, scale=D ** -0.5,
                mask=mask)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
