"""sample_dynamic (runtime-operand sampler) vs the static pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.core import sampling as S

RNG = np.random.default_rng(0)
LOGITS = jnp.asarray(RNG.normal(0, 3, (4, 50)), jnp.float32)


def _static_filtered(cfg):
    l = LOGITS / cfg.temperature
    l = S.apply_top_k(l, cfg.top_k)
    l = S.apply_top_p(l, cfg.top_p)
    return S.apply_min_p(l, cfg.min_p)


def test_greedy_rows_match_argmax():
    sp = S.SamplerParams.from_config(S.SamplerConfig(), 4)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    out = S.sample_dynamic(LOGITS, keys, sp)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(LOGITS, -1)))


def test_dynamic_support_matches_static_filters():
    """Dynamic draws must stay inside the static filter chain's support for
    each config (same top-k/top-p/min-p semantics, traced)."""
    for cfg in [S.SamplerConfig(temperature=0.7, top_k=5),
                S.SamplerConfig(temperature=1.3, top_p=0.8),
                S.SamplerConfig(temperature=1.0, min_p=0.2),
                S.SamplerConfig(temperature=0.9, top_k=7, top_p=0.9,
                                min_p=0.05)]:
        allowed = np.isfinite(np.asarray(_static_filtered(cfg)))
        sp = S.SamplerParams.from_config(cfg, 4)
        draws = np.asarray(jax.vmap(
            lambda k: S.sample_dynamic(LOGITS, jax.random.split(k, 4), sp)
        )(jax.random.split(jax.random.PRNGKey(2), 300)))
        for row in range(4):
            assert all(allowed[row, t] for t in set(draws[:, row])), cfg


def test_mixed_rows_one_call():
    """Different settings per row in ONE call: row 0 greedy, row 1 top-1
    (deterministic argmax via sampling), rows 2-3 free."""
    sp = S.SamplerParams.from_config(S.SamplerConfig(), 4)
    sp = sp.set_row(1, S.SamplerConfig(temperature=0.8, top_k=1))
    sp = sp.set_row(2, S.SamplerConfig(temperature=5.0))
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    out = np.asarray(S.sample_dynamic(LOGITS, keys, sp))
    am = np.asarray(jnp.argmax(LOGITS, -1))
    assert out[0] == am[0]
    assert out[1] == am[1]          # top-1 sampling == argmax
    assert 0 <= out[2] < 50 and 0 <= out[3] < 50


def test_repetition_penalty_dynamic_matches_static():
    cfg = S.SamplerConfig(repetition_penalty=1.5)
    recent = jnp.asarray([[1, 2, -1], [5, -1, -1], [-1, -1, -1],
                          [0, 1, 2]], jnp.int32)
    want = S.apply_repetition_penalty(LOGITS.astype(jnp.float32), recent, 1.5)
    sp = S.SamplerParams.from_config(cfg, 4)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    got = S.sample_dynamic(LOGITS, keys, sp, recent)   # temp 0 -> argmax
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.argmax(want, -1)))


def test_one_jit_for_all_configs():
    """The whole point: different SamplerConfigs must NOT retrace."""
    traces = []

    @jax.jit
    def step(logits, keys, sp):
        traces.append(1)
        return S.sample_dynamic(logits, keys, sp)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    for cfg in [S.SamplerConfig(), S.SamplerConfig(temperature=0.9),
                S.SamplerConfig(temperature=0.5, top_k=3, top_p=0.7)]:
        step(LOGITS, keys, S.SamplerParams.from_config(cfg, 4))
    assert len(traces) == 1
