"""Paraformer tests: CIF firing semantics vs a numpy reference of the
reference's host loop (paraformer.rs:778-880), end-to-end NAR shapes."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import paraformer as pf

TINY = pf.ParaformerConfig(
    n_mels=8, lfr_m=2, encoder_dim=32, encoder_layers=2, encoder_heads=2,
    encoder_ffn_dim=48, sanm_kernel_size=5, decoder_dim=32,
    decoder_layers=2, decoder_heads=2, decoder_ffn_dim=48, vocab_size=50)


def numpy_cif(hidden, alphas, threshold=1.0, tail=0.45):
    """Direct port of the reference host loop (ground truth)."""
    B, T, D = hidden.shape
    outs, counts = [], []
    for b in range(B):
        integrate, frame, frames = 0.0, np.zeros(D), []
        for t in range(T):
            a = alphas[b, t]
            completion = 1.0 - integrate
            integrate += a
            fire = integrate >= threshold
            if fire:
                integrate -= 1.0
            cur = completion if fire else a
            rem = a - cur
            frame = frame + cur * hidden[b, t]
            if fire:
                frames.append(frame.copy())
                frame = rem * hidden[b, t]
        if integrate > tail:
            frames.append(frame)
        outs.append(frames)
        counts.append(len(frames))
    mx = max(counts) if counts else 0
    padded = np.zeros((B, max(mx, 1), D))
    for b, fr in enumerate(outs):
        for i, f in enumerate(fr):
            padded[b, i] = f
    return padded, np.asarray(counts)


def test_cif_matches_reference_loop():
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(2, 20, 4)).astype(np.float32)
    alphas = rng.uniform(0.1, 0.6, size=(2, 20)).astype(np.float32)
    frames, counts = pf.cif(jnp.asarray(hidden), jnp.asarray(alphas))
    want_frames, want_counts = numpy_cif(hidden, alphas)
    np.testing.assert_array_equal(np.asarray(counts), want_counts)
    n = want_counts.max()
    np.testing.assert_allclose(np.asarray(frames)[:, :n], want_frames[:, :n],
                               rtol=1e-5, atol=1e-5)


def test_cif_fires_expected_count():
    # constant alpha 0.5 over 10 steps -> 5 fires, no tail
    hidden = jnp.ones((1, 10, 2))
    alphas = jnp.full((1, 10), 0.5)
    _, counts = pf.cif(hidden, alphas)
    assert int(counts[0]) == 5


@pytest.mark.slow
def test_transcribe_shapes():
    params = pf.init_params(TINY, jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 24, TINY.input_dim))
    logits, counts = pf.transcribe_logits(params, TINY, feats)
    assert logits.shape[0] == 1 and logits.shape[2] == TINY.vocab_size
    assert logits.shape[1] == 24  # max_tokens = T
    assert 0 <= int(counts[0]) <= 24
    assert np.isfinite(np.asarray(logits)).all()
