"""TPU numerics check for the tn-layout dispatch tiers.

Covers every M tier of quantized_matmul over to_panels_t weights:
  M=1        -> _qmm_pt (transposed-panel Pallas kernel)
  M=2..16    -> _from_panels_t + _qmm_dq (speculative-verify tier)
  M=64       -> _dense_tn (prefill: per-panel dequant + batched dot,
                no row-major reconstruction)
plus gather_rows (quantized embedding lookup, int8 MXU one-hot path)
against the dense dequantized reference. Run on the real TPU:
    python benchmarks/verify_tn.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp
from ominix_mlx_tpu.core.quant import quantize_tensor
from ominix_mlx_tpu.ops import quant_matmul as qm

key = jax.random.PRNGKey(0)
for (N, K, bits) in [(1024, 2560, 4), (2560, 1024, 8), (4096, 2560, 4)]:
    w = jax.random.normal(key, (N, K), jnp.float32) * 0.02
    qt = quantize_tensor(w, group_size=64, bits=bits)
    pqt = qm.prepare(qt, act_bits=8)
    pqt_t = qm.to_panels_t(pqt)
    assert pqt_t.tn, (N, K, bits)
    wd = qm.dequantize(qm.unpack(pqt_t), jnp.float32)
    for M in (1, 2, 8, 64):
        x = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.float32) * .5
        y = np.asarray(qm.quantized_matmul(x.astype(jnp.bfloat16), pqt_t),
                       dtype=np.float32)
        ref = np.asarray(x @ wd.T, dtype=np.float32)
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"N={N} K={K} bits={bits} M={M}: rel={rel:.4g}", flush=True)
        assert rel < 0.05, (N, K, bits, M, rel)

# gather_rows: quantized embedding lookup vs dense rows
for bits in (4, 8):
    V, D = 4096, 1024
    emb = jax.random.normal(key, (V, D), jnp.float32) * 0.05
    qt = quantize_tensor(emb, group_size=64, bits=bits)
    pqt_t = qm.to_panels_t(qm.prepare(qt, act_bits=8))
    assert pqt_t.tn
    wd = np.asarray(qm.dequantize(qm.unpack(pqt_t), jnp.float32))
    toks = jnp.asarray([0, 1, 127, 128, 4095, 777], jnp.int32)
    rows = np.asarray(qm.gather_rows(pqt_t, toks), dtype=np.float32)
    ref = wd[np.asarray(toks)]
    rel = np.abs(rows - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"gather_rows bits={bits}: rel={rel:.4g}", flush=True)
    assert rel < 1e-2, (bits, rel)
print("tn dispatch + gather_rows numerics OK", flush=True)
