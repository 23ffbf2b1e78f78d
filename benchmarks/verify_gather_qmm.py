"""TPU numerics check for the gather_qmm decode kernel (_gather_qmm_decode):
kernel path vs dense per-expert dequantization, standalone AND inside a
lax.scan (the remote Mosaic service has stalled on kernels whose dots are
non-standard only once scanned — CLAUDE.md round-2 facts). Run on the TPU:
    python benchmarks/verify_gather_qmm.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp
from ominix_mlx_tpu.ops import quant_matmul as qm

key = jax.random.PRNGKey(0)
for bits in (4, 8):
    E, N, K, gs, k = 16, 512, 1280, 64, 6
    w = jax.random.normal(key, (E, N, K), jnp.float32) * 0.05
    pqe = qm.quantize_experts(w, group_size=gs, bits=bits)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)
    ids = jnp.asarray([[0, 3, 3, 7, 15, 1]], jnp.int32)
    out = np.asarray(qm.gather_qmm(x, pqe, ids), np.float32)  # [1, k, N]
    wd = np.stack([np.asarray(qm.dequantize_expert(pqe, e), np.float32)
                   for e in range(E)])
    xf = np.asarray(x, np.float32)
    ref = np.stack([xf[0] @ wd[e].T for e in np.asarray(ids[0])])[None]
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"gather_qmm bits={bits} standalone: rel={rel:.4g}", flush=True)
    assert rel < 0.05, (bits, rel)

    # scanned: 8 steps, ids vary per step, output feeds nothing back (ids
    # and x fixed) but the carry consumes the result so nothing is DCE'd
    @jax.jit
    def scanned(x0, pqe, ids0):
        def step(c, i):
            ids = (ids0 + i) % E
            o = qm.gather_qmm(c.astype(jnp.bfloat16), pqe, ids)
            return c + o.sum() * 1e-6, o.sum()
        return jax.lax.scan(step, x0, jnp.arange(8))

    c, sums = scanned(x.astype(jnp.float32), pqe, ids)
    print(f"gather_qmm bits={bits} scanned: sum[0]={float(sums[0]):.4g} "
          f"(compiled + ran)", flush=True)
print("gather_qmm kernel numerics OK", flush=True)
