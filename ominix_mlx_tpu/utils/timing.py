"""Micro-benchmark helper that times ops ON DEVICE via a fori_loop chain,
immune to host/tunnel dispatch noise (each per-call RPC through the axon
tunnel costs 100s of us, dwarfing ~20us kernels)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def bench_op(f, x, iters: int = 100, warmup: int = 2) -> float:
    """Return seconds per call of ``f(x)`` measured on device.

    ``f`` must map an array ``x`` to any pytree. A data dependency is
    threaded between iterations so XLA cannot hoist or CSE the calls.
    """

    @jax.jit
    def loop(x):
        def body(i, carry):
            x, s = carry
            y = f(x)
            leaf = jax.tree.leaves(y)[0]
            s2 = (leaf.astype(jnp.float32).ravel()[0] * 1e-30).astype(x.dtype)
            return (x + s2, s + s2.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))

    loop(x)[1].block_until_ready()  # compile
    best = float("inf")
    for _ in range(warmup + 1):
        t0 = time.perf_counter()
        loop(x)[1].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters
