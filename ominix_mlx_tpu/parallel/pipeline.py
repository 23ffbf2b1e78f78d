"""Pipeline parallelism over a "pp" mesh axis (GPipe-style).

No reference counterpart exists (SURVEY.md §2.7: the reference is single
device); this is new TPU-first design like the rest of parallel/. The
schedule is the classic ICI-friendly one: stage s computes microbatch m at
step t = s + m, activations hop to the next stage with ONE ``ppermute``
per step (neighbor traffic only — rides ICI), and the whole schedule is a
``lax.scan`` inside ``shard_map`` so XLA sees a single static program.

Layout:
  - layers are grouped into S stages; each stage's layer params are
    STACKED along a leading axis sharded over "pp" (one stage per device)
  - microbatches stream through; total steps = M + S - 1
  - bubble fraction = (S-1)/(M+S-1): choose M >= 4*S for >80% utilization
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map  # jax 0.9 API (check_vma kwarg)


def stack_stage_params(layer_params: list, n_stages: int):
    """[L] homogeneous per-layer pytrees -> pytree with leading axes
    [S, L/S, ...] (stage-major). Shard axis 0 over "pp"."""
    L = len(layer_params)
    assert L % n_stages == 0, (L, n_stages)
    per = L // n_stages
    return jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(n_stages, per, *xs[0].shape),
        *layer_params)


def stage_specs(stacked) -> object:
    """PartitionSpec tree: stage axis on "pp", everything else replicated."""
    return jax.tree.map(lambda _: P("pp"), stacked)


def pipeline_apply(mesh: Mesh, layer_fn: Callable, stacked_params,
                   xs: jax.Array) -> jax.Array:
    """Run microbatches through the layer pipeline.

    layer_fn(params_one_layer, x) -> x  (same shape)
    stacked_params: output of stack_stage_params, sharded [S, L/S, ...]
    xs: [M, mb, ...] microbatches (replicated)
    returns [M, mb, ...] outputs (replicated)
    """
    S = mesh.shape["pp"]
    M = xs.shape[0]
    T = M + S - 1

    def stage_fn(params, x):
        # apply this stage's L/S layers in order
        def body(x, lp):
            return layer_fn(lp, x), None
        x, _ = jax.lax.scan(body, x, params)
        return x

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(stage_specs(stacked_params), P(None)),
        out_specs=P(None), check_vma=False)
    def run(params, xs):
        params = jax.tree.map(lambda a: a[0], params)   # local stage
        s = jax.lax.axis_index("pp")
        zero = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)

        def step(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t (clamped; inactive slots masked)
            x0 = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1), 0,
                                              keepdims=False)
            x_in = jnp.where(s == 0, x0, buf)
            y = stage_fn(params, x_in)
            # the LAST stage finishes microbatch m = t - (S-1)
            m = t - (S - 1)
            take = (s == S - 1) & (m >= 0)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, y, jax.lax.dynamic_index_in_dim(
                    outs, jnp.clip(m, 0, M - 1), 0, keepdims=False)),
                jnp.clip(m, 0, M - 1), 0)
            # hop activations to the next stage (ring; stage 0's incoming
            # from stage S-1 is ignored by the s == 0 select above)
            buf = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % S) for i in range(S)])
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(step, (zero, outs0),
                                    jnp.arange(T))
        # only the last stage holds real outputs; replicate them
        outs = jnp.where(s == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, "pp")

    return run(stacked_params, xs)


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """(dp, pp) mesh for pipeline runs; composes with the (dp, tp) mesh
    utilities in parallel.mesh for 3D layouts."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = dp * pp
    arr = np.asarray(devices[:n]).reshape(dp, pp)
    return Mesh(arr, ("dp", "pp"))
