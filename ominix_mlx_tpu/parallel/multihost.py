"""Multi-host (DCN) execution: hybrid meshes + process-local data feeding.

TPU pods are "ICI islands bridged by DCN": fast intra-slice links inside a
host/slice, slower data-center network between processes. The design rule
(How to Scale Your Model; reference's MPI/NCCL world in
mlx-rs-core/src/distributed.rs is the M-series counterpart) is to lay the
mesh out so the OUTER axis crosses processes — data/gradient collectives
ride DCN once per step — while tensor/expert axes stay inside the local
ICI island.

``jax.distributed`` + GSPMD already do the heavy lifting; this module pins
the conventions:

  - ``initialize()``: one call per process (coordinator + rank)
  - ``hybrid_mesh()``: [process, local] device grid -> Mesh((dp, tp)) with
    dp crossing DCN and tp inside the host
  - ``local_batch()``: build a dp-sharded GLOBAL array from each process's
    LOCAL rows (the input pipeline never gathers the global batch anywhere)

The same code runs a smoke train-step as ``python -m
ominix_mlx_tpu.parallel.multihost --rank R --nprocs N --port P`` on CPU
(Gloo collectives), which is how tests/test_multihost.py validates the DCN
path without pod hardware.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int):
    """Join the multi-process runtime (idempotent per process)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def hybrid_mesh(dcn_axis: str = "dp", local_axis: str = "tp"):
    """Mesh over [num_processes, local_devices]: outer axis crosses DCN."""
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()).reshape(jax.process_count(),
                                           jax.local_device_count())
    return Mesh(devs, (dcn_axis, local_axis))


def local_batch(mesh, spec, local_rows, global_batch: Optional[int] = None):
    """Assemble the global dp-sharded batch from this process's rows.

    local_rows: [B_local, ...] numpy array owned by this process. Returns a
    global jax.Array of shape [B_local * num_processes, ...] sharded by
    ``spec`` — no process ever materializes the full batch.
    """
    import jax
    from jax.sharding import NamedSharding
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_rows))


# ----------------------------------------------------- smoke train step -----

def _smoke(rank: int, nprocs: int, port: int) -> float:
    """TP-inside-host x DP-over-DCN train step on the shared base model;
    returns the (globally identical) loss."""
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    initialize(f"127.0.0.1:{port}", nprocs, rank)
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.models.base import TransformerConfig
    from ominix_mlx_tpu.parallel import mesh as pmesh

    m = hybrid_mesh()
    tp = m.devices.shape[1]
    cfg = TransformerConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=max(2, tp),
        num_kv_heads=max(2, tp), head_dim=8, intermediate_size=2 * 32,
        tie_word_embeddings=True)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    params = pmesh.shard_params(cfg, params, m)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, tokens):
        cache = base.init_cache(cfg, tokens.shape[0], tokens.shape[1],
                                jnp.float32)
        logits, _ = base.forward(p, cfg, tokens, cache)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)
        return nll.mean()

    @jax.jit
    def train_step(p, s, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(p, tokens)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    # deterministic global batch, each process contributing its own rows
    rows_per_proc = 2
    full = (np.arange(nprocs * rows_per_proc * 16) % 120).reshape(
        nprocs * rows_per_proc, 16).astype(np.int32)
    mine = full[rank * rows_per_proc:(rank + 1) * rows_per_proc]
    tokens = local_batch(m, P("dp", None), mine)

    with jax.set_mesh(m):
        params, opt_state, loss = train_step(params, opt_state, tokens)
        return float(loss)


def _smoke_single(nprocs: int) -> float:
    """Same computation on one process with nprocs*2 local devices — the
    reference value the DCN run must reproduce exactly."""
    import os
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={2 * nprocs}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.models.base import TransformerConfig
    from ominix_mlx_tpu.parallel import mesh as pmesh

    devs = np.array(jax.devices()).reshape(nprocs, 2)
    m = Mesh(devs, ("dp", "tp"))
    tp = 2
    cfg = TransformerConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=max(2, tp),
        num_kv_heads=max(2, tp), head_dim=8, intermediate_size=2 * 32,
        tie_word_embeddings=True)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    params = pmesh.shard_params(cfg, params, m)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, tokens):
        cache = base.init_cache(cfg, tokens.shape[0], tokens.shape[1],
                                jnp.float32)
        logits, _ = base.forward(p, cfg, tokens, cache)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)
        return nll.mean()

    @jax.jit
    def train_step(p, s, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(p, tokens)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    full = (np.arange(nprocs * 2 * 16) % 120).reshape(
        nprocs * 2, 16).astype(np.int32)
    tokens = jax.device_put(jnp.asarray(full), NamedSharding(m, P("dp", None)))
    with jax.set_mesh(m):
        _, _, loss = train_step(params, opt_state, tokens)
        return float(loss)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=29417)
    ap.add_argument("--single", action="store_true",
                    help="reference single-process run (rank ignored)")
    a = ap.parse_args()
    if a.single:
        print(f"dcn_smoke single loss={_smoke_single(a.nprocs):.6f}")
    else:
        print(f"dcn_smoke rank={a.rank} "
              f"loss={_smoke(a.rank, a.nprocs, a.port):.6f}")
