"""Device mesh + shard_map wrapping for the data-parallel train step."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host init (DCN); safe no-op when running single-process.

    Must run BEFORE anything initializes the JAX backend (querying
    ``jax.devices()``/``process_count()`` would lock in a single-process
    backend and make ``jax.distributed.initialize`` fail). Only attempts
    initialization when the environment carries multi-host coordinates
    (pod-slice metadata / explicit coordinator env), so plain local runs
    never block on coordinator discovery.
    """
    import os

    coordinator = any(os.environ.get(h) for h in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    # Multiple TPU workers show up as a comma-separated hostname list
    # (single-host environments set TPU_WORKER_HOSTNAMES=localhost).
    multi_worker = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if not (coordinator or multi_worker):
        return  # single-host run: nothing to initialize
    jax.distributed.initialize()



def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all devices (ICI within a slice)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh.

    Multi-host: ``device_put`` cannot target another host's devices, so the
    replicated global arrays are assembled from each host's (identical)
    copy via ``make_array_from_process_local_data`` — every host holds the
    full value, the sharding spans the whole DCN-connected mesh.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch sharded along the data axis (leading dim).

    Single-process: ``batch`` is the global batch, split over local devices.
    Multi-host (pod slice): ``batch`` is this host's *local* shard — each
    host feeds its own data (per-host input sharding, SURVEY.md 2.3) and the
    pieces are assembled into one global array over DCN-spanning mesh.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def make_parallel_step(step: Callable, mesh: Mesh,
                       axis: str = "data") -> Callable:
    """shard_map + jit the per-device step built with axis_name=axis.

    State is replicated (P()); the image batch is sharded on its leading
    dimension. The step's internal pmean keeps the returned state
    replica-identical, so outputs are declared replicated. check_vma=False
    because the replication invariant is established by the pmean calls,
    which the static checker cannot see through optax internals.
    """
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def shard_stack(stack, mesh: Mesh, axis: str = "data"):
    """Place a (n_steps, B, H, W, C) scan-stack sharded on its BATCH dim.

    The per-host / multi-host contract matches ``shard_batch`` (each host
    supplies its local rows of dim 1)."""
    sharding = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, stack)
    return jax.device_put(stack, sharding)


def make_parallel_chunk(chunk_fn: Callable, mesh: Mesh,
                        axis: str = "data") -> Callable:
    """shard_map + jit a scan-of-steps program (train/steps.py::
    make_chunked_stepper): the stacked batch (n_steps, B, H, W, C) is
    sharded on its BATCH dim (axis 1), the scan dim stays unsharded."""
    mapped = jax.shard_map(
        chunk_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_single_step(step: Callable) -> Callable:
    """jit for the no-mesh (single device) path."""
    return jax.jit(step, donate_argnums=(0,))
