"""Device-mesh helpers: shard the env axis over chips.

TPU-native replacement for the reference's Horovod wrapper
(/root/reference/externals/rl_games/rl_games/distributed/hvd_wrapper.py):
instead of process-per-GPU allreduce, environments shard over a ``data`` mesh
axis and the jitted training step's reductions (loss means, gradient sums,
RMS moments) become XLA collectives over ICI automatically. For multi-host
pods call :func:`init_distributed` first.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX (DCN) when running on a pod slice."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first N) devices with a ``data`` axis.

    Under multi-process (``jax.distributed``) execution ``jax.devices()``
    is the GLOBAL device list, so the mesh spans all hosts and reductions
    over ``data`` ride DCN between processes."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def _put(x, sharding):
    """device_put that also works when `sharding` spans non-addressable
    devices (multi-host): every process holds the same full host value
    (same-seed init), so each can serve its local shards by slicing."""
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(x, sharding)


def shard_env_axis(mesh: Mesh, pytree, num_envs: Optional[int] = None):
    """Place every [E, ...] leaf of an env-state pytree with E sharded over
    the ``data`` axis; scalars/keys replicated.

    Pass ``num_envs`` to shard exactly the leaves whose leading dim equals
    it — without it the fallback is a divisibility heuristic, which can
    mis-shard small leaves (e.g. a legacy [2] PRNG key on a 2-device mesh).
    """
    def place(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            spec = P()
        elif num_envs is not None:
            spec = (
                P("data", *([None] * (x.ndim - 1)))
                if x.shape[0] == num_envs
                else P()
            )
        elif x.shape[0] >= mesh.size and x.shape[0] % mesh.size == 0:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, pytree)


def replicate(mesh: Mesh, pytree):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    return jax.tree.map(
        lambda x: _put(x, NamedSharding(mesh, P())), pytree
    )
