"""Policy export for serving: StableHLO artifacts via ``jax.export``.

The reference has no deployment story beyond torch checkpoints
(/root/reference/algorithms/shac.py:563-574 pickles module objects). Here a
trained policy is exported as a serialized StableHLO function — a
self-contained, framework-free artifact that any XLA runtime (TPU serving,
CPU, PJRT plugin) can load and execute without Python model code or pickle
trust.

The exported function is the full inference path: obs normalization
(frozen RunningMeanStd) -> actor MLP -> tanh squash, batch-polymorphic over
the leading dimension.
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_fn(fn: Callable, example_args, path: Optional[str] = None,
              batch_polymorphic: bool = True):
    """Export ``fn`` (a jittable function of positional array args) to a
    serialized StableHLO artifact.

    example_args: tuple of arrays/ShapeDtypeStructs fixing shapes/dtypes.
    batch_polymorphic: mark each arg's leading axis as a symbolic dimension
    so one artifact serves any batch size.
    Returns the serialized bytes; writes them to ``path`` when given.
    """
    specs = []
    if batch_polymorphic:
        scope = jax_export.SymbolicScope()
        for a in example_args:
            shape = jax_export.symbolic_shape(
                ",".join(["b"] + [str(d) for d in a.shape[1:]]), scope=scope
            )
            specs.append(jax.ShapeDtypeStruct(shape, a.dtype))
    else:
        specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example_args]

    exported = jax_export.export(jax.jit(fn))(*specs)
    data = bytes(exported.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_exported(path_or_bytes) -> Callable:
    """Load a serialized StableHLO artifact back into a callable."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jax_export.deserialize(data)
    return lambda *args: exported.call(*args)


def shac_policy_fn(checkpoint_path: str, cfg: dict):
    """Build the deterministic inference policy from a SHAC/BPTT checkpoint.

    Returns (fn, obs_dim, act_dim) where fn(obs[B, obs_dim]) -> actions in
    [-1, 1] — the exact evaluation-time path (normalized obs -> actor mu ->
    tanh, algorithms/shac.py evaluate_policy semantics).
    """
    from ..models.mlp import ActorDeterministicMLP, ActorStochasticMLP

    with open(checkpoint_path, "rb") as f:
        state = pickle.load(f)
    actor_params = jax.tree.map(jnp.asarray, state["actor"])
    obs_rms = state.get("obs_rms")

    network = cfg.get("params", {}).get("network", {})
    actor_name = network.get("actor", "ActorStochasticMLP")

    mlp = actor_params["mlp"]
    obs_dim = int(np.asarray(mlp[0]["w"]).shape[1])
    act_dim = int(np.asarray(mlp[-1]["w"]).shape[0])

    actor_cls = {
        "ActorStochasticMLP": ActorStochasticMLP,
        "ActorDeterministicMLP": ActorDeterministicMLP,
    }[actor_name]
    actor = actor_cls(obs_dim, act_dim, network)

    if obs_rms is not None:
        mean = jnp.asarray(obs_rms["mean"] if isinstance(obs_rms, dict)
                           else obs_rms.mean)
        var = jnp.asarray(obs_rms["var"] if isinstance(obs_rms, dict)
                          else obs_rms.var)
    else:
        mean = var = None

    def policy(obs):
        if mean is not None:
            obs = (obs - mean) / jnp.sqrt(var + 1e-5)
        return jnp.tanh(actor(actor_params, obs, deterministic=True))

    return policy, obs_dim, act_dim
