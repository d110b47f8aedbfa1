"""Deviceless Mosaic compile check for the fused Pallas substep kernels.

Compiles ``simulate_batched_pallas`` (forward + gradient) for a real TPU
target WITHOUT touching the tunneled chip: a PJRT TPU *topology* (v5e by
default) gives the XLA TPU compiler (and hence Mosaic) a target to lower
for from this CPU host. This catches the class of failure that
interpret-mode CPU tests cannot — Mosaic layout/lowering crashes that
previously only surfaced as a SIGABRT on the real chip.

Usage: python tools/pallas_aot_check.py [--env Ant] [--envs 1024]
                                        [--topology v5e:2x2]
Exit code 0 = both kernels lower + compile; a Mosaic check failure aborts
the process (run under a subprocess wrapper in tests).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DIFFRL_PALLAS_AOT"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Ant")
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--topology", default="v5e:1x1")
    ap.add_argument("--substeps", type=int, default=16)
    ap.add_argument("--mm", type=int, default=16)
    args = ap.parse_args()

    from jax.experimental import topologies

    import diffrl_tpu.envs as envs
    from diffrl_tpu.sim.articulation import simulate_batched_pallas

    kwargs = {}
    if args.topology.endswith("1x1"):
        # single-chip topology: Mosaic custom calls cannot be auto-
        # partitioned, so compile for exactly one device
        kwargs["chips_per_host_bounds"] = (1, 1, 1)
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology, **kwargs)
    mesh = Mesh(np.array(topo.devices).reshape(-1), ("d",))
    repl = NamedSharding(mesh, PartitionSpec())

    env = envs.make(args.env, num_envs=args.envs, seed=0,
                    MM_caching_frequency=args.mm)
    model = env.model
    E = args.envs
    C, D = model.coord_count, model.dof_count

    def fwd(q, qd, ja):
        qn, qdn = simulate_batched_pallas(
            model, q, qd, ja, None, dt=env.dt,
            substeps=args.substeps, mass_matrix_freq=args.mm)
        return qn, qdn

    def loss(q, qd, ja):
        qn, qdn = fwd(q, qd, ja)
        return jnp.sum(qn) + jnp.sum(qdn ** 2)

    avals = [
        jax.ShapeDtypeStruct((E, C), jnp.float32, sharding=repl),
        jax.ShapeDtypeStruct((E, D), jnp.float32, sharding=repl),
        jax.ShapeDtypeStruct((E, D), jnp.float32, sharding=repl),
    ]

    import time

    for name, fn in [("forward", fwd),
                     ("gradient", jax.grad(loss, argnums=(0, 1, 2)))]:
        t0 = time.time()
        lowered = jax.jit(fn).lower(*avals)
        t1 = time.time()
        print(f"[pallas-aot] {name}: lowered in {t1 - t0:.1f}s", flush=True)
        lowered.compile()
        print(f"[pallas-aot] {name}: Mosaic compile OK in "
              f"{time.time() - t1:.1f}s ({args.env}, E={E}, "
              f"{args.topology})", flush=True)


if __name__ == "__main__":
    main()
