"""Measure all-pairs vs spatial-hash cloth self-collision on the TPU chip.

The reference only ships the O(T*P) all-pairs kernel
(/root/reference/dflex/dflex/sim.py:376-433); eval_triangles_contact_hashed
is the beyond-reference broad-phase (O(T * 27 * capacity)). This tool times
both on a crumpled cloth at a few sizes and prints a table for
docs/PERF_NOTES.md.

Usage: python tools/bench_tri_collision.py [--cpu]
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dims", type=int, nargs="*", default=[10, 20, 40, 60])
    args = ap.parse_args()
    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    from diffrl_tpu.sim import ModelBuilder
    from diffrl_tpu.sim.particles import (
        eval_triangles_contact,
        eval_triangles_contact_hashed,
    )

    def build(dim, seed=0):
        b = ModelBuilder()
        b.add_cloth_grid(
            pos=(0.0, 2.0, 0.0), rot=np.array([0.0, 0.0, 0.0, 1.0]),
            vel=(0.0, 0.0, 0.0), dim_x=dim, dim_y=dim,
            cell_x=0.1, cell_y=0.1, mass=0.1, fix_top=True,
        )
        m = b.finalize()
        # fold the sheet in half with slight layer separation: triangles
        # stay ~cell-sized (good broad-phase locality) while the two layers
        # sit inside the 0.1 contact radius of each other
        rng = np.random.default_rng(seed)
        q0 = np.asarray(m.particle_q_init, np.float64)
        P = q0.shape[0]
        ext = q0.max(0) - q0.min(0)
        flat = int(np.argmin(ext))                    # out-of-plane axis
        planar = [a for a in range(3) if a != flat]
        a0 = planar[int(np.argmax([ext[a] for a in planar]))]
        mid = (q0[:, a0].max() + q0[:, a0].min()) / 2
        x = q0.copy()
        x[:, a0] = np.abs(x[:, a0] - mid)
        x[:, flat] += 0.03 * np.sin(x[:, planar[0]] * 17.0) + 0.01 * rng.normal(size=P)
        x = jnp.asarray(x.astype(np.float32))
        v = jnp.asarray(rng.normal(0, 0.1, (P, 3)).astype(np.float32))
        return m, x, v

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"{'dim':>4} {'P':>6} {'T':>6} {'all-pairs ms':>12} {'hashed ms':>10} "
          f"{'speedup':>8} {'max|df|':>9}")
    for dim in args.dims:
        m, x, v = build(dim)
        P = x.shape[0]
        T = m.tri_indices.shape[0]
        # cell >= 0.1 contact radius + max centroid-to-vertex distance
        tri = np.asarray(m.tri_indices)
        xs = np.asarray(x)
        cen = xs[tri].mean(axis=1)
        rad = np.linalg.norm(xs[tri] - cen[:, None], axis=-1).max()
        cell = 0.1 + float(rad) + 1e-3
        # ~2 layers x (cell/0.1)^2 in-plane vertices per cell; slight
        # overflow (dropped candidates) is acceptable in the bench — max|df|
        # reports the resulting force deviation vs all-pairs
        cap = int(min(P, max(8, 3 * (cell / 0.1) ** 2)))
        m = dataclasses.replace(
            m, tri_collision_cell_size=cell,
            tri_collision_buckets=2048, tri_collision_capacity=cap,
        )
        f_all = jax.jit(eval_triangles_contact)
        f_hash = jax.jit(eval_triangles_contact_hashed)

        def attempt(fn):
            try:
                return timeit(fn, m, x, v)
            except Exception as e:  # RESOURCE_EXHAUSTED at large T*P
                return None

        ms_all = attempt(f_all)
        ms_hash = attempt(f_hash)
        if ms_all is not None and ms_hash is not None:
            df = float(jnp.max(jnp.abs(f_all(m, x, v) - f_hash(m, x, v))))
            scale = float(jnp.max(jnp.abs(f_all(m, x, v))))
            print(f"{dim:>4} {P:>6} {T:>6} {ms_all:>12.3f} {ms_hash:>10.3f} "
                  f"{ms_all / ms_hash:>8.2f} {df / max(scale, 1e-9):>9.1e}")
        else:
            sa = f"{ms_all:.3f}" if ms_all is not None else "OOM"
            sh = f"{ms_hash:.3f}" if ms_hash is not None else "OOM"
            print(f"{dim:>4} {P:>6} {T:>6} {sa:>12} {sh:>10} {'-':>8} {'-':>9}")


if __name__ == "__main__":
    main()
