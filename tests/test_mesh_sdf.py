"""Mesh-SDF soft contacts (beyond-reference capability).

dflex carries GEO_MESH shapes through its model (model.py:497,956) but its
soft-contact kernel only evaluates sphere/box/capsule SDFs
(/root/reference/dflex/dflex/sim.py:931-948) — mesh shapes never contact
there. diffrl_tpu bakes every mesh shape into a voxel SDF at finalize()
(model.py:bake_mesh_sdf) and samples it with a trilinear gather in the soft
contact kernel (particles.py:mesh_sdf). These tests pin the bake accuracy
against an analytic sphere, force parity against the analytic GEO_SPHERE
path, gradient flow, and end-to-end support under simulate().
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffrl_tpu.sim import Mesh, ModelBuilder, bake_mesh_sdf
from diffrl_tpu.sim.particles import eval_soft_contacts, mesh_sdf, mesh_sdf_grad


def uv_sphere(radius=0.5, n_theta=24, n_phi=12):
    """Watertight UV-sphere triangle mesh."""
    verts = [(0.0, radius, 0.0)]
    for i in range(1, n_phi):
        phi = np.pi * i / n_phi
        for j in range(n_theta):
            th = 2 * np.pi * j / n_theta
            verts.append((
                radius * np.sin(phi) * np.cos(th),
                radius * np.cos(phi),
                radius * np.sin(phi) * np.sin(th),
            ))
    verts.append((0.0, -radius, 0.0))
    bot = len(verts) - 1
    tris = []
    ring = lambda i, j: 1 + (i - 1) * n_theta + (j % n_theta)
    for j in range(n_theta):  # top cap
        tris.append((0, ring(1, j + 1), ring(1, j)))
    for i in range(1, n_phi - 1):  # bands
        for j in range(n_theta):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            tris.extend([(a, b, d), (a, d, c)])
    for j in range(n_theta):  # bottom cap
        tris.append((bot, ring(n_phi - 1, j), ring(n_phi - 1, j + 1)))
    return np.array(verts), np.array(tris, dtype=np.int32).reshape(-1)


def test_bake_sphere_sdf_matches_analytic():
    verts, tris = uv_sphere(radius=0.5, n_theta=16, n_phi=8)
    grid, lower, spacing = bake_mesh_sdf(verts, tris, resolution=24)
    assert np.all(np.isfinite(grid))
    # boundary of the padded grid must be positive (outside the mesh)
    assert grid[0].min() > 0 and grid[-1].min() > 0

    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.8, 0.8, size=(256, 3)).astype(np.float32)
    d = mesh_sdf(jnp.asarray(grid), jnp.asarray(lower), 1.0 / jnp.asarray(spacing),
                 jnp.asarray(pts))
    analytic = np.linalg.norm(pts, axis=-1) - 0.5
    np.testing.assert_allclose(np.asarray(d), analytic, atol=0.03)

    # normals point radially outward near the surface
    surf = pts[np.abs(analytic) < 0.2]
    g = mesh_sdf_grad(jnp.asarray(grid), jnp.asarray(lower),
                      1.0 / jnp.asarray(spacing), jnp.asarray(surf))
    radial = surf / np.linalg.norm(surf, axis=-1, keepdims=True)
    cos = np.sum(np.asarray(g) * radial, axis=-1)
    assert np.min(cos) > 0.95


@functools.lru_cache(maxsize=1)
def _sphere_models():
    """Same scene twice: analytic GEO_SPHERE vs an equivalent mesh shape."""
    verts, tris = uv_sphere(radius=0.5, n_theta=24, n_phi=12)

    ba = ModelBuilder()
    ba.add_particle((0.02, 0.455, 0.01), (0.0, -0.5, 0.0), 1.0)
    ba.add_shape_sphere(-1, pos=(0.0, 0.0, 0.0), radius=0.5, density=0.0)

    bm = ModelBuilder()
    bm.sdf_resolution = 32
    bm.add_particle((0.02, 0.455, 0.01), (0.0, -0.5, 0.0), 1.0)
    bm.add_shape_mesh(-1, mesh=Mesh(verts, tris), density=0.0)

    rep = dict(ground=False, contact_ke=1.0e4, contact_kd=100.0,
               contact_kf=100.0, contact_mu=0.5)
    return (
        dataclasses.replace(ba.finalize(), **rep),
        dataclasses.replace(bm.finalize(), **rep),
    )


def test_mesh_soft_contact_matches_analytic_sphere():
    ma, mm = _sphere_models()
    x = ma.particle_q_init
    v = ma.particle_qd_init
    fa, _ = eval_soft_contacts(ma, x, v)
    fm, _ = eval_soft_contacts(mm, x, v)
    fa, fm = np.asarray(fa), np.asarray(fm)
    assert np.linalg.norm(fa[0]) > 1.0  # the contact is active
    np.testing.assert_allclose(fm, fa, rtol=0.2, atol=2.0)


def test_mesh_soft_contact_gradient():
    _, mm = _sphere_models()

    def loss(x):
        f, _ = eval_soft_contacts(mm, x, mm.particle_qd_init)
        return jnp.sum(f[:, 1])

    g = jax.grad(loss)(mm.particle_q_init)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_particle_supported_by_mesh_sphere():
    """End-to-end: a particle dropped onto a static mesh sphere is supported
    (mesh analog of test_soft_contact_static_sphere)."""
    from tests.test_particles import run_steps

    verts, tris = uv_sphere(radius=0.5, n_theta=16, n_phi=8)
    b = ModelBuilder()
    b.sdf_resolution = 20
    b.add_particle((0.0, 0.62, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_shape_mesh(-1, mesh=Mesh(verts, tris), density=0.0)
    model = dataclasses.replace(
        b.finalize(), ground=False,
        contact_ke=1.0e4, contact_kd=100.0, contact_kf=100.0, contact_mu=0.5,
    )
    state = run_steps(model, model.state(), 60, substeps=8)
    y = float(state.particle_q[0, 1])
    assert np.isfinite(y)
    assert y > 0.4  # resting near the mesh surface, did not fall through
