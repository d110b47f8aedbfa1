"""Particle / deformable dynamics: springs, cloth FEM, bending, tets, contacts.

TPU-first re-design of the reference particle kernel family
(/root/reference/dflex/dflex/sim.py:70-995 and the XPBD solvers
sim.py:2616-2872). Each reference CUDA kernel (one thread per element,
atomic_add scatter into the force buffer) becomes a batched gather ->
vectorized math -> ``segment_sum`` scatter over the element axis; environments
vmap over the leading axis so every op is a regular [E, P, 3]-shaped tensor
op XLA fuses into a handful of HBM passes.

Gradient conventions deliberately match the reference adjoints
(/root/reference/dflex/dflex/adjoint.h:129-190): ``step``/``sign`` carry zero
gradient (they appear only as multiplicative masks computed from comparisons,
which jnp already differentiates to zero), ``min``/``max``/``clamp`` pick the
active branch. ``acos`` in the bending kernel is clamped away from |1| to
keep long-rollout gradients finite (NaN defense, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import safe_normalize, transform_point

_GROUND_N = jnp.array([0.0, 1.0, 0.0])


def _scatter(contrib, idx, num_particles):
    """Sum per-element [K, 3] contributions onto particles [P, 3]."""
    return jax.ops.segment_sum(contrib, idx, num_segments=num_particles)


# ---------------------------------------------------------------------------
# force kernels (semi-implicit path)


def eval_springs(model, x, v):
    """Damped spring forces (eval_springs, sim.py:156-196)."""
    P = x.shape[0]
    i = model.spring_indices[:, 0]
    j = model.spring_indices[:, 1]

    xij = x[i] - x[j]
    vij = v[i] - v[j]

    l2 = jnp.sum(xij * xij, axis=-1)
    l = jnp.sqrt(jnp.maximum(l2, 1e-12))
    dir = xij / l[:, None]

    c = l - model.spring_rest_length
    dcdt = jnp.sum(dir * vij, axis=-1)

    fs = dir * (model.spring_stiffness * c + model.spring_damping * dcdt)[:, None]
    return _scatter(-fs, i, P) + _scatter(fs, j, P)


def eval_triangles(model, x, v):
    """FEM triangle: neo-Hookean membrane + area preservation + lift/drag
    (eval_triangles, sim.py:199-327)."""
    P = x.shape[0]
    i, j, k = (model.tri_indices[:, c] for c in range(3))

    p, q, r = x[i], x[j], x[k]
    vp, vq, vr = v[i], v[j], v[k]

    qp = q - p
    rp = r - p

    Dm = model.tri_poses  # [T, 2, 2]
    inv_rest_area = (Dm[:, 0, 0] * Dm[:, 1, 1] - Dm[:, 0, 1] * Dm[:, 1, 0]) * 2.0
    rest_area = 1.0 / inv_rest_area

    k_mu = model.tri_ke * rest_area
    k_lambda = model.tri_ka * rest_area
    k_damp = model.tri_kd * rest_area

    # deformation gradient columns F = Xs * Dm
    f1 = qp * Dm[:, 0, 0, None] + rp * Dm[:, 1, 0, None]
    f2 = qp * Dm[:, 0, 1, None] + rp * Dm[:, 1, 1, None]

    # neo-Hookean deviatoric part: force = mu * F * Dm^T
    fq = (f1 * Dm[:, 0, 0, None] + f2 * Dm[:, 0, 1, None]) * k_mu[:, None]
    fr = (f1 * Dm[:, 1, 0, None] + f2 * Dm[:, 1, 1, None]) * k_mu[:, None]
    alpha = 1.0 + model.tri_ke / model.tri_ka

    # area preservation
    n = jnp.cross(qp, rp)
    n_len = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1), 1e-24))
    area = n_len * 0.5

    c = area * inv_rest_area - alpha + model.tri_activations
    n_hat = n / n_len[:, None]
    dcdq = jnp.cross(rp, n_hat) * (inv_rest_area * 0.5)[:, None]
    dcdr = jnp.cross(n_hat, qp) * (inv_rest_area * 0.5)[:, None]

    f_area = k_lambda * c

    # area damping
    dcdt = (
        jnp.sum(dcdq * vq, axis=-1)
        + jnp.sum(dcdr * vr, axis=-1)
        - jnp.sum((dcdq + dcdr) * vp, axis=-1)
    )
    f_damp = k_damp * dcdt

    fq = fq + dcdq * (f_area + f_damp)[:, None]
    fr = fr + dcdr * (f_area + f_damp)[:, None]
    fp = fq + fr

    # lift + drag cloth aerodynamics
    if model.tri_drag > 0.0 or model.tri_lift > 0.0:
        vmid = (vp + vr + vq) * 0.3333
        vdir = safe_normalize(vmid)
        ndotv = jnp.sum(n_hat * vmid, axis=-1)
        f_drag = vmid * (model.tri_drag * area * jnp.abs(ndotv))[:, None]
        cosang = jnp.clip(jnp.sum(n_hat * vdir, axis=-1), -1.0 + 1e-6, 1.0 - 1e-6)
        f_lift = (
            n_hat
            * (model.tri_lift * area * (1.57079 - jnp.arccos(cosang)))[:, None]
            * jnp.sum(vmid * vmid, axis=-1)[:, None]
        )
        fp = fp - f_drag - f_lift
        fq = fq + f_drag + f_lift
        fr = fr + f_drag + f_lift

    return _scatter(fp, i, P) + _scatter(-fq, j, P) + _scatter(-fr, k, P)


def triangle_closest_point_barycentric(a, b, c, p):
    """Closest point on triangle (abc) to p, as barycentric coords
    (sim.py:329-374) — branchless where-cascade over the 7 Voronoi regions."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)

    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)

    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    def bary(u, v, w):
        return jnp.stack([u, v, w], axis=-1)

    def safe_div(n, d):
        return n / jnp.where(jnp.abs(d) > 1e-12, d, 1.0)

    v_ab = safe_div(d1, d1 - d3)
    w_ac = safe_div(d2, d2 - d6)
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    v_in = vb * denom
    w_in = vc * denom

    out = bary(1.0 - v_in - w_in, v_in, w_in)
    out = jnp.where(
        ((va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0))[..., None],
        bary(jnp.zeros_like(va), w_bc, 1.0 - w_bc),
        out,
    )
    out = jnp.where(
        ((vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0))[..., None],
        bary(1.0 - w_ac, jnp.zeros_like(va), w_ac),
        out,
    )
    out = jnp.where(
        ((d6 >= 0.0) & (d5 <= d6))[..., None],
        bary(jnp.zeros_like(va), jnp.zeros_like(va), jnp.ones_like(va)),
        out,
    )
    out = jnp.where(
        ((vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0))[..., None],
        bary(1.0 - v_ab, v_ab, jnp.zeros_like(va)),
        out,
    )
    out = jnp.where(
        ((d3 >= 0.0) & (d4 <= d3))[..., None],
        bary(jnp.zeros_like(va), jnp.ones_like(va), jnp.zeros_like(va)),
        out,
    )
    out = jnp.where(
        ((d1 <= 0.0) & (d2 <= 0.0))[..., None],
        bary(jnp.ones_like(va), jnp.zeros_like(va), jnp.zeros_like(va)),
        out,
    )
    return out


def eval_triangles_contact(model, x, v):
    """All-pairs particle-vs-triangle penalty contact
    (eval_triangles_contact, sim.py:376-433). O(T*P) like the reference."""
    P = x.shape[0]
    T = model.tri_indices.shape[0]

    i = model.tri_indices[:, 0]  # [T]
    j = model.tri_indices[:, 1]
    k = model.tri_indices[:, 2]

    p = x[i][:, None, :]  # [T, 1, 3]
    q = x[j][:, None, :]
    r = x[k][:, None, :]
    pos = x[None, :, :]   # [1, P, 3]

    bary = triangle_closest_point_barycentric(p, q, r, pos)  # [T, P, 3]
    closest = p * bary[..., 0:1] + q * bary[..., 1:2] + r * bary[..., 2:3]

    diff = pos - closest
    dist = jnp.sum(diff * diff, axis=-1)
    n = safe_normalize(diff)
    c = jnp.minimum(dist - 0.01, 0.0)

    # skip a particle against its own triangle (the reference early-returns)
    pid = jnp.arange(P)[None, :]
    own = (i[:, None] == pid) | (j[:, None] == pid) | (k[:, None] == pid)
    c = jnp.where(own, 0.0, c)

    fn = n * c[..., None] * 1e5  # [T, P, 3]

    f_particle = -jnp.sum(fn, axis=0)  # reduce over triangles
    # per-vertex scatter weighted by barycentric coords
    f_i = jnp.sum(fn * bary[..., 0:1], axis=1)
    f_j = jnp.sum(fn * bary[..., 1:2], axis=1)
    f_k = jnp.sum(fn * bary[..., 2:3], axis=1)

    out = f_particle
    out = out + _scatter(f_i, i, P)
    out = out + _scatter(f_j, j, P)
    out = out + _scatter(f_k, k, P)
    return out


def _hash_cells(cells, num_buckets):
    """FNV-style spatial hash of integer cell coords [..., 3] -> [...]."""
    h = (
        (cells[..., 0] * 73856093)
        ^ (cells[..., 1] * 19349663)
        ^ (cells[..., 2] * 83492791)
    )
    return jnp.mod(h, num_buckets)  # floor-mod: non-negative for B > 0


def eval_triangles_contact_hashed(model, x, v):
    """Spatial-hash broad-phase cloth self-collision.

    Beyond-reference: dflex ships only the O(T*P) all-pairs kernel
    (eval_triangles_contact, sim.py:376-433). This variant bins particles
    into a fixed-capacity hash table and tests each triangle only against
    the 27 cells around its centroid: O(T * 27 * capacity) pair tests.

    TPU-first design — every shape is static so XLA compiles one fused
    program: the table is [buckets, capacity] built with a sort + one
    scatter (bucket overflow past ``capacity`` is dropped; size it with
    headroom), candidates are a [T, 27*capacity] gather with a sentinel
    row, and hash-colliding duplicate cells are masked so no pair is
    counted twice. Exact (matches all-pairs) whenever
    ``tri_collision_cell_size >= 0.1 + max centroid-to-vertex distance``
    and no bucket overflows; enforced by tests/test_particles.py.
    """
    P = x.shape[0]
    T = model.tri_indices.shape[0]
    B = model.tri_collision_buckets
    C = model.tri_collision_capacity
    inv_h = 1.0 / model.tri_collision_cell_size

    i = model.tri_indices[:, 0]
    j = model.tri_indices[:, 1]
    k = model.tri_indices[:, 2]

    # --- build the particle hash table [B, C] (sentinel = P) ---
    cells = jnp.floor(x * inv_h).astype(jnp.int32)           # [P, 3]
    hp = _hash_cells(cells, B)                               # [P]
    order = jnp.argsort(hp)
    hs = hp[order]
    slot = jnp.arange(P) - jnp.searchsorted(hs, hs, side="left")
    table = jnp.full((B, C), P, dtype=jnp.int32)
    table = table.at[hs, slot].set(order.astype(jnp.int32), mode="drop")

    # --- candidates: 27 neighbor cells of each triangle centroid ---
    cen = (x[i] + x[j] + x[k]) / 3.0
    tcell = jnp.floor(cen * inv_h).astype(jnp.int32)         # [T, 3]
    d = jnp.arange(-1, 2)
    offs = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1).reshape(27, 3)
    nh = _hash_cells(tcell[:, None, :] + offs[None], B)      # [T, 27]
    # mask neighbor cells whose hash collides with an earlier neighbor
    eq = nh[:, :, None] == nh[:, None, :]                    # eq[t, a, b]
    earlier = jnp.tril(jnp.ones((27, 27), bool), k=-1)       # b < a
    dup = jnp.any(eq & earlier[None], axis=-1)               # [T, 27]
    cand = jnp.where(dup[..., None], P, table[nh])           # [T, 27, C]
    cand = cand.reshape(T, 27 * C)

    xpad = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)
    pos = xpad[cand]                                         # [T, K, 3]

    # --- same penalty force as the all-pairs kernel on the candidate set ---
    p = x[i][:, None, :]
    q = x[j][:, None, :]
    r = x[k][:, None, :]
    bary = triangle_closest_point_barycentric(p, q, r, pos)
    closest = p * bary[..., 0:1] + q * bary[..., 1:2] + r * bary[..., 2:3]

    diff = pos - closest
    dist = jnp.sum(diff * diff, axis=-1)
    n = safe_normalize(diff)
    c = jnp.minimum(dist - 0.01, 0.0)

    own = (i[:, None] == cand) | (j[:, None] == cand) | (k[:, None] == cand)
    c = jnp.where(own | (cand >= P), 0.0, c)

    fn = n * c[..., None] * 1e5                              # [T, K, 3]

    f_particle = -jax.ops.segment_sum(
        fn.reshape(-1, 3), cand.reshape(-1), num_segments=P + 1
    )[:P]
    f_i = jnp.sum(fn * bary[..., 0:1], axis=1)
    f_j = jnp.sum(fn * bary[..., 1:2], axis=1)
    f_k = jnp.sum(fn * bary[..., 2:3], axis=1)

    out = f_particle
    out = out + _scatter(f_i, i, P)
    out = out + _scatter(f_j, j, P)
    out = out + _scatter(f_k, k, P)
    return out


def eval_triangles_rigid_contacts(
    model, x, v, rigid_x, rigid_r, rigid_v, rigid_w,
    contact_body, contact_point, contact_dist, contact_mat,
):
    """Cloth-vs-rigid-body contact (eval_triangles_rigid_contacts,
    sim.py:436-550): each rigid contact point tests against every triangle;
    penalty normal + damping + box Coulomb friction applied to the triangle
    vertices barycentrically (the reference leaves the rigid-side reaction
    commented out; we match). Rigid bodies in maximal coordinates.

    contact_mat: [K, 4] (ke, kd, kf, mu) per contact point.
    Returns particle force accumulation [P, 3].
    """
    from ..ops import quat_rotate

    P = x.shape[0]
    i = model.tri_indices[:, 0]
    j = model.tri_indices[:, 1]
    k = model.tri_indices[:, 2]

    xb = rigid_x[contact_body]
    rb = rigid_r[contact_body]
    vb = rigid_v[contact_body]
    wb = rigid_w[contact_body]
    ke, kd, kf, mu = (contact_mat[:, c] for c in range(4))

    pos = xb + quat_rotate(rb, contact_point)          # [K, 3]
    arm = pos - xb
    rhat = safe_normalize(arm)
    pos = pos + rhat * contact_dist[:, None]           # add shape thickness
    dpdt = vb + jnp.cross(wb, arm)                     # contact point velocity

    p = x[i][:, None, :]                               # [T, 1, 3]
    q = x[j][:, None, :]
    r = x[k][:, None, :]
    pos_b = pos[None, :, :]                            # [1, K, 3]

    bary = triangle_closest_point_barycentric(p, q, r, pos_b)   # [T, K, 3]
    closest = p * bary[..., 0:1] + q * bary[..., 1:2] + r * bary[..., 2:3]

    diff = pos_b - closest
    dist = jnp.sum(diff * diff, axis=-1)
    n = safe_normalize(diff)                           # points into the body
    c = jnp.minimum(dist - 0.05, 0.0)                  # [T, K]

    fn = c * ke                                        # normal (negative)

    vtri = (
        v[i][:, None, :] * bary[..., 0:1]
        + v[j][:, None, :] * bary[..., 1:2]
        + v[k][:, None, :] * bary[..., 2:3]
    )
    vrel = vtri - dpdt[None, :, :]
    vn = jnp.sum(n * vrel, axis=-1)
    vt = vrel - n * vn[..., None]

    step_c = (c < 0.0).astype(x.dtype)
    fd = -jnp.maximum(vn, 0.0) * kd * step_c

    lower = mu * (fn + fd)
    upper = -lower

    nx = jnp.cross(n, jnp.array([0.0, 0.0, 1.0]))
    nz = jnp.cross(n, jnp.array([1.0, 0.0, 0.0]))
    vx = jnp.clip(jnp.sum(nx * kf[None, :, None] * vt, axis=-1), lower, upper)
    vz = jnp.clip(jnp.sum(nz * kf[None, :, None] * vt, axis=-1), lower, upper)
    ft = (nx * vx[..., None] + nz * vz[..., None]) * (-step_c[..., None])

    f_total = n * (fn + fd)[..., None] + ft            # [T, K, 3]

    f_i = jnp.sum(f_total * bary[..., 0:1], axis=1)
    f_j = jnp.sum(f_total * bary[..., 1:2], axis=1)
    f_k = jnp.sum(f_total * bary[..., 2:3], axis=1)
    return (
        _scatter(f_i, i, P) + _scatter(f_j, j, P) + _scatter(f_k, k, P)
    )


def eval_bending(model, x, v):
    """Discrete-hinge bending (Bridson) (eval_bending, sim.py:553-614)."""
    P = x.shape[0]
    i, j, k, l = (model.edge_indices[:, c] for c in range(4))

    x1, x2, x3, x4 = x[i], x[j], x[k], x[l]
    v1, v2, v3, v4 = v[i], v[j], v[k], v[l]

    n1 = jnp.cross(x3 - x1, x4 - x1)
    n2 = jnp.cross(x4 - x2, x3 - x2)

    n1_len = jnp.sqrt(jnp.maximum(jnp.sum(n1 * n1, axis=-1), 1e-24))
    n2_len = jnp.sqrt(jnp.maximum(jnp.sum(n2 * n2, axis=-1), 1e-24))
    rcp_n1 = 1.0 / n1_len
    rcp_n2 = 1.0 / n2_len

    cos_theta = jnp.sum(n1 * n2, axis=-1) * rcp_n1 * rcp_n2

    n1h = n1 * (rcp_n1 * rcp_n1)[:, None]
    n2h = n2 * (rcp_n2 * rcp_n2)[:, None]

    e = x4 - x3
    e_hat = safe_normalize(e)
    e_len = jnp.sqrt(jnp.maximum(jnp.sum(e * e, axis=-1), 1e-24))

    s = jnp.sign(jnp.sum(jnp.cross(n2, n1) * e_hat, axis=-1))
    # clamp keeps d(acos)/dx finite at flat configurations (NaN defense)
    angle = jnp.arccos(jnp.clip(cos_theta, -1.0 + 1e-6, 1.0 - 1e-6)) * s

    d1 = n1h * e_len[:, None]
    d2 = n2h * e_len[:, None]
    d3 = (
        n1h * jnp.sum((x1 - x4) * e_hat, axis=-1)[:, None]
        + n2h * jnp.sum((x2 - x4) * e_hat, axis=-1)[:, None]
    )
    d4 = (
        n1h * jnp.sum((x3 - x1) * e_hat, axis=-1)[:, None]
        + n2h * jnp.sum((x3 - x2) * e_hat, axis=-1)[:, None]
    )

    f_elastic = model.edge_ke * (angle - model.edge_rest_angle)
    f_damp = model.edge_kd * (
        jnp.sum(d1 * v1, axis=-1)
        + jnp.sum(d2 * v2, axis=-1)
        + jnp.sum(d3 * v3, axis=-1)
        + jnp.sum(d4 * v4, axis=-1)
    )
    f_total = -e_len * (f_elastic + f_damp)

    return (
        _scatter(d1 * f_total[:, None], i, P)
        + _scatter(d2 * f_total[:, None], j, P)
        + _scatter(d3 * f_total[:, None], k, P)
        + _scatter(d4 * f_total[:, None], l, P)
    )


def eval_tetrahedra(model, x, v):
    """Stable neo-Hookean FEM tets (Smith 2018) + damping
    (eval_tetrahedra, sim.py:617-749)."""
    P = x.shape[0]
    i, j, k, l = (model.tet_indices[:, c] for c in range(4))

    x0, x1, x2, x3 = x[i], x[j], x[k], x[l]
    v0, v1, v2, v3 = v[i], v[j], v[k], v[l]

    act = model.tet_activations
    k_mu0 = model.tet_materials[:, 0]
    k_lambda0 = model.tet_materials[:, 1]
    k_damp0 = model.tet_materials[:, 2]

    x10, x20, x30 = x1 - x0, x2 - x0, x3 - x0
    v10, v20, v30 = v1 - v0, v2 - v0, v3 - v0

    Ds = jnp.stack([x10, x20, x30], axis=-1)  # [Q, 3, 3] columns
    Dm = model.tet_poses                       # [Q, 3, 3]

    inv_rest_volume = jnp.linalg.det(Dm) * 6.0
    rest_volume = 1.0 / inv_rest_volume

    alpha = 1.0 + k_mu0 / k_lambda0 - k_mu0 / (4.0 * k_lambda0)

    k_mu = k_mu0 * rest_volume
    k_lambda = k_lambda0 * rest_volume
    k_damp = k_damp0 * rest_volume

    F = Ds @ Dm
    dFdt = jnp.stack([v10, v20, v30], axis=-1) @ Dm

    Ic = jnp.sum(F * F, axis=(-2, -1))

    P_stress = F * (k_mu * (1.0 - 1.0 / (Ic + 1.0)))[:, None, None] + dFdt * k_damp[:, None, None]
    H = P_stress @ jnp.swapaxes(Dm, -1, -2)

    f1 = H[:, :, 0]
    f2 = H[:, :, 1]
    f3 = H[:, :, 2]

    # hydrostatic part
    J = jnp.linalg.det(F)
    s = (inv_rest_volume / 6.0)[:, None]
    dJdx1 = jnp.cross(x20, x30) * s
    dJdx2 = jnp.cross(x30, x10) * s
    dJdx3 = jnp.cross(x10, x20) * s

    f_volume = (J - alpha + act) * k_lambda
    f_damp = (
        jnp.sum(dJdx1 * v1, axis=-1)
        + jnp.sum(dJdx2 * v2, axis=-1)
        + jnp.sum(dJdx3 * v3, axis=-1)
    ) * k_damp
    f_total = (f_volume + f_damp)[:, None]

    f1 = f1 + dJdx1 * f_total
    f2 = f2 + dJdx2 * f_total
    f3 = f3 + dJdx3 * f_total
    f0 = -(f1 + f2 + f3)

    return (
        _scatter(-f0, i, P)
        + _scatter(-f1, j, P)
        + _scatter(-f2, k, P)
        + _scatter(-f3, l, P)
    )


def eval_ground_contacts(model, x, v):
    """Particle-vs-ground penalty contact with box Coulomb friction
    (eval_contacts, sim.py:752-790)."""
    n = _GROUND_N
    c = jnp.minimum(jnp.sum(n * x, axis=-1) - 0.01, 0.0)

    vn = jnp.sum(n * v, axis=-1)
    vt = v - n * vn[:, None]

    fn = n * (c * model.contact_ke)[:, None]
    fd = n * (jnp.minimum(vn, 0.0) * model.contact_kd)[:, None]

    lower = model.contact_mu * c * model.contact_ke  # <= 0
    upper = -lower

    vx = jnp.clip(model.contact_kf * vt[:, 0], lower, upper)
    vz = jnp.clip(model.contact_kf * vt[:, 2], lower, upper)
    ft = jnp.stack([vx, jnp.zeros_like(vx), vz], axis=-1)

    step_c = (c < 0.0).astype(x.dtype)[:, None]  # step() has zero grad
    return -(fn + (fd + ft) * step_c)


# ---------------------------------------------------------------------------
# shape SDFs + particle-vs-rigid soft contacts


def _safe_len(x):
    """|x| with zero (not NaN) gradient at x == 0: all shape SDF branches are
    evaluated for every shape and combined with jnp.where, and sqrt's reverse
    rule at 0 turns the masked-out branch's cotangent into 0 * inf = NaN."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1), 1e-24))


def sphere_sdf(radius, p):
    return _safe_len(p) - radius


def sphere_sdf_grad(radius, p):
    return safe_normalize(p)


def box_sdf(upper, p):
    """(box_sdf, sim.py:819-829); `upper` = half extents."""
    q = jnp.abs(p) - upper
    e = jnp.maximum(q, 0.0)
    return _safe_len(e) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def box_sdf_grad(upper, p):
    q = jnp.abs(p) - upper
    outside = jnp.any(q > 0.0, axis=-1)

    closest = jnp.clip(p, -upper, upper)
    g_out = safe_normalize(p - closest)

    sgn = jnp.sign(p)
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    g_in = jnp.where(
        ((qx > qy) & (qx > qz))[..., None],
        jnp.stack([sgn[..., 0], jnp.zeros_like(qx), jnp.zeros_like(qx)], axis=-1),
        jnp.where(
            ((qy > qx) & (qy > qz))[..., None],
            jnp.stack([jnp.zeros_like(qx), sgn[..., 1], jnp.zeros_like(qx)], axis=-1),
            jnp.stack([jnp.zeros_like(qx), jnp.zeros_like(qx), sgn[..., 2]], axis=-1),
        ),
    )
    return jnp.where(outside[..., None], g_out, g_in)


def mesh_sdf(grid, lower, inv_spacing, p):
    """Trilinear sample of a baked voxel SDF (model.py:bake_mesh_sdf).

    Beyond-reference: dflex's soft-contact kernel only evaluates
    sphere/box/capsule SDFs (sim.py:931-948); mesh shapes there never
    contact. Here a mesh shape's baked [R, R, R] grid is sampled with one
    8-corner gather + lerp per query — batched over shapes x particles, so
    XLA lowers the whole mesh-contact test to a handful of fused gathers.

    grid [R, R, R]; lower/inv_spacing [3]; p [..., 3] in the shape's local
    frame. Queries outside the grid clamp to the (positive, padded) boundary.
    """
    R = grid.shape[0]
    u = jnp.clip((p - lower) * inv_spacing, 0.0, R - 1 - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0.astype(u.dtype)
    i1 = jnp.minimum(i0 + 1, R - 1)

    ix0, iy0, iz0 = i0[..., 0], i0[..., 1], i0[..., 2]
    ix1, iy1, iz1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    c00 = grid[ix0, iy0, iz0] * (1 - fx) + grid[ix1, iy0, iz0] * fx
    c10 = grid[ix0, iy1, iz0] * (1 - fx) + grid[ix1, iy1, iz0] * fx
    c01 = grid[ix0, iy0, iz1] * (1 - fx) + grid[ix1, iy0, iz1] * fx
    c11 = grid[ix0, iy1, iz1] * (1 - fx) + grid[ix1, iy1, iz1] * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def mesh_sdf_grad(grid, lower, inv_spacing, p):
    """Outward normal of a baked voxel SDF: central differences of the
    trilinear field at half-cell offsets, normalized."""
    h = 0.5 / inv_spacing  # [3] half spacing
    ex = jnp.array([1.0, 0.0, 0.0], dtype=p.dtype) * h[0]
    ey = jnp.array([0.0, 1.0, 0.0], dtype=p.dtype) * h[1]
    ez = jnp.array([0.0, 0.0, 1.0], dtype=p.dtype) * h[2]
    gx = mesh_sdf(grid, lower, inv_spacing, p + ex) - mesh_sdf(grid, lower, inv_spacing, p - ex)
    gy = mesh_sdf(grid, lower, inv_spacing, p + ey) - mesh_sdf(grid, lower, inv_spacing, p - ey)
    gz = mesh_sdf(grid, lower, inv_spacing, p + ez) - mesh_sdf(grid, lower, inv_spacing, p - ez)
    return safe_normalize(jnp.stack([gx, gy, gz], axis=-1))


def capsule_sdf(radius, half_width, p):
    """x-aligned capsule (capsule_sdf, sim.py:851-859)."""
    px = jnp.clip(p[..., 0], -half_width, half_width)
    d = p - jnp.stack([px, jnp.zeros_like(px), jnp.zeros_like(px)], axis=-1)
    return _safe_len(d) - radius


def capsule_sdf_grad(radius, half_width, p):
    px = jnp.clip(p[..., 0], -half_width, half_width)
    d = p - jnp.stack([px, jnp.zeros_like(px), jnp.zeros_like(px)], axis=-1)
    return safe_normalize(d)


def eval_soft_contacts(model, x, v, body_X_sc=None, body_v_s=None):
    """Particle vs rigid-shape contacts via shape-local SDFs
    (eval_soft_contacts, sim.py:871-995).

    Returns (particle_f [P,3], body_f [L,6]); body wrenches are about the
    space origin like the reference.
    """
    from ..ops import (
        quat_rotate,
        transform_inverse,
        transform_multiply,
    )

    P = x.shape[0]
    G = model.shape_body.shape[0]
    L = model.link_count

    shape_body = model.shape_body                      # [G]
    has_body = shape_body >= 0
    body_idx = jnp.maximum(shape_body, 0)

    ident = jnp.tile(
        jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=x.dtype), (G, 1)
    )
    if body_X_sc is None:
        X_sc = ident
        v_sc = jnp.zeros((G, 6), dtype=x.dtype)
    else:
        X_sc = jnp.where(has_body[:, None], body_X_sc[body_idx], ident)
        v_sc = jnp.where(has_body[:, None], body_v_s[body_idx], 0.0)

    X_so = jax.vmap(transform_multiply)(X_sc, model.shape_transform)  # [G, 7]
    X_os = jax.vmap(transform_inverse)(X_so)

    # [G, P, 3] particle positions in each shape's local frame
    x_local = jax.vmap(lambda t: transform_point(t, x))(X_os)

    margin = 0.01
    geo = model.shape_geo_type[:, None]
    scale = model.shape_geo_scale  # [G, 3]

    c_sphere = sphere_sdf(scale[:, 0:1], x_local)
    g_sphere = sphere_sdf_grad(scale[:, 0:1], x_local)
    c_box = box_sdf(scale[:, None, :], x_local)
    g_box = box_sdf_grad(scale[:, None, :], x_local)
    c_capsule = capsule_sdf(scale[:, 0:1], scale[:, 1:2], x_local)
    g_capsule = capsule_sdf_grad(scale[:, 0:1], scale[:, 1:2], x_local)

    # GEO_SPHERE=0, GEO_BOX=1, GEO_CAPSULE=2; other types -> no contact
    c_raw = jnp.where(geo == 0, c_sphere, jnp.where(geo == 1, c_box, c_capsule))
    g_raw = jnp.where(
        (geo == 0)[..., None], g_sphere,
        jnp.where((geo == 1)[..., None], g_box, g_capsule),
    )
    active_shape = (geo <= 2)

    # GEO_MESH=3 via baked voxel SDFs (beyond the reference, whose kernel
    # skips mesh shapes — sim.py:931-948); static no-op when no mesh shapes
    if model.sdf_grid is not None and model.shape_sdf_id is not None:
        sid = jnp.maximum(model.shape_sdf_id, 0)           # [G]
        g_grid = model.sdf_grid[sid]                       # [G, R, R, R]
        g_lower = model.sdf_lower[sid]                     # [G, 3]
        g_invsp = 1.0 / model.sdf_spacing[sid]             # [G, 3]
        c_m = jax.vmap(mesh_sdf)(g_grid, g_lower, g_invsp, x_local)
        g_m = jax.vmap(mesh_sdf_grad)(g_grid, g_lower, g_invsp, x_local)
        is_mesh = (geo == 3) & (model.shape_sdf_id >= 0)[:, None]
        c_raw = jnp.where(is_mesh, c_m, c_raw)
        g_raw = jnp.where(is_mesh[..., None], g_m, g_raw)
        active_shape = active_shape | is_mesh

    c = jnp.where(active_shape, jnp.minimum(c_raw - margin, 0.0), 0.0)

    # rotate SDF gradient to world space
    rot = X_so[:, None, 3:7]
    n = quat_rotate(jnp.broadcast_to(rot, (G, P, 4)), g_raw)

    # body velocity at the particle position (world)
    w_b = v_sc[:, None, 0:3]
    v_b = v_sc[:, None, 3:6]
    bv = v_b + jnp.cross(jnp.broadcast_to(w_b, (G, P, 3)), x[None, :, :])

    vrel = v[None, :, :] - bv
    vn = jnp.sum(n * vrel, axis=-1)
    vt = vrel - n * vn[..., None]

    ke, kd, kf, mu = model.contact_ke, model.contact_kd, model.contact_kf, model.contact_mu

    fn = n * (c * ke)[..., None]
    fd = n * (jnp.minimum(vn, 0.0) * kd)[..., None]

    lower = mu * c * ke
    upper = -lower
    vx = jnp.clip(kf * vt[..., 0], lower, upper)
    vz = jnp.clip(kf * vt[..., 2], lower, upper)
    ft = jnp.stack([vx, jnp.zeros_like(vx), vz], axis=-1)

    step_c = (c < 0.0).astype(x.dtype)[..., None]
    f_total = fn + (fd + ft) * step_c  # [G, P, 3]
    t_total = jnp.cross(jnp.broadcast_to(x[None, :, :], f_total.shape), f_total)

    particle_f = -jnp.sum(f_total, axis=0)

    if L:
        wrench = jnp.concatenate([t_total, f_total], axis=-1)  # [G, P, 6]
        per_shape = jnp.sum(wrench, axis=1)                    # [G, 6]
        per_shape = jnp.where(has_body[:, None], per_shape, 0.0)
        body_f = -jax.ops.segment_sum(per_shape, body_idx, num_segments=L)
    else:
        body_f = jnp.zeros((0, 6), dtype=x.dtype)
    return particle_f, body_f


# ---------------------------------------------------------------------------


def particle_forces(model, x, v):
    """Sum all enabled particle force kernels in the reference launch order
    (SemiImplicitIntegrator._simulate, sim.py:2238-2310)."""
    f = jnp.zeros_like(x)
    if model.spring_indices is not None:
        f = f + eval_springs(model, x, v)
    if model.tri_indices is not None and model.tri_ke > 0.0:
        f = f + eval_triangles(model, x, v)
        if model.enable_tri_collisions == "hashed":
            f = f + eval_triangles_contact_hashed(model, x, v)
        elif model.enable_tri_collisions:
            f = f + eval_triangles_contact(model, x, v)
    if model.edge_indices is not None:
        f = f + eval_bending(model, x, v)
    if model.ground:
        f = f + eval_ground_contacts(model, x, v)
    if model.tet_indices is not None:
        f = f + eval_tetrahedra(model, x, v)
    return f


def integrate_particles(x, v, f, inv_mass, gravity, dt):
    """Semi-implicit Euler (integrate_particles, sim.py:70-94). Gravity only
    acts on dynamic particles (step(-w) mask with zero gradient)."""
    dynamic = (inv_mass > 0.0).astype(x.dtype)[:, None]
    v1 = v + (f * inv_mass[:, None] + gravity * dynamic) * dt
    x1 = x + v1 * dt
    return x1, v1


# ---------------------------------------------------------------------------
# XPBD (position-based) solver family (sim.py:2616-2872)


def solve_springs(model, x, v, inv_mass, dt):
    """Spring distance constraint deltas (solve_springs, sim.py:2616-2676).

    With ``model.xpbd_compliance`` the denominator gains the XPBD
    compliance term alpha = 1/(ke dt^2); the reference computes alpha but
    keeps it commented out of the denominator (sim.py:2661-2663), so the
    default (False) reproduces its shipped behavior."""
    P = x.shape[0]
    i = model.spring_indices[:, 0]
    j = model.spring_indices[:, 1]

    xij = x[i] - x[j]
    l = jnp.sqrt(jnp.maximum(jnp.sum(xij * xij, axis=-1), 1e-12))
    dir = xij / l[:, None]
    c = l - model.spring_rest_length

    wi = inv_mass[i]
    wj = inv_mass[j]
    denom = wi + wj
    if model.xpbd_compliance and model.spring_stiffness is not None:
        alpha = 1.0 / jnp.maximum(model.spring_stiffness * dt * dt, 1e-12)
        denom = denom + alpha
    multiplier = c / jnp.where(denom > 0.0, denom, 1.0)
    xd = dir * multiplier[:, None]

    return _scatter(-xd * wi[:, None], i, P) + _scatter(xd * wj[:, None], j, P)


def solve_tetrahedra(model, x, v, inv_mass, dt, relaxation=1.0):
    """XPBD tet constraints: C_sqrt deviatoric + volume (solve_tetrahedra,
    sim.py:2680-2780)."""
    P = x.shape[0]
    i, j, k, l = (model.tet_indices[:, c] for c in range(4))

    x0, x1, x2, x3 = x[i], x[j], x[k], x[l]
    w0, w1, w2, w3 = inv_mass[i], inv_mass[j], inv_mass[k], inv_mass[l]

    k_mu = model.tet_materials[:, 0]
    k_lambda = model.tet_materials[:, 1]

    x10, x20, x30 = x1 - x0, x2 - x0, x3 - x0
    Ds = jnp.stack([x10, x20, x30], axis=-1)
    Dm = model.tet_poses

    inv_rest_volume = jnp.linalg.det(Dm) * 6.0
    rest_volume = 1.0 / inv_rest_volume

    F = Ds @ Dm

    tr = jnp.sum(F * F, axis=(-2, -1))
    r_s_abs = jnp.sqrt(jnp.maximum(jnp.abs(tr - 3.0), 1e-12))
    C = r_s_abs
    r_s = jnp.where(tr < 3.0, -r_s_abs, r_s_abs)

    dCdx = F @ jnp.swapaxes(Dm, -1, -2) / r_s[:, None, None]

    grad1 = dCdx[:, :, 0]
    grad2 = dCdx[:, :, 1]
    grad3 = dCdx[:, :, 2]
    grad0 = -(grad1 + grad2 + grad3)

    denom = (
        jnp.sum(grad0 * grad0, axis=-1) * w0
        + jnp.sum(grad1 * grad1, axis=-1) * w1
        + jnp.sum(grad2 * grad2, axis=-1) * w2
        + jnp.sum(grad3 * grad3, axis=-1) * w3
    )
    multiplier = C / (denom + 1.0 / (k_mu * dt * dt * rest_volume))
    # degenerate r_s == 0: the reference early-returns
    multiplier = jnp.where(r_s_abs > 1e-6, multiplier, 0.0)

    d0 = grad0 * multiplier[:, None]
    d1 = grad1 * multiplier[:, None]
    d2 = grad2 * multiplier[:, None]
    d3 = grad3 * multiplier[:, None]

    # volume (hydrostatic) constraint
    alpha = 1.0 + k_mu / k_lambda
    J = jnp.linalg.det(F)
    C_vol = J - alpha

    s = (inv_rest_volume / 6.0)[:, None]
    g1 = jnp.cross(x20, x30) * s
    g2 = jnp.cross(x30, x10) * s
    g3 = jnp.cross(x10, x20) * s
    g0 = -(g1 + g2 + g3)

    denom_v = (
        jnp.sum(g0 * g0, axis=-1) * w0
        + jnp.sum(g1 * g1, axis=-1) * w1
        + jnp.sum(g2 * g2, axis=-1) * w2
        + jnp.sum(g3 * g3, axis=-1) * w3
    )
    mult_v = (C_vol / (denom_v + 1.0 / (k_lambda * dt * dt * rest_volume)))[:, None]

    d0 = d0 + g0 * mult_v
    d1 = d1 + g1 * mult_v
    d2 = d2 + g2 * mult_v
    d3 = d3 + g3 * mult_v

    return (
        _scatter(-d0 * (w0[:, None] * relaxation), i, P)
        + _scatter(-d1 * (w1[:, None] * relaxation), j, P)
        + _scatter(-d2 * (w2[:, None] * relaxation), k, P)
        + _scatter(-d3 * (w3[:, None] * relaxation), l, P)
    )


def solve_ground_contacts(model, x, v, inv_mass, dt):
    """Ground position constraint + friction (solve_contacts,
    sim.py:2784-2820)."""
    n = _GROUND_N
    c = jnp.sum(n * x, axis=-1) - 0.01
    inside = c <= 0.0

    delta_n = n * c[:, None]

    vn = jnp.sum(n * v, axis=-1)
    vt = v - n * vn[:, None]
    vt_len = jnp.sqrt(jnp.maximum(jnp.sum(vt * vt, axis=-1), 1e-12))

    lambda_f = jnp.maximum(model.contact_mu * c, -vt_len * dt)
    delta_f = (vt / vt_len[:, None]) * lambda_f[:, None]

    delta = delta_f - delta_n
    return jnp.where(inside[:, None], delta, 0.0)


def apply_deltas(x_orig, x_pred, delta, dt):
    """(apply_deltas, sim.py:2824-2845)."""
    x_new = x_pred + delta
    v_new = (x_new - x_orig) / dt
    return x_new, v_new


def xpbd_substep(model, x, v, dt, relaxation=1.0):
    """One XPBD substep: predict -> solve constraints -> apply
    (XPBDIntegrator._simulate, sim.py:2935-3000)."""
    x_pred, v_pred = integrate_particles(
        x, v, jnp.zeros_like(x), model.particle_inv_mass, model.gravity, dt
    )

    delta = jnp.zeros_like(x)
    if model.ground:
        delta = delta + solve_ground_contacts(
            model, x_pred, v_pred, model.particle_inv_mass, dt
        )
    if model.spring_indices is not None:
        delta = delta + solve_springs(model, x_pred, v_pred, model.particle_inv_mass, dt)
    if model.tet_indices is not None:
        delta = delta + solve_tetrahedra(
            model, x_pred, v_pred, model.particle_inv_mass, dt, relaxation
        )

    return apply_deltas(x, x_pred, delta, dt)
