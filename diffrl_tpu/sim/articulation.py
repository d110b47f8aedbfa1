"""Articulated rigid-body dynamics: one differentiable step, TPU-first.

Re-designs the reference pipeline (/root/reference/dflex/dflex/sim.py:2225-2613:
eval_rigid_fk -> eval_rigid_id -> eval_rigid_contacts_art -> eval_muscles ->
eval_rigid_tau -> J/M/H -> regularized Cholesky -> solve -> integrate) as pure
functions over a SINGLE articulation with STATIC topology:

- per-link loops are unrolled at trace time (topology is static), replacing
  the reference's serial per-articulation device loops (sim.py:1694-1711);
- environments come in via ``jax.vmap`` — every op below becomes a batched
  [E, ...] op, turning the Jacobian/mass products into MXU-shaped batched
  matmuls instead of one CUDA thread per robot;
- the tape is gone: ``jax.grad`` differentiates the whole step; the only
  deliberate deviations from true gradients reproduce the reference's adjoint
  conventions (frozen-Cholesky solve via ``solve_frozen_chol``, zero-grad
  ``step``, branch-picking ``min``/``clamp`` — which jnp already matches).

Gradient-sensitive guards (safe_normalize etc.) mirror the reference's
kEps-guarded primitives so long rollouts don't NaN (SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import (
    chol_inverse,
    chol_regularized,
    quat_from_axis_angle,
    quat_identity,
    quat_mul,
    quat_normalize,
    safe_normalize,
    solve_frozen_chol,
    solve_frozen_inv,
    spatial_cross,
    spatial_cross_dual,
    spatial_inertia_matvec,
    spatial_transform_inertia,
    spatial_transform_twist,
    spatial_transform_wrench,
    transform_identity,
    transform_multiply,
    transform_point,
)
from .model import (
    JOINT_BALL,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    Model,
    State,
)

_E6 = np.eye(6, dtype=np.float32)


def _jcalc_transform(jtype: int, axis, joint_q, qs: int):
    """Joint transform X_jc for a static joint type (sim.py:1269-1319)."""
    if jtype == JOINT_PRISMATIC:
        q = joint_q[qs]
        return jnp.concatenate([axis * q, quat_identity()])
    if jtype == JOINT_REVOLUTE:
        q = joint_q[qs]
        return jnp.concatenate([jnp.zeros(3), quat_from_axis_angle(axis, q)])
    if jtype == JOINT_BALL:
        return jnp.concatenate([jnp.zeros(3), joint_q[qs : qs + 4]])
    if jtype == JOINT_FIXED:
        return transform_identity()
    if jtype == JOINT_FREE:
        return joint_q[qs : qs + 7]
    raise ValueError(jtype)


def eval_fk(model: Model, joint_q):
    """Forward kinematics: body transforms X_sc, X_sm (sim.py:1638-1711).

    Unrolled over links in topological order; returns ([L,7], [L,7]).
    """
    topo = model.topology
    X_sc, X_sm = [], []
    for i in range(topo.link_count):
        jtype = topo.joint_type[i]
        parent = topo.joint_parent[i]
        qs = topo.joint_q_start[i]
        X_jc = _jcalc_transform(jtype, model.joint_axis[i], joint_q, qs)
        X_local = transform_multiply(model.joint_X_pj[i], X_jc)
        X_sp = X_sc[parent] if parent >= 0 else transform_identity()
        x_sc = transform_multiply(X_sp, X_local)
        X_sc.append(x_sc)
        X_sm.append(transform_multiply(x_sc, model.joint_X_cm[i]))
    return jnp.stack(X_sc), jnp.stack(X_sm)


def _motion_subspace(jtype: int, axis, X_sj):
    """Joint motion subspace columns in space coords (sim.py:1323-1387).

    Returns a list of [6] spatial vectors, one per dof.
    """
    zeros = jnp.zeros(3)
    if jtype == JOINT_PRISMATIC:
        return [spatial_transform_twist(X_sj, jnp.concatenate([zeros, axis]))]
    if jtype == JOINT_REVOLUTE:
        return [spatial_transform_twist(X_sj, jnp.concatenate([axis, zeros]))]
    if jtype == JOINT_BALL:
        return [
            spatial_transform_twist(X_sj, jnp.asarray(_E6[k])) for k in range(3)
        ]
    if jtype == JOINT_FIXED:
        return []
    if jtype == JOINT_FREE:
        # world-aligned basis (sim.py:1377-1382)
        return [jnp.asarray(_E6[k]) for k in range(6)]
    raise ValueError(jtype)


def eval_id(model: Model, joint_q, joint_qd, body_X_sc, body_X_sm):
    """Velocity/bias-force sweep (compute_link_velocity, sim.py:1716-1789).

    Returns (S_s [D,6], v_s [L,6], body_f [L,6]); body_f is the reference's
    body_f_s = I a + v x* I v - gravity wrench. The spatial inertia is
    applied in factored form (spatial_inertia_matvec) — materializing the
    per-link [E, 6, 6] tensors under vmap padded to [E, 8, 128] tiles and
    dominated the substep's HBM traffic; I_s is only materialized at
    mass-matrix refresh (eval_spatial_inertias).
    """
    topo = model.topology
    g = model.gravity

    S_rows = [None] * topo.dof_count
    v_list, a_list, f_list = [], [], []

    for i in range(topo.link_count):
        jtype = topo.joint_type[i]
        parent = topo.joint_parent[i]
        ds = topo.joint_qd_start[i]

        X_sp = body_X_sc[parent] if parent >= 0 else transform_identity()
        X_sj = transform_multiply(X_sp, model.joint_X_pj[i])

        S = _motion_subspace(jtype, model.joint_axis[i], X_sj)
        v_j = jnp.zeros(6)
        for k, s in enumerate(S):
            S_rows[ds + k] = s
            v_j = v_j + s * joint_qd[ds + k]

        v_parent = v_list[parent] if parent >= 0 else jnp.zeros(6)
        a_parent = a_list[parent] if parent >= 0 else jnp.zeros(6)

        v_s = v_parent + v_j
        a_s = a_parent + spatial_cross(v_s, v_j)

        I_m = model.body_I_m[i]
        m = I_m[3, 3]

        # gravity wrench about the space origin (sim.py:1770-1775)
        p_com = body_X_sm[i][0:3]
        f_g_m = jnp.concatenate([jnp.zeros(3), g]) * m
        X_com = jnp.concatenate([p_com, quat_identity()])
        f_g_s = spatial_transform_wrench(X_com, f_g_m)

        Ia = spatial_inertia_matvec(body_X_sm[i], I_m, a_s)
        Iv = spatial_inertia_matvec(body_X_sm[i], I_m, v_s)
        f_b = Ia + spatial_cross_dual(v_s, Iv)

        v_list.append(v_s)
        a_list.append(a_s)
        f_list.append(f_b - f_g_s)

    S_s = (
        jnp.stack(S_rows) if topo.dof_count else jnp.zeros((0, 6))
    )
    return S_s, jnp.stack(v_list), jnp.stack(f_list)


def eval_spatial_inertias(model: Model, body_X_sm):
    """Materialized space-frame spatial inertias I_s [L, 6, 6]
    (spatial_transform_inertia per link) — only needed when the mass matrix
    is refreshed."""
    return jnp.stack(
        [
            spatial_transform_inertia(body_X_sm[i], model.body_I_m[i])
            for i in range(model.topology.link_count)
        ]
    )


def eval_ground_contacts(model: Model, body_X_sc, body_v_s,
                         static_accum: bool = False):
    """Articulated-body ground contacts (eval_rigid_contacts_art,
    sim.py:1137-1206): penalty normal + damping + smooth Coulomb friction.

    Returns per-link wrench accumulation [L, 6].

    static_accum: resolve the contact->link gather/scatter at trace time
    (slice + add instead of gather + segment_sum) — required inside Pallas
    kernels (Mosaic has no scatter) and numerically identical.
    """
    topo = model.topology
    K = topo.contact_count
    L = topo.link_count
    if K == 0 or not model.ground:
        return jnp.zeros((L, 6))

    c_body = np.asarray(topo.contact_body, dtype=np.int32)
    if static_accum:
        X_s = jnp.stack([body_X_sc[int(b)] for b in c_body])
        v_s = jnp.stack([body_v_s[int(b)] for b in c_body])
    else:
        X_s = body_X_sc[c_body]      # [K, 7]
        v_s = body_v_s[c_body]       # [K, 6]

    n = jnp.array([0.0, 1.0, 0.0])
    ke, kd, kf, mu = (model.contact_mat[:, i] for i in range(4))

    p = transform_point(X_s, model.contact_point) - n * model.contact_dist[:, None]
    w = v_s[:, 0:3]
    v = v_s[:, 3:6]
    dpdt = v + jnp.cross(w, p)

    c = p[:, 1]                      # penetration depth (negative inside)

    vn = jnp.sum(n * dpdt, axis=-1)
    vt = dpdt - n * vn[:, None]

    fn = c * ke
    # damping active only while penetrating: step(c) = 1 for c < 0
    fd = jnp.minimum(vn, 0.0) * kd * (-c)

    # smooth Coulomb friction ft = normalize(vt) * min(kf |vt|, -mu c ke)
    vt_len2 = jnp.sum(vt * vt, axis=-1)
    safe = vt_len2 > 1e-12
    vt_len = jnp.sqrt(jnp.where(safe, vt_len2, 1.0))
    # compare AFTER the [:, None] reshape: reshaping a materialized i1
    # (bool) vector is an unsupported shape cast in Mosaic, while a float
    # reshape + broadcasted compare lowers fine (tools/pallas_aot_check.py)
    dir = jnp.where(vt_len2[:, None] > 1e-12, vt / vt_len[:, None], 0.0)
    mag = jnp.minimum(kf * jnp.where(safe, vt_len, 0.0), -mu * c * ke)
    ft = dir * mag[:, None]

    f_total = n * (fn + fd)[:, None] + ft
    # early-return for c >= 0 clips primal and adjoint (sim.py:1179-1180);
    # float-reshape-then-compare, not bool-reshape (Mosaic i1 cast limit)
    f_total = jnp.where(c[:, None] < 0.0, f_total, 0.0)
    t_total = jnp.cross(p, f_total)

    wrench = jnp.concatenate([t_total, f_total], axis=-1)  # [K, 6]
    if static_accum:
        out = [jnp.zeros(6)] * L
        for k, b in enumerate(c_body):
            out[int(b)] = out[int(b)] + wrench[k]
        return jnp.stack(out)
    return jax.ops.segment_sum(wrench, c_body, num_segments=L)


def eval_muscles(model: Model, body_X_sc, muscle_activation,
                 static_accum: bool = False):
    """MTU muscle wrenches (eval_muscles, sim.py:1209-1265).

    muscle_activation: [M] per-muscle force magnitude (the reference stores
    activation * muscle_strength into model.muscle_activation; here it is an
    explicit control input). static_accum: see eval_ground_contacts.
    """
    topo = model.topology
    L = topo.link_count
    M = topo.muscle_count
    if M == 0:
        return jnp.zeros((L, 6))

    # static segment list: waypoint pairs (i, i+1) within each muscle,
    # excluding the last waypoint (sim.py:1259-1264) and degenerate segments
    seg_i, seg_m = [], []
    ms = topo.muscle_start
    links = topo.muscle_links
    for m in range(M):
        for i in range(ms[m], ms[m + 1] - 1):
            if links[i] == links[i + 1]:
                continue  # static skip (sim.py:1222-1223)
            seg_i.append(i)
            seg_m.append(m)
    if not seg_i:
        return jnp.zeros((L, 6))

    seg_i = np.asarray(seg_i, dtype=np.int32)
    seg_m = np.asarray(seg_m, dtype=np.int32)
    link0 = np.asarray([links[i] for i in seg_i], dtype=np.int32)
    link1 = np.asarray([links[i + 1] for i in seg_i], dtype=np.int32)

    if static_accum:
        X0 = jnp.stack([body_X_sc[int(b)] for b in link0])
        X1 = jnp.stack([body_X_sc[int(b)] for b in link1])
        act = jnp.stack([muscle_activation[int(m)] for m in seg_m])
        r0 = jnp.stack([model.muscle_points[int(i)] for i in seg_i])
        r1 = jnp.stack([model.muscle_points[int(i) + 1] for i in seg_i])
    else:
        X0 = body_X_sc[link0]
        X1 = body_X_sc[link1]
        act = muscle_activation[seg_m]
        r0 = model.muscle_points[seg_i]
        r1 = model.muscle_points[seg_i + 1]

    pos0 = transform_point(X0, r0)
    pos1 = transform_point(X1, r1)
    n = safe_normalize(pos1 - pos0)
    f = n * act[:, None]

    w0 = jnp.concatenate([jnp.cross(pos0, f), f], axis=-1)
    w1 = jnp.concatenate([jnp.cross(pos1, f), f], axis=-1)

    if static_accum:
        out = [jnp.zeros(6)] * L
        for k in range(len(seg_i)):
            b0, b1 = int(link0[k]), int(link1[k])
            out[b0] = out[b0] - w0[k]
            out[b1] = out[b1] + w1[k]
        return jnp.stack(out)
    out = jax.ops.segment_sum(-w0, link0, num_segments=L)
    out = out + jax.ops.segment_sum(w1, link1, num_segments=L)
    return out


def eval_tau(model: Model, joint_q, joint_qd, joint_act, S_s, body_f):
    """Leaf-to-root force accumulation + joint-space torques
    (eval_rigid_tau / compute_link_tau / jcalc_tau, sim.py:1421-1502,
    1792-1842). Returns tau [D]."""
    topo = model.topology
    L = topo.link_count

    ft = [jnp.zeros(6)] * L
    tau = [jnp.zeros(()) for _ in range(topo.dof_count)]

    for i in reversed(range(L)):
        jtype = topo.joint_type[i]
        parent = topo.joint_parent[i]
        cs = topo.joint_q_start[i]
        ds = topo.joint_qd_start[i]

        f_s = body_f[i] + ft[i]

        t_ke = model.joint_target_ke[i]
        t_kd = model.joint_target_kd[i]
        l_ke = model.joint_limit_ke[i]
        l_kd = model.joint_limit_kd[i]

        if jtype in (JOINT_PRISMATIC, JOINT_REVOLUTE):
            q = joint_q[cs]
            qd = joint_qd[ds]
            act = joint_act[ds]
            target = model.joint_target[cs]
            lower = model.joint_limit_lower[cs]
            upper = model.joint_limit_upper[cs]

            limit_f = jnp.where(
                q < lower,
                l_ke * (lower - q),
                jnp.where(q > upper, l_ke * (upper - q), 0.0),
            )
            damping_f = -l_kd * qd
            tau[ds] = (
                -jnp.sum(S_s[ds] * f_s)
                - t_ke * (q - target)
                - t_kd * qd
                + act
                + limit_f
                + damping_f
            )
        elif jtype == JOINT_BALL:
            # elastic term on quat imaginary part, damping on ang vel
            for k in range(3):
                tau[ds + k] = (
                    -jnp.sum(S_s[ds + k] * f_s)
                    - joint_qd[ds + k] * t_kd
                    - joint_q[cs + k] * t_ke
                )
        elif jtype == JOINT_FREE:
            for k in range(6):
                tau[ds + k] = -jnp.sum(S_s[ds + k] * f_s)
        # fixed: no dofs

        if parent >= 0:
            ft[parent] = ft[parent] + f_s

    return jnp.stack(tau) if tau else jnp.zeros((0,))


def eval_mass_matrix(model: Model, S_s, I_s):
    """Composite-rigid-body mass matrix H = J^T blockdiag(I_s) J.

    The reference materializes J (spatial_jacobian, spatial.h:691-738), the
    block-diagonal M (spatial_mass, spatial.h:801-840) and two batched GEMMs
    (sim.py:2513-2545). Here the Jacobian structure is a static ancestor mask
    and the whole thing is three einsums that XLA maps onto the MXU.
    """
    mask = jnp.asarray(model.topology.ancestor_dof_mask())  # [L, D] static
    # J[l, :, d] = S_s[d] * mask[l, d]
    J = jnp.einsum("df,ld->lfd", S_s, mask)
    P = jnp.einsum("lfg,lgd->lfd", I_s, J)
    H = jnp.einsum("lfd,lfe->de", J, P)
    return H


def eval_mass_matrix_factored(model: Model, S_s, body_X_sm):
    """H = J^T blockdiag(I_s) J without materializing I_s or J.

    Identical values to ``eval_mass_matrix(model, S_s, eval_spatial_inertias
    (model, body_X_sm))`` (up to float reassociation): with T = Ad(X_sm^-1),
    H[d,e] = (T S_d)^T I_m (T S_e) summed over links where both dofs are
    ancestors. The materialized path builds [E, L, 6, 6] / [E, L, 6, D]
    tensors under vmap that TPU tiling pads to (8, 128) lanes — profiled as
    the dominant cost of the mass-matrix refresh. Here every intermediate is
    an [E]-leading vector with trailing dim <= 6 and the ancestor sparsity is
    applied at trace time (no masking ops, no zero-column work).
    """
    from ..ops import transform_inverse

    topo = model.topology
    mask = np.asarray(topo.ancestor_dof_mask())
    D = topo.dof_count
    Hs = [[None] * D for _ in range(D)]
    for l in range(topo.link_count):
        dofs = [d for d in range(D) if mask[l, d]]
        if not dofs:
            continue
        t_inv = transform_inverse(body_X_sm[l])
        I3 = model.body_I_m[l][0:3, 0:3]
        m = model.body_I_m[l][3, 3]
        us = [spatial_transform_twist(t_inv, S_s[d]) for d in dofs]
        vs = [
            jnp.concatenate(
                [jnp.einsum("ij,j->i", I3, u[0:3]), m * u[3:6]]
            )
            for u in us
        ]
        for a, d in enumerate(dofs):
            for b in range(a, len(dofs)):
                e = dofs[b]
                val = jnp.sum(us[a] * vs[b])
                Hs[d][e] = val if Hs[d][e] is None else Hs[d][e] + val
    zero = jnp.zeros(())
    rows = []
    for i in range(D):
        row = [
            Hs[min(i, j)][max(i, j)]
            if Hs[min(i, j)][max(i, j)] is not None
            else zero
            for j in range(D)
        ]
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _rot_scalars(q):
    """3x3 rotation entries from quaternion xyzw as a nested list of
    scalars (no [.., 3, 3] materialization — under vmap that pads to
    (8, 128) tiles)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [
        [1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)],
        [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)],
        [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)],
    ]


def eval_mass_matrix_crba(model: Model, S_s, body_X_sm):
    """Composite-rigid-body H via subtree inertia accumulation.

    Same values as :func:`eval_mass_matrix_factored` (H[d,e] =
    S_d^T (sum_{l in subtree} I_l) S_e) with O(L + D*depth) dot products
    instead of O(sum_l n_l^2): each link's space-frame inertia is built
    once as 36 [E]-shaped scalars (T^T I_m T with T = Ad(t^-1); the
    R^T R = 1 identity collapses the lower-right block to m*delta),
    composite inertias accumulate leaf->root, and each dof's force vector
    F_d = I^c S_d dots only against its ancestor dofs. Every intermediate
    stays scalar — no tile-padded [E, 6, 6] tensors.

    NOT the default: despite fewer dot products, full scalarization traces
    MORE jaxpr equations than the vector-op factored form (Ant 14.1k vs
    10.2k; Humanoid 35.0k vs 30.3k incl. shared FK/ID), so it does not
    help compile time. Kept as a tested alternative formulation.
    """
    from ..ops import transform_inverse

    topo = model.topology
    mask = np.asarray(topo.ancestor_dof_mask())
    L = topo.link_count
    D = topo.dof_count

    # per-link space-frame inertia as 6x6 nested scalar lists
    I_links = []
    for l in range(L):
        t_inv = transform_inverse(body_X_sm[l])
        q = t_inv[3:7]
        p = t_inv[0:3]
        R = _rot_scalars(q)
        px, py, pz = p[0], p[1], p[2]
        skew_p = [[0.0, -pz, py], [pz, 0.0, -px], [-py, px, 0.0]]
        # S = skew(p) @ R
        S3 = [
            [sum(skew_p[i][k] * R[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]
        I3 = model.body_I_m[l][0:3, 0:3]
        m = model.body_I_m[l][3, 3]
        # A = R^T I3 R
        I3R = [
            [sum(I3[i, k] * R[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]
        A = [
            [sum(R[k][i] * I3R[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]
        # UL = A + m S^T S ; UR = m S^T R ; LR = m I
        UL = [
            [
                A[i][j] + m * sum(S3[k][i] * S3[k][j] for k in range(3))
                for j in range(3)
            ]
            for i in range(3)
        ]
        UR = [
            [m * sum(S3[k][i] * R[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]
        I6 = [[None] * 6 for _ in range(6)]
        for i in range(3):
            for j in range(3):
                I6[i][j] = UL[i][j]
                I6[i][3 + j] = UR[i][j]
                I6[3 + i][j] = UR[j][i]
                I6[3 + i][3 + j] = m if i == j else 0.0
        I_links.append(I6)

    # composite: leaf -> root accumulation
    Ic = [[[e for e in row] for row in I_links[l]] for l in range(L)]
    for l in reversed(range(L)):
        parent = topo.joint_parent[l]
        if parent >= 0:
            for i in range(6):
                for j in range(6):
                    Ic[parent][i][j] = Ic[parent][i][j] + Ic[l][i][j]

    # dof -> owning link (the link whose joint carries the dof)
    dof_link = [-1] * D
    for l in range(L):
        ds, de = topo.joint_qd_start[l], (
            topo.joint_qd_start[l + 1] if l + 1 < L else D
        )
        for d in range(ds, de):
            dof_link[d] = l

    zero = jnp.zeros(())
    Hs = [[zero] * D for _ in range(D)]
    for d in range(D):
        li = dof_link[d]
        if li < 0:
            continue
        Sd = S_s[d]
        F = [
            sum(Ic[li][i][j] * Sd[j] for j in range(6) if not _is_zero(Ic[li][i][j]))
            for i in range(6)
        ]
        for e in range(D):
            if e > d or not mask[li, e]:
                continue
            Se = S_s[e]
            val = sum(F[i] * Se[i] for i in range(6))
            Hs[min(d, e)][max(d, e)] = val

    rows = [
        jnp.stack([Hs[min(i, j)][max(i, j)] for j in range(D)])
        for i in range(D)
    ]
    return jnp.stack(rows)


def _is_zero(x) -> bool:
    return isinstance(x, (int, float)) and x == 0.0


def _factorize_mass_matrix(model: Model, S_s, body_X_sm):
    """H plus its frozen explicit inverse (H + armature regularization).

    The reference factorizes (H + diag(armature)) with a Cholesky whose
    backward is a nop (matnn.h chol adjoint) and reuses L across substeps.
    On TPU the batched Cholesky/triangular-solve custom calls dominate the
    step (profiled ~15% for one factorization per 16 substeps), so we
    materialize the small inverse once per refresh with an unrolled
    factorization; each substep's solve is then one MXU matvec. Gradients
    follow the same frozen-factor convention (solve_frozen_inv).
    """
    H = eval_mass_matrix_factored(model, S_s, body_X_sm)
    A = lax.stop_gradient(H) + jnp.diag(model.joint_armature)
    return H, chol_inverse(A)


def _integrate_joint(model: Model, joint_q, joint_qd, qdd, dt):
    """Semi-implicit joint integration (jcalc_integrate, sim.py:1505-1636)."""
    topo = model.topology
    q_new = [None] * topo.coord_count
    qd_new = [None] * topo.dof_count

    for i in range(topo.link_count):
        jtype = topo.joint_type[i]
        cs = topo.joint_q_start[i]
        ds = topo.joint_qd_start[i]

        if jtype in (JOINT_PRISMATIC, JOINT_REVOLUTE):
            qd_n = joint_qd[ds] + qdd[ds] * dt
            q_new[cs] = joint_q[cs] + qd_n * dt
            qd_new[ds] = qd_n
        elif jtype == JOINT_BALL:
            m_j = qdd[ds : ds + 3]
            w_j = joint_qd[ds : ds + 3]
            r_j = joint_q[cs : cs + 4]
            w_n = w_j + m_j * dt
            drdt = quat_mul(jnp.concatenate([w_n, jnp.zeros(1)]), r_j) * 0.5
            r_n = quat_normalize(r_j + drdt * dt)
            for k in range(4):
                q_new[cs + k] = r_n[k]
            for k in range(3):
                qd_new[ds + k] = w_n[k]
        elif jtype == JOINT_FREE:
            m_s = qdd[ds : ds + 3]
            a_s = qdd[ds + 3 : ds + 6]
            w_s = joint_qd[ds : ds + 3] + m_s * dt
            v_s = joint_qd[ds + 3 : ds + 6] + a_s * dt

            p_s = joint_q[cs : cs + 3]
            dpdt = v_s + jnp.cross(w_s, p_s)
            r_s = joint_q[cs + 3 : cs + 7]
            drdt = quat_mul(jnp.concatenate([w_s, jnp.zeros(1)]), r_s) * 0.5

            p_n = p_s + dpdt * dt
            r_n = quat_normalize(r_s + drdt * dt)
            for k in range(3):
                q_new[cs + k] = p_n[k]
            for k in range(4):
                q_new[cs + 3 + k] = r_n[k]
            for k in range(3):
                qd_new[ds + k] = w_s[k]
                qd_new[ds + 3 + k] = v_s[k]
        # fixed: nothing

    q_out = jnp.stack(q_new) if q_new else jnp.zeros((0,))
    qd_out = jnp.stack(qd_new) if qd_new else jnp.zeros((0,))
    return q_out, qd_out


class DynamicsAux(NamedTuple):
    """Derived quantities exposed for observation/rendering/testing."""

    body_X_sc: jnp.ndarray
    body_X_sm: jnp.ndarray
    body_v_s: jnp.ndarray
    joint_tau: jnp.ndarray
    joint_qdd: jnp.ndarray


def articulation_substep(
    model: Model,
    joint_q,
    joint_qd,
    joint_act,
    muscle_act,
    dt,
    mass_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    return_aux: bool = False,
    body_f_ext=None,
    static_accum: bool = False,
):
    """One dynamics substep of a single articulation.

    mass_cache: (H, L) to reuse a previously-factorized mass matrix
    (MM_caching_frequency semantics, sim.py:2107-2113); None recomputes.
    body_f_ext: optional external per-link wrenches [L, 6] (e.g. particle
    soft-contact coupling, sim.py:2400-2422).
    static_accum: trace-time gather/scatter (Pallas-kernel-safe; see
    eval_ground_contacts).
    Returns (joint_q', joint_qd', (H, L)[, aux]).
    """
    body_X_sc, body_X_sm = eval_fk(model, joint_q)
    S_s, body_v_s, body_f = eval_id(model, joint_q, joint_qd, body_X_sc, body_X_sm)

    body_f = body_f + eval_ground_contacts(model, body_X_sc, body_v_s,
                                           static_accum=static_accum)
    if muscle_act is not None:
        body_f = body_f + eval_muscles(model, body_X_sc, muscle_act,
                                       static_accum=static_accum)
    if body_f_ext is not None:
        body_f = body_f + body_f_ext

    tau = eval_tau(model, joint_q, joint_qd, joint_act, S_s, body_f)

    if mass_cache is None:
        H, Hinv = _factorize_mass_matrix(model, S_s, body_X_sm)
    else:
        H, Hinv = mass_cache

    qdd = solve_frozen_inv(H, Hinv, tau)
    q_new, qd_new = _integrate_joint(model, joint_q, joint_qd, qdd, dt)

    if return_aux:
        aux = DynamicsAux(body_X_sc, body_X_sm, body_v_s, tau, qdd)
        return q_new, qd_new, (H, Hinv), aux
    return q_new, qd_new, (H, Hinv)


def coupled_substep(model: Model, state: State, joint_act, muscle_act, dt,
                    mass_cache=None):
    """One semi-implicit substep over BOTH families (articulation + particles)
    with particle<->rigid soft-contact coupling
    (SemiImplicitIntegrator._simulate pipeline, sim.py:2225-2613).

    Deviation from the reference: soft contacts see the CURRENT substep's
    body transforms (the reference feeds the previous substep's cached
    state_in.body_X_sc, a staleness artifact of its state double-buffering).
    Returns (State', (H, L) | None).
    """
    from . import particles as part

    has_particles = state.particle_q is not None
    has_links = model.link_count > 0
    couple = has_particles and model.shape_body is not None

    particle_f = None
    if has_particles:
        particle_f = part.particle_forces(model, state.particle_q, state.particle_qd)

    if has_links:
        body_X_sc, body_X_sm = eval_fk(model, state.joint_q)
        S_s, body_v_s, body_f = eval_id(
            model, state.joint_q, state.joint_qd, body_X_sc, body_X_sm
        )
        body_f = body_f + eval_ground_contacts(model, body_X_sc, body_v_s)
        if muscle_act is not None:
            body_f = body_f + eval_muscles(model, body_X_sc, muscle_act)
        if couple:
            pf, bf = part.eval_soft_contacts(
                model, state.particle_q, state.particle_qd, body_X_sc, body_v_s
            )
            particle_f = particle_f + pf
            body_f = body_f + bf

        tau = eval_tau(model, state.joint_q, state.joint_qd, joint_act, S_s, body_f)
        if mass_cache is None:
            HL = _factorize_mass_matrix(model, S_s, body_X_sm)
        else:
            HL = mass_cache
        qdd = solve_frozen_inv(HL[0], HL[1], tau)
        q_new, qd_new = _integrate_joint(model, state.joint_q, state.joint_qd, qdd, dt)
    else:
        if couple:
            # static shapes (body == -1) still collide with particles
            pf, _ = part.eval_soft_contacts(
                model, state.particle_q, state.particle_qd, None, None
            )
            particle_f = particle_f + pf
        q_new, qd_new, HL = state.joint_q, state.joint_qd, None

    if has_particles:
        px, pv = part.integrate_particles(
            state.particle_q, state.particle_qd, particle_f,
            model.particle_inv_mass, model.gravity, dt,
        )
    else:
        px, pv = state.particle_q, state.particle_qd

    return State(joint_q=q_new, joint_qd=qd_new, particle_q=px, particle_qd=pv), HL


def _simulate_manual(
    model: Model,
    state: State,
    joint_act,
    muscle_act,
    dt: float,
    substeps: int,
    mass_matrix_freq: int,
    unroll: int = 1,
) -> State:
    """`simulate` with a HAND-WRITTEN reverse pass (articulations only).

    The autodiff path (scan-of-blocks + per-substep ``jax.checkpoint``)
    measured ~0.95 ms/substep backward vs 0.14 forward on Ant@4096 — yet a
    single substep's VJP costs only ~1.2-1.5x its forward
    (docs/PERF_NOTES.md). The residue is XLA's transposed-nested-scan
    machinery (reverse while loops over remat regions). This path replaces
    it outright — the reference analog is the Tape replaying one adjoint
    kernel sequence per substep (/root/reference/dflex/dflex/sim.py:2086-2154,
    adjoint.py:2153-2199):

    - forward: plain scan saving each substep's tiny pre-state (q, qd — the
      only true residues; everything else is recomputed) and each block's
      (H, H^-1);
    - backward: ONE flat reverse scan whose body does substep-forward +
      cotangent application via ``jax.vjp`` on the saved pre-state —
      identical math to the remat path (same frozen-factor conventions via
      ``solve_frozen_inv``), but flat control flow and explicit residuals.

    Gradients flow to (state, joint_act, muscle_act) only; Model arrays are
    treated as constants (true for every training path — the reference's
    model.flatten() grads exist but are unused by SHAC/BPTT).
    """
    if substeps % mass_matrix_freq != 0:
        raise ValueError("substeps must be a multiple of mass_matrix_freq")
    nblocks = substeps // mass_matrix_freq
    n_inner = mass_matrix_freq - 1
    h = dt / float(substeps)

    has_muscles = muscle_act is not None
    ma_in = muscle_act if has_muscles else jnp.zeros((0,), jnp.float32)
    if joint_act is None:
        joint_act = jnp.zeros((model.dof_count,), dtype=jnp.float32)

    def refresh_step(q, qd, ja, ma):
        qn, qdn, (H, Hinv) = articulation_substep(
            model, q, qd, ja, ma if has_muscles else None, h
        )
        return qn, qdn, H, Hinv

    def cached_step(q, qd, ja, ma, H, Hinv):
        qn, qdn, _ = articulation_substep(
            model, q, qd, ja, ma if has_muscles else None, h,
            mass_cache=(H, Hinv),
        )
        return qn, qdn

    def fwd_scan(q, qd, ja, ma):
        def block(carry, _):
            q0, qd0 = carry
            q1, qd1, H, Hinv = refresh_step(q0, qd0, ja, ma)

            def inner(c, _):
                qq, qqd = c
                qn, qdn = cached_step(qq, qqd, ja, ma, H, Hinv)
                return (qn, qdn), (qq, qqd)

            if n_inner > 0:
                (qf, qdf), (qs, qds) = lax.scan(
                    inner, (q1, qd1), None, length=n_inner
                )
            else:
                qf, qdf = q1, qd1
                qs = jnp.zeros((0,) + q1.shape, q1.dtype)
                qds = jnp.zeros((0,) + qd1.shape, qd1.dtype)
            return (qf, qdf), (q0, qd0, qs, qds, H, Hinv)

        return lax.scan(block, (q, qd), None, length=nblocks)

    @jax.custom_vjp
    def run(q, qd, ja, ma):
        (qf, qdf), _ = fwd_scan(q, qd, ja, ma)
        return qf, qdf

    def run_fwd(q, qd, ja, ma):
        (qf, qdf), saved = fwd_scan(q, qd, ja, ma)
        return (qf, qdf), (saved, ja, ma)

    def run_bwd(res, g):
        saved, ja, ma = res
        g_q, g_qd = g

        def block_bwd(carry, xs):
            gq, gqd, gja, gma = carry
            q0, qd0, qs_b, qds_b, H, Hinv = xs

            def inner_bwd(c, x):
                cq, cqd, cja, cma, cH = c
                qq, qqd = x
                _, vjp = jax.vjp(
                    lambda q_, qd_, ja_, ma_, H_: cached_step(
                        q_, qd_, ja_, ma_, H_, Hinv
                    ),
                    qq, qqd, ja, ma, H,
                )
                dq, dqd, dja, dma, dH = vjp((cq, cqd))
                return (dq, dqd, cja + dja, cma + dma, cH + dH), None

            if n_inner > 0:
                (gq, gqd, gja, gma, gH), _ = lax.scan(
                    inner_bwd,
                    (gq, gqd, gja, gma, jnp.zeros_like(H)),
                    (qs_b, qds_b),
                    reverse=True,
                    unroll=min(unroll, n_inner),
                )
            else:
                gH = jnp.zeros_like(H)

            # refresh: outputs (q1, qd1, H); Hinv is frozen by convention
            # (chol backward = nop, matnn.h:310-336) so it takes no cotangent
            _, vjp = jax.vjp(
                lambda q_, qd_, ja_, ma_: refresh_step(q_, qd_, ja_, ma_)[:3],
                q0, qd0, ja, ma,
            )
            dq, dqd, dja, dma = vjp((gq, gqd, gH))
            return (dq, dqd, gja + dja, gma + dma), None

        zero_carry = (g_q, g_qd, jnp.zeros_like(ja), jnp.zeros_like(ma))
        (g_q, g_qd, g_ja, g_ma), _ = lax.scan(
            block_bwd, zero_carry, saved, reverse=True
        )
        return g_q, g_qd, g_ja, g_ma

    run.defvjp(run_fwd, run_bwd)
    q, qd = run(state.joint_q, state.joint_qd, joint_act, ma_in)
    return State(
        joint_q=q, joint_qd=qd,
        particle_q=state.particle_q, particle_qd=state.particle_qd,
    )


def simulate_batched_pallas(
    model: Model,
    joint_q,
    joint_qd,
    joint_act=None,
    muscle_act=None,
    dt: float = 1.0 / 60.0,
    substeps: int = 16,
    mass_matrix_freq: int = 1,
):
    """Whole-batch `simulate` with fused Pallas substep kernels.

    Same math and gradient conventions as ``simulate(backward="manual")``,
    but each cached substep (the (mm-1)/mm majority) runs as ONE fused
    Pallas kernel — forward and VJP — instead of ~2,600 separate XLA
    fusions (docs/PERF_NOTES.md round-2 backward characterization). The
    mass-matrix refresh substep stays on the XLA path (it holds the
    factorization; 1/mm of substeps).

    joint_q [E, C], joint_qd/joint_act [E, D], muscle_act [E, M] | None.
    Articulations only (no particles). Returns (joint_q', joint_qd').
    """
    from .pallas_substep import (
        TILE,
        prepare_substep_forward,
        prepare_substep_vjp,
        substep_forward_batched,
        substep_vjp_batched,
        tile_consts,
    )

    if substeps % mass_matrix_freq != 0:
        raise ValueError("substeps must be a multiple of mass_matrix_freq")
    nblocks = substeps // mass_matrix_freq
    n_inner = mass_matrix_freq - 1
    h = dt / float(substeps)

    E = joint_q.shape[0]
    Ep = -(-E // TILE) * TILE
    has_m = muscle_act is not None
    if joint_act is None:
        joint_act = jnp.zeros((E, model.dof_count), dtype=jnp.float32)

    def pad_t(x):
        # [E, k] -> transposed + env-padded [k, Ep] (edge copies stay
        # numerically well-behaved; padded lanes are dropped at exit)
        xt = x.T
        return jnp.pad(xt, ((0, 0), (0, Ep - E)), mode="edge")

    q_t0 = pad_t(joint_q)
    qd_t0 = pad_t(joint_qd)
    ja_t0 = pad_t(joint_act)
    # muscle activations thread through the custom_vjp as a (possibly
    # zero-width) array; `has_m` statically selects the real path
    ma_t0 = pad_t(muscle_act) if has_m else jnp.zeros((0, Ep), jnp.float32)

    # hoist the kernel traces (CPU-expensive) and const tiling (must not
    # re-materialize per substep) out of the scans below
    C, D = model.coord_count, model.dof_count
    M = ma_t0.shape[0] if has_m else 1
    fwd_prep = prepare_substep_forward(model, h, C, D, M, has_m)
    vjp_prep = prepare_substep_vjp(model, h, C, D, M, has_m)

    def refresh_batch(q_t, qd_t, ja, ma):
        # XLA path for the factorizing substep, [E]-leading orientation
        def one(q1, qd1, ja1, ma1):
            qn, qdn, (H, Hinv) = articulation_substep(
                model, q1, qd1, ja1, ma1 if has_m else None, h
            )
            return qn, qdn, H, Hinv

        qn, qdn, H, Hinv = jax.vmap(one)(q_t.T, qd_t.T, ja.T, ma.T)
        return (qn.T, qdn.T,
                jnp.moveaxis(H, 0, -1), jnp.moveaxis(Hinv, 0, -1))

    def fwd_scan(q_t, qd_t, ja, ma):
        fwd_tiled = tile_consts(fwd_prep[1], q_t)

        def block(carry, _):
            q0, qd0 = carry
            q1, qd1, H_t, Hinv_t = refresh_batch(q0, qd0, ja, ma)

            def inner(c, _):
                qt, qdt = c
                qn, qdn = substep_forward_batched(
                    model, h, qt, qdt, ja, ma if has_m else None, Hinv_t,
                    prep=fwd_prep, tiled_consts=fwd_tiled)
                return (qn, qdn), (qt, qdt)

            if n_inner > 0:
                (qf, qdf), (qs, qds) = lax.scan(
                    inner, (q1, qd1), None, length=n_inner)
            else:
                qf, qdf = q1, qd1
                qs = jnp.zeros((0,) + q1.shape, q1.dtype)
                qds = jnp.zeros((0,) + qd1.shape, qd1.dtype)
            return (qf, qdf), (q0, qd0, qs, qds, H_t, Hinv_t)

        return lax.scan(block, (q_t, qd_t), None, length=nblocks)

    @jax.custom_vjp
    def run(q_t, qd_t, ja, ma):
        (qf, qdf), _ = fwd_scan(q_t, qd_t, ja, ma)
        return qf, qdf

    def run_fwd(q_t, qd_t, ja, ma):
        (qf, qdf), saved = fwd_scan(q_t, qd_t, ja, ma)
        return (qf, qdf), (saved, ja, ma)

    def run_bwd(res, g):
        saved, ja, ma = res
        g_q, g_qd = g
        vjp_tiled = tile_consts(vjp_prep[1], g_q)

        def block_bwd(carry, xs):
            gq, gqd, gja, gma = carry
            q0, qd0, qs_b, qds_b, H_t, Hinv_t = xs

            def inner_bwd(c, x):
                cq, cqd, cja, cma, cH = c
                qt, qdt = x
                dq, dqd, dja, dma, dh = substep_vjp_batched(
                    model, h, qt, qdt, ja, ma if has_m else None,
                    H_t, Hinv_t, cq, cqd,
                    prep=vjp_prep, tiled_consts=vjp_tiled)
                if has_m:
                    cma = cma + dma
                return (dq, dqd, cja + dja, cma, cH + dh), None

            if n_inner > 0:
                (gq, gqd, gja, gma, gH), _ = lax.scan(
                    inner_bwd,
                    (gq, gqd, gja, gma,
                     jnp.zeros((model.dof_count, model.dof_count, Ep))),
                    (qs_b, qds_b), reverse=True)
            else:
                gH = jnp.zeros((model.dof_count, model.dof_count, Ep))

            # refresh substep cotangent via the XLA path ([E]-leading);
            # Hinv is frozen by convention (no cotangent), H takes gH
            def refresh_outs(q_tt, qd_tt, ja_tt, ma_tt):
                q1, qd1, H_t2, _ = refresh_batch(q_tt, qd_tt, ja_tt, ma_tt)
                return q1, qd1, H_t2

            _, vjp = jax.vjp(refresh_outs, q0, qd0, ja, ma)
            dq, dqd, dja, dma = vjp((gq, gqd, gH))
            return (dq, dqd, gja + dja, gma + dma), None

        zero = (g_q, g_qd, jnp.zeros_like(ja), jnp.zeros_like(ma))
        (gq, gqd, gja, gma), _ = lax.scan(
            block_bwd, zero, saved, reverse=True)
        return gq, gqd, gja, gma

    run.defvjp(run_fwd, run_bwd)
    qf_t, qdf_t = run(q_t0, qd_t0, ja_t0, ma_t0)
    return qf_t[:, :E].T, qdf_t[:, :E].T


def simulate(
    model: Model,
    state: State,
    joint_act=None,
    muscle_act=None,
    dt: float = 1.0 / 60.0,
    substeps: int = 16,
    mass_matrix_freq: int = 1,
    remat: bool = True,
    remat_granularity: int = 1,
    backward: str = "remat",
    backward_unroll: int = 1,
) -> State:
    """Advance one env step = `substeps` substeps of size dt/substeps.

    Equivalent of SemiImplicitIntegrator.forward for articulations
    (sim.py:2182-2221) — but it is just a differentiable function: no tape,
    no autograd.Function. The mass matrix is refactorized every
    `mass_matrix_freq` substeps and reused (frozen) in between; gradients
    w.r.t. the cached factor follow the reference's frozen-L convention.

    Structured as scan-of-blocks so the compiled graph contains ONE block
    body regardless of substep count. With ``remat`` every substep is
    individually ``jax.checkpoint``-ed: the reverse pass then stores only the
    tiny carried joint state per substep and recomputes each substep fused
    with its backward. Without this, the scan saves hundreds of small
    [E, 3]/[E, 6] intermediates per substep — each tile-padded by TPU layout
    to (8, 128) lanes — and the resulting HBM round-trip ran the backward at
    ~10x forward cost (docs/PERF_NOTES.md backward characterization); the
    per-substep policy replaces that traffic with ~2x recompute FLOPs.

    ``backward="manual"`` selects the hand-written reverse pass
    (:func:`_simulate_manual`) — same gradient values, flat reverse scan
    instead of XLA's transposed nested scans. Articulation-only scenes;
    falls back to the remat path when particles are present.
    """
    if backward == "manual" and state.particle_q is None:
        return _simulate_manual(
            model, state, joint_act, muscle_act, dt, substeps,
            mass_matrix_freq, unroll=backward_unroll,
        )
    if substeps % mass_matrix_freq != 0:
        raise ValueError("substeps must be a multiple of mass_matrix_freq")
    nblocks = substeps // mass_matrix_freq
    h = dt / float(substeps)

    if joint_act is None:
        joint_act = jnp.zeros((model.dof_count,), dtype=jnp.float32)

    def refresh(carry):
        # first substep of the block refactorizes H
        return coupled_substep(model, carry, joint_act, muscle_act, h)

    g = max(1, int(remat_granularity))

    def inner_step(c, hl_flat):
        # The cache crosses the substep scan as FLAT [D*D] vectors: a
        # batched [E, D, D] scan residual/cotangent pads to [E, 16, 128]
        # tiles (~8x traffic for D~14..27); flat [E, D*D] pads only the last
        # dim. Reshape inside the checkpointed region is fusion-local.
        # remat_granularity > 1 groups that many substeps into one
        # checkpointed region: fewer reverse-scan iterations (amortizing
        # per-iteration overhead) at the cost of proportionally larger
        # rematerialized regions.
        D = model.dof_count
        HL = (
            None if hl_flat is None
            else (hl_flat[0].reshape(D, D), hl_flat[1].reshape(D, D))
        )
        for _ in range(g):
            c, _ = coupled_substep(
                model, c, joint_act, muscle_act, h, mass_cache=HL
            )
        return c

    if remat:
        # prevent_cse=False is safe (and faster) for scan bodies: the XLA
        # while-loop boundary already prevents the remat-defeating CSE.
        # When inner_step would be called directly (a single grouped
        # region, (mass_matrix_freq-1)//g <= 1) there is no loop boundary,
        # so keep the barrier. The refresh substep always runs outside the
        # scan and keeps it too.
        inner_in_scan = (mass_matrix_freq - 1) // g > 1
        refresh = jax.checkpoint(refresh)
        inner_step = jax.checkpoint(inner_step, prevent_cse=not inner_in_scan)

    def block(carry, _):
        s, HL = refresh(carry)
        hl_flat = None if HL is None else tuple(x.reshape(-1) for x in HL)

        def inner(c, _):
            return inner_step(c, hl_flat), None

        n_inner = mass_matrix_freq - 1
        if n_inner > 0:
            if n_inner % g:
                raise ValueError(
                    "mass_matrix_freq - 1 must be divisible by remat_granularity"
                )
            if n_inner // g > 1:
                s, _ = lax.scan(inner, s, None, length=n_inner // g)
            else:
                s, _ = inner(s, None)
        return s, None

    if nblocks > 1:
        state, _ = lax.scan(block, state, None, length=nblocks)
    else:
        state, _ = block(state, None)

    return state


def simulate_xpbd(
    model: Model,
    state: State,
    dt: float = 1.0 / 60.0,
    substeps: int = 16,
    remat: bool = True,
) -> State:
    """Advance one env step with the XPBD position-based integrator
    (particles only, XPBDIntegrator, sim.py:2901-3000)."""
    from . import particles as part

    h = dt / float(substeps)

    def sub(s, _):
        px, pv = part.xpbd_substep(
            model, s.particle_q, s.particle_qd, h, relaxation=model.relaxation
        )
        return State(joint_q=s.joint_q, joint_qd=s.joint_qd,
                     particle_q=px, particle_qd=pv), None

    if remat:
        sub = jax.checkpoint(sub)
    state, _ = lax.scan(sub, state, None, length=substeps)
    return state
