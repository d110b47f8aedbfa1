"""Link-batched articulation dynamics in env-minor layout.

The default engine (articulation.py) unrolls the per-link loops at trace
time and vmaps over envs — the measured optimum for the FORWARD pass
(docs/PERF_NOTES.md §3: a batched-gather rewrite ran 32% slower because
gathers break XLA's fusion of the wide elementwise passes). The BACKWARD
pass has the opposite economics: its device trace shows ~2,600 tiny XLA
fusions per substep VJP at ~0.65 us fixed cost each — launch/scheduling
bound, not bandwidth bound (PERF_NOTES round-2 backward characterization).
There, collapsing the equation count by batching over links is exactly the
lever: one formula instance per (tree level x joint type) group instead of
one per link shrinks the substep jaxpr ~10x, giving XLA ~10x fewer, ~10x
fatter fusions on the reverse path.

Layout: env-minor. Every array carries components on the second-to-last
axis and the env batch E on the LAST (lane) axis — [C, E] coords, [D, E]
dofs, [L, 7, E] transforms, [L, 6, E] spatial vectors. TPU tiling pads the
trailing two dims to (8, 128): components (3/4/6/7 -> 8) and envs
(128 | E) both pad mildly, whereas the env-leading [E, 6] layout pads
lanes 6 -> 128 (21x) for every intermediate that reaches HBM.

Topology handling: links are regrouped level-major at trace time
(_plan_for): within a tree level, links of the same joint type form one
group evaluated as a single batched formula. Parent access is ONE static
gather per level (with an appended identity row for roots), force
accumulation is ONE subtree-mask contraction, and canonical coord/dof
order is restored by a single permutation gather at the stage boundary.

Semantics match articulation.articulation_substep bit-for-bit up to float
reassociation: same kernel math (reference sim.py:1269-1842 pipeline),
same frozen-factor solve convention (ops/linalg.py solve_frozen_inv), same
guarded primitives. tests/test_articulation_lb.py enforces forward AND
VJP agreement against the unrolled path on every joint-type family.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .model import (
    JOINT_BALL,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    Model,
    State,
)

_QEPS = 1.0e-6


# --------------------------------------------------------------------------
# env-minor math: component axis is -2, env axis is -1. Consts broadcast as
# [..., c, 1]. Formulas mirror ops/{quat,transform,spatial}.py exactly.
# --------------------------------------------------------------------------


def _cross(a, b):
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2
    )


def _qmul(a, b):
    ax, ay, az, aw = (a[..., i, :] for i in range(4))
    bx, by, bz, bw = (b[..., i, :] for i in range(4))
    return jnp.stack(
        [
            aw * bx + bw * ax + ay * bz - by * az,
            aw * by + bw * ay + az * bx - bz * ax,
            aw * bz + bw * az + ax * by - bx * ay,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-2,
    )


def _qrot(q, v):
    qv = q[..., 0:3, :]
    w = q[..., 3:4, :]
    return (
        v * (2.0 * w * w - 1.0)
        + _cross(qv, v) * w * 2.0
        + qv * jnp.sum(qv * v, axis=-2, keepdims=True) * 2.0
    )


def _qrot_inv(q, v):
    qv = q[..., 0:3, :]
    w = q[..., 3:4, :]
    return (
        v * (2.0 * w * w - 1.0)
        - _cross(qv, v) * w * 2.0
        + qv * jnp.sum(qv * v, axis=-2, keepdims=True) * 2.0
    )


_QCONJ = np.array([-1.0, -1.0, -1.0, 1.0], np.float32).reshape(4, 1)


def _qnormalize(q):
    l2 = jnp.sum(q * q, axis=-2, keepdims=True)
    safe = l2 > _QEPS * _QEPS
    l = jnp.sqrt(jnp.where(safe, l2, 1.0))
    ident = jnp.zeros_like(q).at[..., 3, :].set(1.0)
    return jnp.where(safe, q / l, ident)


def _tmul(t, u):
    p = _qrot(t[..., 3:7, :], u[..., 0:3, :]) + t[..., 0:3, :]
    q = _qmul(t[..., 3:7, :], u[..., 3:7, :])
    return jnp.concatenate([p, q], axis=-2)


def _tinv(t):
    q_inv = t[..., 3:7, :] * _QCONJ
    p = -_qrot(q_inv, t[..., 0:3, :])
    return jnp.concatenate([p, q_inv], axis=-2)


def _tpoint(t, x):
    return t[..., 0:3, :] + _qrot(t[..., 3:7, :], x)


def _scross(a, b):
    w = _cross(a[..., 0:3, :], b[..., 0:3, :])
    v = _cross(a[..., 3:6, :], b[..., 0:3, :]) + _cross(
        a[..., 0:3, :], b[..., 3:6, :]
    )
    return jnp.concatenate([w, v], axis=-2)


def _scross_dual(a, b):
    w = _cross(a[..., 0:3, :], b[..., 0:3, :]) + _cross(
        a[..., 3:6, :], b[..., 3:6, :]
    )
    v = _cross(a[..., 0:3, :], b[..., 3:6, :])
    return jnp.concatenate([w, v], axis=-2)


def _twist_xform(t, x):
    q = t[..., 3:7, :]
    p = t[..., 0:3, :]
    w = _qrot(q, x[..., 0:3, :])
    v = _qrot(q, x[..., 3:6, :]) + _cross(p, w)
    return jnp.concatenate([w, v], axis=-2)


def _wrench_xform(t, x):
    q = t[..., 3:7, :]
    p = t[..., 0:3, :]
    v = _qrot(q, x[..., 3:6, :])
    w = _qrot(q, x[..., 0:3, :]) + _cross(p, v)
    return jnp.concatenate([w, v], axis=-2)


def _inertia_matvec(t, I3, m, x):
    """Factored spatial-inertia apply (ops/spatial.py:spatial_inertia_matvec):
    y = T^T I_m T x with T = Ad(t^-1); I3 [L,3,3,1], m [L,1,1]."""
    u = _twist_xform(_tinv(t), x)
    top = jnp.sum(I3 * u[..., None, 0:3, :], axis=-2)
    y = jnp.concatenate([top, m * u[..., 3:6, :]], axis=-2)
    return _wrench_xform(t, y)


def _twist_inv_T(t, y):
    """EXACT transpose of the linear map x -> _twist_xform(_tinv(t), x).

    For unit quaternions this equals _wrench_xform(t, .), but FK quats
    carry float32 drift and env states may hold unnormalized root quats;
    the wrench form then deviates ~1e-3 relative, which breaks the
    symmetry (and reference parity) of the Gram-form mass matrix. Uses
    _qrot_inv(q, .) == _qrot(q, .)^T, an identity that holds for ANY q."""
    qi = t[..., 3:7, :] * _QCONJ
    p_inv = -_qrot(qi, t[..., 0:3, :])
    yw = y[..., 0:3, :]
    yv = y[..., 3:6, :]
    w = _qrot_inv(qi, yw - _cross(p_inv, yv))
    v = _qrot_inv(qi, yv)
    return jnp.concatenate([w, v], axis=-2)


def _inertia_gram_matvec(t, I3, m, x):
    """y = T^T I_m T x with the EXACT transpose (see _twist_inv_T):
    symmetric for any quat and bit-matching the reference's Gram-form
    H assembly (articulation.eval_mass_matrix_factored: us[a] . vs[b])."""
    u = _twist_xform(_tinv(t), x)
    top = jnp.sum(I3 * u[..., None, 0:3, :], axis=-2)
    y = jnp.concatenate([top, m * u[..., 3:6, :]], axis=-2)
    return _twist_inv_T(t, y)


def _safe_normalize(v, eps=_QEPS):
    l2 = jnp.sum(v * v, axis=-2, keepdims=True)
    safe = l2 > eps * eps
    inv = jnp.where(safe, 1.0 / jnp.sqrt(jnp.where(safe, l2, 1.0)), 0.0)
    return v * inv


@jax.custom_vjp
def _solve_frozen_inv(H, Hinv, b):
    """qdd = Hinv @ b, env-minor ([D,D,E] x [D,E]), with the reference's
    frozen-factor gradient convention (ops/linalg.py:solve_frozen_inv)."""
    del H
    return jnp.sum(Hinv * b[..., None, :, :], axis=-2)


def _solve_fwd(H, Hinv, b):
    x = jnp.sum(Hinv * b[..., None, :, :], axis=-2)
    return x, (Hinv, x)


def _solve_bwd(res, g):
    Hinv, x = res
    lam = jnp.sum(Hinv * g[..., None, :, :], axis=-2)
    adj_H = -lam[..., :, None, :] * x[..., None, :, :]
    return adj_H, jnp.zeros_like(Hinv), lam


_solve_frozen_inv.defvjp(_solve_fwd, _solve_bwd)


# --------------------------------------------------------------------------
# topology plan: level-major link regrouping, all static index/const tables
# --------------------------------------------------------------------------


class _Group(NamedTuple):
    jtype: int
    level: int
    start: int          # proc-row range [start, stop) — groups are contiguous
    stop: int
    links: np.ndarray   # original link ids, len n
    q_idx: np.ndarray   # [n, cq] canonical coord indices (cq by joint type)
    qd_idx: np.ndarray  # [n, cd] canonical dof indices
    axis: np.ndarray    # [n, 3, 1] f32
    X_pj: np.ndarray    # [n, 7, 1] f32
    # per-link gains / per-coord targets+limits (scalar-joint groups)
    target_ke: np.ndarray
    target_kd: np.ndarray
    limit_ke: np.ndarray
    limit_kd: np.ndarray
    target: np.ndarray
    lower: np.ndarray
    upper: np.ndarray


class _Plan(NamedTuple):
    groups: Tuple[_Group, ...]
    levels: Tuple[Tuple[int, int], ...]   # contiguous proc-row span per level
    order: np.ndarray                     # link id at each proc row
    row_of: np.ndarray                    # proc row of each link id
    parent_row: np.ndarray                # parent proc row; L for roots
    X_cm: np.ndarray                      # [L, 7, 1] proc order
    I3: np.ndarray                        # [L, 3, 3, 1]
    m: np.ndarray                         # [L, 1, 1]
    subtree: np.ndarray                   # [L, L] f32, proc order
    coord_perm: np.ndarray                # group-chunk order -> canonical
    dof_perm: np.ndarray
    inv_coord_perm: np.ndarray
    inv_dof_perm: np.ndarray
    dof_row: np.ndarray                   # [D] proc row owning each chunk-dof
    anc_pair: np.ndarray                  # [D, D] bool, chunk order:
                                          # link(e) ancestor-or-self of link(d)
    armature: np.ndarray                  # [D, 1] f32, chunk order
    # ground contacts (proc rows)
    contact_rows: np.ndarray
    contact_point: np.ndarray             # [K, 3, 1]
    contact_dist: np.ndarray              # [K, 1, 1]
    contact_mat: np.ndarray               # [4, K, 1, 1] (ke, kd, kf, mu)
    # muscle segments (proc rows)
    seg_row0: np.ndarray
    seg_row1: np.ndarray
    seg_m: np.ndarray
    seg_r0: np.ndarray                    # [S, 3, 1]
    seg_r1: np.ndarray


_N_COORDS = {
    JOINT_PRISMATIC: 1, JOINT_REVOLUTE: 1, JOINT_BALL: 4,
    JOINT_FIXED: 0, JOINT_FREE: 7,
}
_N_DOFS = {
    JOINT_PRISMATIC: 1, JOINT_REVOLUTE: 1, JOINT_BALL: 3,
    JOINT_FIXED: 0, JOINT_FREE: 6,
}

_PLAN_CACHE: dict = {}


def _plan_for(model: Model) -> _Plan:
    topo = model.topology
    # The plan bakes model parameter arrays (gains, limits, inertias,
    # joint frames, contact/muscle tables) in as numpy constants, so the
    # cache key must change when any of them is swapped (e.g. a Model
    # variant sharing the topology object). Keying on the ids and keeping
    # strong references keeps ids valid for the cache's lifetime.
    key = (
        id(topo), id(model.joint_target), id(model.joint_limit_lower),
        id(model.joint_limit_upper), id(model.body_I_m),
        id(model.joint_X_pj), id(model.joint_X_cm), id(model.joint_axis),
        id(model.contact_point), id(model.muscle_points),
        id(model.joint_armature),
    )
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit[1]

    L = topo.link_count
    parent = np.asarray(topo.joint_parent, np.int64)
    jtype = np.asarray(topo.joint_type, np.int64)
    qs = np.asarray(topo.joint_q_start, np.int64)
    ds = np.asarray(topo.joint_qd_start, np.int64)

    depth = np.zeros(L, np.int64)
    for i in range(L):
        depth[i] = 0 if parent[i] < 0 else depth[parent[i]] + 1

    # level-major processing order; same-type links contiguous within a level
    order: List[int] = []
    groups: List[_Group] = []
    levels: List[Tuple[int, int]] = []
    t_ke = np.asarray(model.joint_target_ke, np.float32)
    t_kd = np.asarray(model.joint_target_kd, np.float32)
    l_ke = np.asarray(model.joint_limit_ke, np.float32)
    l_kd = np.asarray(model.joint_limit_kd, np.float32)
    target = np.asarray(model.joint_target, np.float32)
    lower = np.asarray(model.joint_limit_lower, np.float32)
    upper = np.asarray(model.joint_limit_upper, np.float32)
    axis_all = np.asarray(model.joint_axis, np.float32)
    X_pj_all = np.asarray(model.joint_X_pj, np.float32)

    for lvl in range(int(depth.max()) + 1 if L else 0):
        lvl_start = len(order)
        in_lvl = np.nonzero(depth == lvl)[0]
        for t in sorted(set(jtype[in_lvl].tolist())):
            links = in_lvl[jtype[in_lvl] == t]
            n = len(links)
            start = len(order)
            order.extend(links.tolist())
            cq, cd = _N_COORDS[t], _N_DOFS[t]
            q_idx = np.stack(
                [qs[links] + k for k in range(cq)], axis=1
            ).astype(np.int64) if cq else np.zeros((n, 0), np.int64)
            qd_idx = np.stack(
                [ds[links] + k for k in range(cd)], axis=1
            ).astype(np.int64) if cd else np.zeros((n, 0), np.int64)
            scalar = t in (JOINT_PRISMATIC, JOINT_REVOLUTE)
            groups.append(_Group(
                jtype=int(t), level=lvl, start=start, stop=start + n,
                links=links,
                q_idx=q_idx, qd_idx=qd_idx,
                axis=axis_all[links].reshape(n, 3, 1),
                X_pj=X_pj_all[links].reshape(n, 7, 1),
                target_ke=t_ke[links].reshape(n, 1),
                target_kd=t_kd[links].reshape(n, 1),
                limit_ke=l_ke[links].reshape(n, 1),
                limit_kd=l_kd[links].reshape(n, 1),
                target=(target[qs[links]] if scalar
                        else np.zeros(n, np.float32)).reshape(n, 1),
                lower=(lower[qs[links]] if scalar
                       else np.zeros(n, np.float32)).reshape(n, 1),
                upper=(upper[qs[links]] if scalar
                       else np.zeros(n, np.float32)).reshape(n, 1),
            ))
        levels.append((lvl_start, len(order)))

    order_np = np.asarray(order, np.int64)
    row_of = np.zeros(L, np.int64)
    row_of[order_np] = np.arange(L)
    parent_row = np.where(
        parent[order_np] < 0, L, row_of[np.maximum(parent[order_np], 0)]
    )

    # subtree[i, j] = 1 iff proc-row i is an ancestor-or-self of proc-row j
    anc = np.zeros((L, L), np.float32)
    for j_link in range(L):
        a = j_link
        while a >= 0:
            anc[row_of[a], row_of[j_link]] = 1.0
            a = parent[a]

    coord_perm = np.concatenate(
        [g.q_idx.ravel() for g in groups]
    ) if groups else np.zeros(0, np.int64)
    dof_perm = np.concatenate(
        [g.qd_idx.ravel() for g in groups]
    ) if groups else np.zeros(0, np.int64)

    # mass-matrix tables (chunk-dof order): owning proc row per dof, the
    # ancestor-pair sparsity mask, and the armature permuted from canonical
    dof_row = np.concatenate(
        [np.repeat(np.arange(g.start, g.stop), _N_DOFS[g.jtype])
         for g in groups]
    ).astype(np.int64) if groups else np.zeros(0, np.int64)

    I_m = np.asarray(model.body_I_m, np.float32)[order_np]
    K = topo.contact_count
    has_contacts = K > 0 and bool(model.ground)
    cmat = (np.asarray(model.contact_mat, np.float32)
            if has_contacts else np.zeros((0, 4), np.float32))

    # muscle waypoint segments (articulation.eval_muscles static seg list)
    seg_i, seg_m = [], []
    M = topo.muscle_count
    if M:
        ms = topo.muscle_start
        mlinks = topo.muscle_links
        for mi in range(M):
            for i in range(ms[mi], ms[mi + 1] - 1):
                if mlinks[i] == mlinks[i + 1]:
                    continue
                seg_i.append(i)
                seg_m.append(mi)
    seg_i = np.asarray(seg_i, np.int64)
    seg_m_np = np.asarray(seg_m, np.int64)
    if len(seg_i):
        mlinks_np = np.asarray(topo.muscle_links, np.int64)
        mpts = np.asarray(model.muscle_points, np.float32)
        seg_row0 = row_of[mlinks_np[seg_i]]
        seg_row1 = row_of[mlinks_np[seg_i + 1]]
        seg_r0 = mpts[seg_i].reshape(-1, 3, 1)
        seg_r1 = mpts[seg_i + 1].reshape(-1, 3, 1)
    else:
        seg_row0 = seg_row1 = np.zeros(0, np.int64)
        seg_r0 = seg_r1 = np.zeros((0, 3, 1), np.float32)

    plan = _Plan(
        groups=tuple(groups),
        levels=tuple(levels),
        order=order_np,
        row_of=row_of,
        parent_row=parent_row,
        X_cm=np.asarray(model.joint_X_cm, np.float32)[order_np].reshape(
            L, 7, 1),
        I3=I_m[:, 0:3, 0:3].reshape(L, 3, 3, 1),
        m=I_m[:, 3, 3].reshape(L, 1, 1),
        subtree=anc,
        coord_perm=coord_perm,
        dof_perm=dof_perm,
        inv_coord_perm=np.argsort(coord_perm),
        inv_dof_perm=np.argsort(dof_perm),
        contact_rows=(row_of[np.asarray(topo.contact_body, np.int64)]
                      if has_contacts else np.zeros(0, np.int64)),
        contact_point=(np.asarray(model.contact_point, np.float32)
                       .reshape(-1, 3, 1) if has_contacts
                       else np.zeros((0, 3, 1), np.float32)),
        contact_dist=(np.asarray(model.contact_dist, np.float32)
                      .reshape(-1, 1, 1) if has_contacts
                      else np.zeros((0, 1, 1), np.float32)),
        contact_mat=cmat.T.reshape(4, -1, 1, 1),
        seg_row0=seg_row0,
        seg_row1=seg_row1,
        seg_m=seg_m_np,
        seg_r0=seg_r0,
        seg_r1=seg_r1,
        dof_row=dof_row,
        anc_pair=anc[np.ix_(dof_row, dof_row)].astype(bool),
        armature=np.asarray(model.joint_armature, np.float32)[
            dof_perm].reshape(-1, 1),
    )
    _PLAN_CACHE[key] = (model, plan)
    return plan


# --------------------------------------------------------------------------
# stages (all env-minor; [.., E] arrays)
# --------------------------------------------------------------------------


def _identity_transform_row(E, dtype):
    row = np.zeros((1, 7, 1), np.float32)
    row[0, 6, 0] = 1.0
    return jnp.broadcast_to(jnp.asarray(row, dtype), (1, 7, E))


def _joint_transforms(plan: _Plan, q):
    """X_jc per link in proc order ([L, 7, E]) — one formula per group."""
    E = q.shape[-1]
    chunks = []
    for g in plan.groups:
        n = g.stop - g.start
        if g.jtype == JOINT_PRISMATIC:
            qg = q[g.q_idx[:, 0]][:, None, :]                # [n, 1, E]
            pos = g.axis * qg
            quat = jnp.broadcast_to(
                jnp.asarray(np.array([0, 0, 0, 1], np.float32)
                            .reshape(1, 4, 1)), (n, 4, E))
            chunks.append(jnp.concatenate([pos, quat], axis=-2))
        elif g.jtype == JOINT_REVOLUTE:
            half = q[g.q_idx[:, 0]][:, None, :] * 0.5
            v = g.axis * jnp.sin(half)
            w = jnp.cos(half)
            pos = jnp.zeros((n, 3, E), q.dtype)
            chunks.append(jnp.concatenate([pos, v, w], axis=-2))
        elif g.jtype == JOINT_BALL:
            quat = q[g.q_idx]                                # [n, 4, E]
            pos = jnp.zeros((n, 3, E), q.dtype)
            chunks.append(jnp.concatenate([pos, quat], axis=-2))
        elif g.jtype == JOINT_FREE:
            chunks.append(q[g.q_idx])                        # [n, 7, E]
        else:  # fixed
            chunks.append(_identity_transform_row(E, q.dtype) * jnp.ones(
                (n, 1, 1), q.dtype))
    return jnp.concatenate(chunks, axis=0)


def _fk(plan: _Plan, q):
    """Level-synchronous FK: X_sc, X_sm [L, 7, E] in proc order
    (articulation.eval_fk; reference sim.py:1638-1711)."""
    E = q.shape[-1]
    X_jc = _joint_transforms(plan, q)
    X_pj = jnp.asarray(np.concatenate([g.X_pj for g in plan.groups], axis=0))
    X_local = _tmul(X_pj, X_jc)                              # [L, 7, E]

    acc = None
    for (s, e) in plan.levels:
        if s == 0:
            lvl = X_local[s:e]
            # roots: parent is the space frame (identity)
            acc = lvl
        else:
            X_sp = acc[plan.parent_row[s:e]]
            lvl = _tmul(X_sp, X_local[s:e])
            acc = jnp.concatenate([acc, lvl], axis=0)
    X_sc = acc if acc is not None else jnp.zeros((0, 7, E), q.dtype)
    X_sm = _tmul(X_sc, jnp.asarray(plan.X_cm))
    return X_sc, X_sm


_E6 = np.eye(6, dtype=np.float32)


def _motion_subspaces(plan: _Plan, q, X_sc):
    """Per-group S chunks ([n, cd, 6, E]) and joint twists v_j [L, 6, E]
    (articulation._motion_subspace / eval_id; sim.py:1323-1387)."""
    E = q.shape[-1]
    aug = jnp.concatenate([X_sc, _identity_transform_row(E, q.dtype)], axis=0)
    X_sp = aug[plan.parent_row]                              # [L, 7, E]
    X_pj = jnp.asarray(np.concatenate([g.X_pj for g in plan.groups], axis=0))
    X_sj = _tmul(X_sp, X_pj)

    S_chunks = []
    for g in plan.groups:
        n = g.stop - g.start
        sj = X_sj[g.start:g.stop]
        p = sj[:, 0:3, :]
        quat = sj[:, 3:7, :]
        if g.jtype == JOINT_REVOLUTE:
            w = _qrot(quat, jnp.asarray(g.axis))
            v = _cross(p, w)
            S = jnp.concatenate([w, v], axis=-2)[:, None]    # [n, 1, 6, E]
        elif g.jtype == JOINT_PRISMATIC:
            v = _qrot(quat, jnp.asarray(g.axis))
            S = jnp.concatenate([jnp.zeros_like(v), v], axis=-2)[:, None]
        elif g.jtype == JOINT_BALL:
            rows = []
            for k in range(3):
                ek = jnp.asarray(_E6[k][0:3].reshape(1, 3, 1))
                w = _qrot(quat, ek)
                rows.append(jnp.concatenate([w, _cross(p, w)], axis=-2))
            S = jnp.stack(rows, axis=1)                      # [n, 3, 6, E]
        elif g.jtype == JOINT_FREE:
            S = jnp.broadcast_to(
                jnp.asarray(_E6.reshape(1, 6, 6, 1)), (n, 6, 6, E))
        else:  # fixed
            S = jnp.zeros((n, 0, 6, E), q.dtype)
        S_chunks.append(S)
    return S_chunks, X_sj


def _id(plan: _Plan, model: Model, q, qd, X_sc, X_sm):
    """Velocity/bias-force sweep (articulation.eval_id; sim.py:1716-1789).
    Returns (S_chunks, v_s [L,6,E], body_f [L,6,E]) in proc order."""
    E = q.shape[-1]
    S_chunks, _ = _motion_subspaces(plan, q, X_sc)

    vj_parts = []
    for g, S in zip(plan.groups, S_chunks):
        n = g.stop - g.start
        if g.jtype == JOINT_FREE:
            vj_parts.append(qd[g.qd_idx])                    # [n, 6, E]
        elif g.jtype == JOINT_FIXED:
            vj_parts.append(jnp.zeros((n, 6, E), q.dtype))
        else:
            qd_g = qd[g.qd_idx]                              # [n, cd, E]
            vj_parts.append(jnp.sum(S * qd_g[:, :, None, :], axis=1))
    v_j = jnp.concatenate(vj_parts, axis=0)                  # [L, 6, E]

    v_acc = None
    a_acc = None
    for (s, e) in plan.levels:
        vj_lvl = v_j[s:e]
        if s == 0:
            v_lvl = vj_lvl
            a_lvl = _scross(v_lvl, vj_lvl)
            v_acc, a_acc = v_lvl, a_lvl
        else:
            pr = plan.parent_row[s:e]
            v_lvl = v_acc[pr] + vj_lvl
            a_lvl = a_acc[pr] + _scross(v_lvl, vj_lvl)
            v_acc = jnp.concatenate([v_acc, v_lvl], axis=0)
            a_acc = jnp.concatenate([a_acc, a_lvl], axis=0)

    I3 = jnp.asarray(plan.I3)
    m = jnp.asarray(plan.m)
    g_vec = np.asarray(model.gravity, np.float32).reshape(1, 3, 1)
    gm = jnp.asarray(g_vec) * m                              # [L, 3, 1]
    p_com = X_sm[:, 0:3, :]
    gm_b = jnp.broadcast_to(gm, p_com.shape)
    f_g = jnp.concatenate([_cross(p_com, gm_b), gm_b], axis=-2)

    Ia = _inertia_matvec(X_sm, I3, m, a_acc)
    Iv = _inertia_matvec(X_sm, I3, m, v_acc)
    body_f = Ia + _scross_dual(v_acc, Iv) - f_g
    return S_chunks, v_acc, body_f


def _contacts(plan: _Plan, X_sc, v_s):
    """Ground contacts (articulation.eval_ground_contacts;
    sim.py:1137-1206) -> per-link wrenches [L, 6, E] in proc order."""
    L = X_sc.shape[0]
    E = X_sc.shape[-1]
    if len(plan.contact_rows) == 0:
        return jnp.zeros((L, 6, E), X_sc.dtype)
    X = X_sc[plan.contact_rows]                              # [K, 7, E]
    v6 = v_s[plan.contact_rows]
    ke, kd, kf, mu = (jnp.asarray(plan.contact_mat[i]) for i in range(4))

    n_y = np.zeros((1, 3, 1), np.float32)
    n_y[0, 1, 0] = 1.0
    n_c = jnp.asarray(n_y)
    p = _tpoint(X, jnp.asarray(plan.contact_point)) - n_c * jnp.asarray(
        plan.contact_dist)
    w = v6[:, 0:3, :]
    v = v6[:, 3:6, :]
    dpdt = v + _cross(w, p)

    c = p[:, 1:2, :]                                         # [K, 1, E]
    vn = dpdt[:, 1:2, :]
    vt = dpdt - n_c * vn

    fn = c * ke
    fd = jnp.minimum(vn, 0.0) * kd * (-c)

    vt_len2 = jnp.sum(vt * vt, axis=-2, keepdims=True)
    safe = vt_len2 > 1e-12
    vt_len = jnp.sqrt(jnp.where(safe, vt_len2, 1.0))
    dirv = jnp.where(safe, vt / vt_len, 0.0)
    mag = jnp.minimum(kf * jnp.where(safe, vt_len, 0.0), -mu * c * ke)
    ft = dirv * mag

    f_total = n_c * (fn + fd) + ft
    f_total = jnp.where(c < 0.0, f_total, 0.0)
    t_total = _cross(p, f_total)

    wrench = jnp.concatenate([t_total, f_total], axis=-2)    # [K, 6, E]
    return jax.ops.segment_sum(
        wrench, jnp.asarray(plan.contact_rows), num_segments=L)


def _muscles(plan: _Plan, X_sc, muscle_act):
    """MTU muscle wrenches (articulation.eval_muscles; sim.py:1209-1265)
    -> [L, 6, E] proc order. muscle_act: [M, E]."""
    L = X_sc.shape[0]
    E = X_sc.shape[-1]
    if len(plan.seg_row0) == 0:
        return jnp.zeros((L, 6, E), X_sc.dtype)
    X0 = X_sc[plan.seg_row0]
    X1 = X_sc[plan.seg_row1]
    act = muscle_act[plan.seg_m][:, None, :]                 # [S, 1, E]
    pos0 = _tpoint(X0, jnp.asarray(plan.seg_r0))
    pos1 = _tpoint(X1, jnp.asarray(plan.seg_r1))
    n = _safe_normalize(pos1 - pos0)
    f = n * act
    w0 = jnp.concatenate([_cross(pos0, f), f], axis=-2)
    w1 = jnp.concatenate([_cross(pos1, f), f], axis=-2)
    out = jax.ops.segment_sum(
        -w0, jnp.asarray(plan.seg_row0), num_segments=L)
    return out + jax.ops.segment_sum(
        w1, jnp.asarray(plan.seg_row1), num_segments=L)


def _tau(plan: _Plan, q, qd, joint_act, S_chunks, body_f):
    """Joint-space torques (articulation.eval_tau; sim.py:1421-1502,
    1792-1842). Returns tau [D, E] in canonical dof order."""
    E = q.shape[-1]
    # subtree force accumulation: f_tot[i] = sum_{j in subtree(i)} body_f[j]
    f_tot = jnp.einsum(
        "ij,jke->ike", jnp.asarray(plan.subtree), body_f,
        precision=lax.Precision.HIGHEST)

    chunks = []
    for g, S in zip(plan.groups, S_chunks):
        n = g.stop - g.start
        if g.jtype == JOINT_FIXED:
            continue
        f_g = f_tot[g.start:g.stop]                          # [n, 6, E]
        if g.jtype == JOINT_FREE:
            chunks.append((-f_g).reshape(n * 6, E))
            continue
        Sf = jnp.sum(S * f_g[:, None, :, :], axis=-2)        # [n, cd, E]
        if g.jtype == JOINT_BALL:
            q_g = q[g.q_idx[:, 0:3]]                         # [n, 3, E]
            qd_g = qd[g.qd_idx]
            t = (-Sf - qd_g * g.target_kd[:, :, None]
                 - q_g * g.target_ke[:, :, None])
            chunks.append(t.reshape(n * 3, E))
        else:  # revolute / prismatic
            q_g = q[g.q_idx[:, 0]]                           # [n, E]
            qd_g = qd[g.qd_idx[:, 0]]
            act = joint_act[g.qd_idx[:, 0]]
            lower = jnp.asarray(g.lower)
            upper = jnp.asarray(g.upper)
            l_ke = jnp.asarray(g.limit_ke)
            limit_f = jnp.where(
                q_g < lower,
                l_ke * (lower - q_g),
                jnp.where(q_g > upper, l_ke * (upper - q_g), 0.0),
            )
            damping_f = -jnp.asarray(g.limit_kd) * qd_g
            t = (
                -Sf[:, 0, :]
                - jnp.asarray(g.target_ke) * (q_g - jnp.asarray(g.target))
                - jnp.asarray(g.target_kd) * qd_g
                + act
                + limit_f
                + damping_f
            )
            chunks.append(t)
    if not chunks:
        return jnp.zeros((0, E), q.dtype)
    return jnp.concatenate(chunks, axis=0)[plan.inv_dof_perm]


def _integrate(plan: _Plan, q, qd, qdd, dt):
    """Semi-implicit joint integration (articulation._integrate_joint;
    sim.py:1505-1636). Returns (q' [C,E], qd' [D,E]) canonical order."""
    E = q.shape[-1]
    q_chunks, qd_chunks = [], []
    for g in plan.groups:
        n = g.stop - g.start
        if g.jtype == JOINT_FIXED:
            continue
        if g.jtype in (JOINT_PRISMATIC, JOINT_REVOLUTE):
            qd_n = qd[g.qd_idx[:, 0]] + qdd[g.qd_idx[:, 0]] * dt
            q_chunks.append(q[g.q_idx[:, 0]] + qd_n * dt)
            qd_chunks.append(qd_n)
        elif g.jtype == JOINT_BALL:
            m_j = qdd[g.qd_idx]                              # [n, 3, E]
            w_j = qd[g.qd_idx]
            r_j = q[g.q_idx]                                 # [n, 4, E]
            w_n = w_j + m_j * dt
            w_quat = jnp.concatenate(
                [w_n, jnp.zeros((n, 1, E), q.dtype)], axis=-2)
            drdt = _qmul(w_quat, r_j) * 0.5
            r_n = _qnormalize(r_j + drdt * dt)
            q_chunks.append(r_n.reshape(n * 4, E))
            qd_chunks.append(w_n.reshape(n * 3, E))
        elif g.jtype == JOINT_FREE:
            m_s = qdd[g.qd_idx[:, 0:3]]
            a_s = qdd[g.qd_idx[:, 3:6]]
            w_s = qd[g.qd_idx[:, 0:3]] + m_s * dt
            v_s = qd[g.qd_idx[:, 3:6]] + a_s * dt
            p_s = q[g.q_idx[:, 0:3]]
            dpdt = v_s + _cross(w_s, p_s)
            r_s = q[g.q_idx[:, 3:7]]
            w_quat = jnp.concatenate(
                [w_s, jnp.zeros((n, 1, E), q.dtype)], axis=-2)
            drdt = _qmul(w_quat, r_s) * 0.5
            p_n = p_s + dpdt * dt
            r_n = _qnormalize(r_s + drdt * dt)
            q_chunks.append(
                jnp.concatenate([p_n, r_n], axis=-2).reshape(n * 7, E))
            qd_chunks.append(
                jnp.concatenate([w_s, v_s], axis=-2).reshape(n * 6, E))
    C = q.shape[0]
    D = qd.shape[0]
    q_new = (jnp.concatenate(q_chunks, axis=0)[plan.inv_coord_perm]
             if q_chunks else jnp.zeros((C, E), q.dtype))
    qd_new = (jnp.concatenate(qd_chunks, axis=0)[plan.inv_dof_perm]
              if qd_chunks else jnp.zeros((D, E), qd.dtype))
    return q_new, qd_new


def _chol_inverse_em(A):
    """Explicit SPD inverse, env-minor ([D, D, E]): unrolled
    Cholesky-Banachiewicz + row-substitution inverse on [E]-lane vectors
    (ops/linalg.py:cholesky_unrolled/chol_inverse transposed to env-minor
    so no [E, D, D] tile-padded intermediates are materialized)."""
    D = A.shape[0]
    rows = [[None] * D for _ in range(D)]
    for i in range(D):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                rows[i][j] = s / rows[j][j]
    # invert L by forward substitution, row-vectorized over [D, E] blocks
    inv_rows = []
    E = A.shape[-1]
    eye = np.eye(D, dtype=np.float32)
    for i in range(D):
        e = jnp.broadcast_to(jnp.asarray(eye[i])[:, None], (D, E))
        if i:
            prev = jnp.stack(inv_rows, axis=0)          # [i, D, E]
            Li = jnp.stack(rows[i][:i], axis=0)         # [i, E]
            e = e - jnp.sum(Li[:, None, :] * prev, axis=0)
        inv_rows.append(e / rows[i][i][None, :])
    Linv = jnp.stack(inv_rows, axis=0)                  # [D(row), D, E]
    return jnp.einsum(
        "kiE,kjE->ijE", Linv, Linv, precision=lax.Precision.HIGHEST)


def _mass_matrix_em(plan: _Plan, X_sm, S_chunks):
    """(H, Hinv) env-minor [D, D, E] in CANONICAL dof order via
    link-batched CRBA (articulation.eval_mass_matrix_factored values;
    reference sim.py:2475-2582 J/M/H pipeline).

    I^C accumulates over subtrees with one [L, L] mask contraction; every
    dof's force vector dots against all dofs at once with the static
    ancestor-pair mask choosing the valid triangle. Hinv follows the
    frozen-factor convention (stop_gradient + armature regularization,
    articulation._factorize_mass_matrix).
    """
    L = X_sm.shape[0]
    E = X_sm.shape[-1]
    I3 = jnp.asarray(plan.I3)
    m = jnp.asarray(plan.m)

    # per-link space-frame 6x6 inertia, columns via 6 factored matvecs
    # (gram form: exactly symmetric + reference-parity for non-unit quats)
    basis = np.eye(6, dtype=np.float32).reshape(6, 1, 6, 1)
    cols = [
        _inertia_gram_matvec(X_sm, I3, m, jnp.asarray(basis[k]))  # [L, 6, E]
        for k in range(6)
    ]
    I_s = jnp.stack(cols, axis=1)                       # [L, 6(col k), 6, E]

    # composite (subtree-summed) inertia per link: one mask contraction
    Ic = jnp.einsum(
        "ij,jkrE->ikrE", jnp.asarray(plan.subtree), I_s,
        precision=lax.Precision.HIGHEST)

    # S in chunk-dof order [D, 6, E]; U_d = I^C_{link(d)} S_d
    S_all = jnp.concatenate(
        [S.reshape(-1, 6, E) for S in S_chunks if S.shape[1]], axis=0)
    Icd = Ic[plan.dof_row]                              # [D, 6, 6, E]
    U = jnp.einsum(
        "dkE,dkrE->drE", S_all, Icd, precision=lax.Precision.HIGHEST)

    # A[e, d] = S_e . U_d, valid when link(e) is ancestor-or-self of
    # link(d); the mirrored triangle comes from A^T (I^C symmetric)
    A = jnp.einsum(
        "erE,drE->edE", S_all, U, precision=lax.Precision.HIGHEST)
    anc = jnp.asarray(plan.anc_pair)[:, :, None]
    H = jnp.where(anc, A, jnp.where(anc.transpose(1, 0, 2),
                                    jnp.swapaxes(A, 0, 1), 0.0))

    # chunk order -> canonical on both axes
    H = H[plan.inv_dof_perm][:, plan.inv_dof_perm]
    arm = jnp.asarray(plan.armature[plan.inv_dof_perm])  # canonical [D, 1]
    D = H.shape[0]
    reg = lax.stop_gradient(H) + jnp.asarray(
        np.eye(D, dtype=np.float32))[:, :, None] * arm[:, None, :]
    return H, _chol_inverse_em(reg)


def refresh_substep_lb(model: Model, q, qd, joint_act, muscle_act, dt):
    """One factorizing dynamics substep, fully link-batched env-minor:
    same chain as substep_lb plus the CRBA mass-matrix build + unrolled
    inverse (replacing the unrolled per-env refresh — the remaining
    compile-time and launch-count hotspot once cached substeps went lb).
    Returns (q', qd', H, Hinv) with H/Hinv env-minor [D, D, E]."""
    plan = _plan_for(model)
    X_sc, X_sm = _fk(plan, q)
    S_chunks, v_s, body_f = _id(plan, model, q, qd, X_sc, X_sm)
    if model.ground:
        body_f = body_f + _contacts(plan, X_sc, v_s)
    if muscle_act is not None and muscle_act.shape[0]:
        body_f = body_f + _muscles(plan, X_sc, muscle_act)
    tau = _tau(plan, q, qd, joint_act, S_chunks, body_f)
    H, Hinv = _mass_matrix_em(plan, X_sm, S_chunks)
    qdd = _solve_frozen_inv(H, Hinv, tau)
    q_new, qd_new = _integrate(plan, q, qd, qdd, dt)
    return q_new, qd_new, H, Hinv


def substep_lb(model: Model, q, qd, joint_act, muscle_act, dt, H, Hinv):
    """One cached dynamics substep, link-batched env-minor.

    q [C, E], qd/joint_act [D, E], muscle_act [M, E] | None,
    H/Hinv [D, D, E] (frozen factorization from the refresh substep).
    Same math + gradient conventions as articulation.articulation_substep
    with mass_cache set. Returns (q' [C, E], qd' [D, E]).
    """
    plan = _plan_for(model)
    X_sc, X_sm = _fk(plan, q)
    S_chunks, v_s, body_f = _id(plan, model, q, qd, X_sc, X_sm)
    if model.ground:
        body_f = body_f + _contacts(plan, X_sc, v_s)
    if muscle_act is not None and muscle_act.shape[0]:
        body_f = body_f + _muscles(plan, X_sc, muscle_act)
    tau = _tau(plan, q, qd, joint_act, S_chunks, body_f)
    qdd = _solve_frozen_inv(H, Hinv, tau)
    return _integrate(plan, q, qd, qdd, dt)


# --------------------------------------------------------------------------
# whole-batch simulate with the manual reverse pass over lb substeps
# --------------------------------------------------------------------------


def simulate_batched_lb(
    model: Model,
    joint_q,
    joint_qd,
    joint_act=None,
    muscle_act=None,
    dt: float = 1.0 / 60.0,
    substeps: int = 16,
    mass_matrix_freq: int = 1,
    reverse: str = "replay",
):
    """Whole-batch `simulate` on the link-batched env-minor substep.

    Same structure as articulation._simulate_manual (hand-written reverse
    pass: forward saves only (q, qd) per substep + (H, H^-1) per block;
    backward replays each substep under jax.vjp) with BOTH the cached and
    the factorizing substeps running the link-batched formulation — ~10x
    fewer, fatter XLA fusions on the launch-bound reverse path (module
    docstring), and the CRBA refresh (_mass_matrix_em) replacing the
    unrolled per-env mass-matrix build.

    joint_q [E, C], joint_qd/joint_act [E, D], muscle_act [E, M] | None.
    Articulations only. Returns (joint_q' [E, C], joint_qd' [E, D]).

    reverse:
      "replay"   — hand-written reverse scan; forward saves only (q, qd)
                   per substep + (H, H^-1) per block, backward replays each
                   substep under jax.vjp. Backward cost ~= recompute (1x
                   fwd) + transpose (~2x fwd). Minimal memory.
      "residual" — plain XLA autodiff through the substep scans: the
                   forward-of-grad saves each substep's intermediates as
                   residuals (all env-minor [k, E] rows — mild (8, 128)
                   padding, unlike the unrolled engine whose residual
                   traffic motivated the replay design), and the backward
                   reads them instead of replaying.

    Measured (v5e, 8-step Ant window, 4096 envs, mm_freq 16 —
    docs/PERF_NOTES.md round 5): "residual" runs the grad pass at 0.40x
    "replay" (176 vs 70 ms) — even env-minor, the residual HBM round-trip
    costs far more than replaying the substep inside the fused reverse
    kernel. Keep "replay" unless measuring; it is at the replay bound
    (backward-only ~2.5x forward).
    """
    if substeps % mass_matrix_freq != 0:
        raise ValueError("substeps must be a multiple of mass_matrix_freq")
    nblocks = substeps // mass_matrix_freq
    n_inner = mass_matrix_freq - 1
    h = dt / float(substeps)

    E = joint_q.shape[0]
    D = model.dof_count
    has_m = muscle_act is not None
    if joint_act is None:
        joint_act = jnp.zeros((E, D), dtype=jnp.float32)

    q_t0 = joint_q.T
    qd_t0 = joint_qd.T
    ja_t0 = joint_act.T
    ma_t0 = muscle_act.T if has_m else jnp.zeros((0, E), jnp.float32)

    def refresh_batch(q_t, qd_t, ja, ma):
        return refresh_substep_lb(
            model, q_t, qd_t, ja, ma if has_m else None, h)

    def cached_step(q_t, qd_t, ja, ma, H_t, Hinv_t):
        return substep_lb(
            model, q_t, qd_t, ja, ma if has_m else None, h, H_t, Hinv_t)

    def fwd_scan(q_t, qd_t, ja, ma):
        def block(carry, _):
            q0, qd0 = carry
            q1, qd1, H_t, Hinv_t = refresh_batch(q0, qd0, ja, ma)

            def inner(c, _):
                qt, qdt = c
                qn, qdn = cached_step(qt, qdt, ja, ma, H_t, Hinv_t)
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

    if reverse == "residual":
        # plain differentiable scan (no replay bookkeeping outputs): XLA's
        # autodiff saves each substep's env-minor intermediates as scan
        # residuals and the transpose reads them back
        def block_res(carry, _):
            q0, qd0 = carry
            q1, qd1, H_t, Hinv_t = refresh_batch(q0, qd0, ja_t0, ma_t0)

            def inner(c, _):
                qt, qdt = c
                return cached_step(qt, qdt, ja_t0, ma_t0, H_t, Hinv_t), None

            (qf, qdf), _ = lax.scan(inner, (q1, qd1), None, length=n_inner)
            return (qf, qdf), None

        (qf_t, qdf_t), _ = lax.scan(
            block_res, (q_t0, qd_t0), None, length=nblocks)
        return qf_t.T, qdf_t.T

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

        def block_bwd(carry, xs):
            gq, gqd, gja, gma = carry
            q0, qd0, qs_b, qds_b, H_t, Hinv_t = xs

            def inner_bwd(c, x):
                cq, cqd, cja, cma, cH = c
                qt, qdt = x
                _, vjp = jax.vjp(
                    lambda q_, qd_, ja_, ma_, H_: cached_step(
                        q_, qd_, ja_, ma_, H_, Hinv_t),
                    qt, qdt, ja, ma, H_t,
                )
                dq, dqd, dja, dma, dH = vjp((cq, cqd))
                return (dq, dqd, cja + dja, cma + dma, cH + dH), None

            if n_inner > 0:
                (gq, gqd, gja, gma, gH), _ = lax.scan(
                    inner_bwd,
                    (gq, gqd, gja, gma, jnp.zeros_like(H_t)),
                    (qs_b, qds_b), reverse=True)
            else:
                gH = jnp.zeros_like(H_t)

            def refresh_outs(q_tt, qd_tt, ja_tt, ma_tt):
                q1, qd1, H2, _ = refresh_batch(q_tt, qd_tt, ja_tt, ma_tt)
                return q1, qd1, H2

            _, vjp = jax.vjp(refresh_outs, q0, qd0, ja, ma)
            dq, dqd, dja, dma = vjp((gq, gqd, gH))
            return (dq, dqd, gja + dja, gma + dma), None

        zero = (g_q, g_qd, jnp.zeros_like(ja), jnp.zeros_like(ma))
        (gq, gqd, gja, gma), _ = lax.scan(
            block_bwd, zero, saved, reverse=True)
        return gq, gqd, gja, gma

    run.defvjp(run_fwd, run_bwd)
    qf_t, qdf_t = run(q_t0, qd_t0, ja_t0, ma_t0)
    return qf_t.T, qdf_t.T
