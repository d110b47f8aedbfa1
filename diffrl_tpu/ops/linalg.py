"""Dense linear algebra for joint-space dynamics.

The forward dynamics solve ``H qdd = tau`` uses a Cholesky factorization with
per-dof regularization (joint armature added to the diagonal,
/root/reference/dflex/dflex/matnn.h:140-168). The reference deliberately does
NOT differentiate through the factorization: the Cholesky backward is a nop
and the solve backward applies the implicit-function-theorem rule with L
frozen (matnn.h:310-336):

    lambda = (L L^T)^{-1} adj_x
    adj_b += lambda
    adj_A -= lambda x^T

``solve_frozen_chol`` reproduces exactly that gradient convention via
``jax.custom_vjp``; this matters for SHAC learning-curve parity because the
true Cholesky derivative has different (and costlier) structure.

H matrices are tiny (2..27 dofs) but batched over thousands of envs; we run
them in float32 with HIGHEST matmul precision so TPU MXU bf16 passes don't
perturb trajectory parity (see SURVEY.md "float32 determinism").
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
from jax import lax

# Trace-time switch for the small-matrix matvecs below. The default einsum
# form lowers to dot_general, which XLA handles well — but inside a fused
# Pallas substep kernel the physics is double-vmapped over the (8, 128) env
# tile, turning every [D, D] @ [D] into a dot_general with TWO batch dims,
# which Mosaic's tpu.matmul rejects ("Up to 1 batch dim supported"). With
# the flag set (sim/pallas_substep.py traces kernel bodies under
# ``matvec_sum_form()``), matvecs trace as broadcast-multiply + reduce —
# pure VPU ops Mosaic schedules fine. D <= ~30, so no MXU is lost.
_SUM_FORM = contextvars.ContextVar("matvec_sum_form", default=False)


@contextlib.contextmanager
def matvec_sum_form():
    # ContextVar (not a module global): thread-safe, and a concurrent trace
    # from another thread during the with-block keeps the einsum form.
    token = _SUM_FORM.set(True)
    try:
        yield
    finally:
        _SUM_FORM.reset(token)


def matvec_small(A, b):
    """[..., D, D] @ [..., D] -> [..., D]; form chosen at trace time."""
    if _SUM_FORM.get():
        return jnp.sum(A * b[..., None, :], axis=-1)
    return jnp.einsum("...ij,...j->...i", A, b)


def chol_regularized(H, reg):
    """Cholesky of (H + diag(reg)); reg is the per-dof armature vector."""
    A = H + jnp.diag(reg) if H.ndim == 2 else H + jax.vmap(jnp.diag)(reg)
    return lax.linalg.cholesky(A, symmetrize_input=False)


def cholesky_unrolled(A):
    """Cholesky of small SPD matrices, unrolled over the (static) dimension.

    On TPU ``lax.linalg.cholesky`` lowers to a slow sequential custom call
    per batch element; profiling the Ant step showed it costing ~15% of a
    whole 16-substep env step. Joint-space H is tiny (2..27 dofs), so an
    unrolled Cholesky-Banachiewicz in plain jnp turns it into a few hundred
    fuseable VPU ops over the env batch.

    A: [..., D, D] -> lower-triangular L with the same gradient behavior as
    the formulaic factorization (we only use it under stop_gradient /
    frozen-factor conventions anyway).
    """
    D = A.shape[-1]
    # rows[i][j] = scalar [...]-shaped entries of L
    rows = [[None] * D for _ in range(D)]
    for i in range(D):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                rows[i][j] = s / rows[j][j]
    zero = jnp.zeros_like(A[..., 0, 0])
    cols = [
        jnp.stack([rows[i][j] if j <= i else zero for j in range(D)], axis=-1)
        for i in range(D)
    ]
    return jnp.stack(cols, axis=-2)


def chol_inverse(A):
    """Explicit inverse of small SPD matrices via unrolled Cholesky.

    Factor once per mass-matrix refresh, then every substep's solve is a
    single [E, D, D] x [E, D] matvec the MXU eats — replacing two
    triangular-solve custom calls per substep.
    """
    D = A.shape[-1]
    L = cholesky_unrolled(A)
    # invert L by row-vectorized forward substitution (one einsum per row —
    # a fully scalar-unrolled version is O(D^3) graph ops and blows up
    # compile time for D ~ 27), then A^-1 = L^-T L^-1.
    eye = jnp.eye(D, dtype=A.dtype)
    batch_shape = A.shape[:-2]
    rows = []
    for i in range(D):
        e = jnp.broadcast_to(eye[i], batch_shape + (D,))
        if i:
            prev = jnp.stack(rows, axis=-2)  # [..., i, D]
            s = e - jnp.einsum("...k,...kd->...d", L[..., i, :i], prev)
        else:
            s = e
        rows.append(s / L[..., i, i][..., None])
    Linv = jnp.stack(rows, axis=-2)
    return jnp.einsum("...ki,...kj->...ij", Linv, Linv)


@jax.custom_vjp
def solve_frozen_inv(H, Hinv, b):
    """x = Hinv @ b with the reference's frozen-factor gradient convention
    (matnn.h:310-336): the factorization/inverse carries no gradient;
    adj_b = Hinv g, adj_H = -(Hinv g) x^T.
    """
    del H
    return matvec_small(Hinv, b)


def _solve_inv_fwd(H, Hinv, b):
    x = matvec_small(Hinv, b)
    return x, (Hinv, x)


def _solve_inv_bwd(res, g):
    Hinv, x = res
    lam = matvec_small(Hinv, g)
    adj_b = lam
    adj_H = -lam[..., :, None] * x[..., None, :]
    adj_Hinv = jnp.zeros_like(Hinv)
    return adj_H, adj_Hinv, adj_b


solve_frozen_inv.defvjp(_solve_inv_fwd, _solve_inv_bwd)


def cho_solve_lower(L, b):
    """Solve (L L^T) x = b given lower-triangular L. Supports batched dims."""
    y = lax.linalg.triangular_solve(
        L, b[..., None], left_side=True, lower=True, transpose_a=False
    )
    x = lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0]


@jax.custom_vjp
def solve_frozen_chol(H, L, b):
    """x = (L L^T)^{-1} b with the reference's frozen-L gradient convention.

    H participates only in the backward pass (adj_H = -lambda x^T); the primal
    uses the cached factor L, which may be stale when mass-matrix caching is
    active (sim.py:2107-2113 MM_caching_frequency semantics).
    """
    del H
    return cho_solve_lower(L, b)


def _solve_fwd(H, L, b):
    x = cho_solve_lower(L, b)
    return x, (L, x)


def _solve_bwd(res, g):
    L, x = res
    lam = cho_solve_lower(L, g)
    adj_b = lam
    adj_H = -lam[..., :, None] * x[..., None, :]
    adj_L = jnp.zeros_like(L)
    return adj_H, adj_L, adj_b


solve_frozen_chol.defvjp(_solve_fwd, _solve_bwd)
