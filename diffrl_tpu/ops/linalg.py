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

import jax
import jax.numpy as jnp
from jax import lax


def chol_regularized(H, reg):
    """Cholesky of (H + diag(reg)); reg is the per-dof armature vector."""
    A = H + jnp.diag(reg) if H.ndim == 2 else H + jax.vmap(jnp.diag)(reg)
    return lax.linalg.cholesky(A, symmetrize_input=False)


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
