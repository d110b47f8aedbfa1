"""Debug / numerics flags — parity with the reference's module globals
(/root/reference/dflex/dflex/config.py:9-12 and their uses in adjoint.py).

The reference exposes three globals consumed by its kernel launcher:

- ``no_grad``    — skip tape recording. In JAX gradients are free unless you
                   call ``jax.grad``, so this is a documentation-level no-op
                   (kept for call-site compatibility).
- ``verify_fp``  — assert finiteness of every launch's inputs/outputs.
                   Enable with :func:`enable_fp_verification`, which turns on
                   ``jax_debug_nans``: any NaN produced by a jitted function
                   raises with the offending primitive (stronger than the
                   reference's per-launch checks).
- ``check_grad`` — run torch.autograd.gradcheck per launch. The JAX analog
                   is :func:`gradcheck`, a central-difference check usable on
                   any pure function (tests use it via tests/test_* FD
                   helpers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

no_grad = False
check_grad = False
verify_fp = False

# Which reverse pass envs use through the simulator:
# - "auto"   (default) — "lb" when the model qualifies (articulation-only,
#              substeps divisible by mm frequency), else "remat".
# - "lb"     — link-batched env-minor substeps with a hand-written reverse
#              scan (sim/articulation_lb.py). Measured 3.1x the manual
#              backward on TPU (docs/PERF_NOTES.md round 4).
# - "remat"  — autodiff through the substep scan with per-substep
#              jax.checkpoint (the general path; required for particles).
# - "manual" — hand-written reverse scan over unrolled per-env substeps
#              (sim/articulation.py:_simulate_manual).
# Same gradient values on every path; see docs/PERF_NOTES.md.
default_sim_backward = "auto"


def enable_fp_verification(enable: bool = True):
    """Raise on any NaN produced inside jitted computations."""
    global verify_fp
    verify_fp = enable
    jax.config.update("jax_debug_nans", enable)


def check_finite(*arrays, name: str = "") -> None:
    """Assert all arrays are finite (reference check_finite,
    adjoint.py:1916-1925)."""
    for i, a in enumerate(arrays):
        if a is None:
            continue
        if not bool(jnp.all(jnp.isfinite(a))):
            raise FloatingPointError(f"non-finite value in {name}[{i}]")


def gradcheck(f, args, eps: float = 1e-3, rtol: float = 5e-2,
              atol: float = 1e-3, argnums=0):
    """Central-difference gradient check of a scalar-valued pure function
    (the reference's per-launch torch.autograd.gradcheck analog,
    adjoint.py:2104-2108)."""
    analytic = jax.grad(f, argnums=argnums)(*args)
    x = np.asarray(args[argnums], dtype=np.float64)
    fd = np.zeros_like(x)
    flat = x.reshape(-1)
    for i in range(flat.size):
        xp, xm = flat.copy(), flat.copy()
        xp[i] += eps
        xm[i] -= eps

        def call(v):
            a = list(args)
            a[argnums] = jnp.asarray(v.reshape(x.shape), dtype=jnp.float32)
            return float(f(*a))

        fd.reshape(-1)[i] = (call(xp) - call(xm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(analytic), fd, rtol=rtol, atol=atol)
    return True
