"""Fused whole-substep Pallas kernels for the articulation cached substep.

Motivation (measured, docs/PERF_NOTES.md round 2): the substep BACKWARD under
XLA executes ~2,600 separate fusions per substep at ~0.65 us each — 9x the
forward's op count at identical per-op cost — so the gradient pass is
launch/scheduling-bound, not FLOP- or bandwidth-bound. The fix is structural:
run the WHOLE substep chain (fk -> id -> contacts -> muscles -> tau ->
solve -> integrate), and its VJP, as ONE Pallas kernel per env tile, so the
~10^3-op elementwise chain is scheduled inside a single Mosaic program.

Layout: envs live on the minor (8, 128) tile — inputs come in TRANSPOSED
[coord, E] form and are viewed as [coord, E/1024, 8, 128]; the kernel grid
iterates env tiles of 1024. Every per-env scalar of the single-env physics
code becomes one full (8, 128) VPU tile via a double vmap over the two minor
axes; per-coordinate quantities stack on leading (non-tiled) axes. Model
arrays (and every constant folded from them at trace time) are hoisted into
explicit kernel inputs by jax.closure_convert — Pallas kernels may not
capture array constants; the contact/muscle gather-scatter uses the
static_accum trace-time form (Mosaic has no scatter).

The backward kernel does not hand-derive adjoints: it traces ``jax.vjp`` of
the same single-env substep INSIDE the kernel, so the reference's gradient
conventions (frozen-factor solve via solve_frozen_inv's custom_vjp,
branch-picking min/max, clipped contacts) hold bit-for-bit with the XLA
autodiff paths. The reference analog of this file is the generated fused
CUDA kernel pair per physics op (/root/reference/dflex/dflex/adjoint.py
codegen, sim.py kernel bodies) — here one kernel covers the whole substep.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .articulation import articulation_substep
from .model import Model

SUB, LANE = 8, 128
TILE = SUB * LANE


def _interpret() -> bool:
    # real Mosaic on TPU; interpreter elsewhere (CPU tests)
    return jax.default_backend() != "tpu"


def _double_vmap(f):
    """Map a single-env function over the (sublane, lane) env tile: every
    per-env scalar becomes an [8, 128] tile, vectors stack on leading axes."""
    return jax.vmap(jax.vmap(f, in_axes=-1, out_axes=-1),
                    in_axes=-1, out_axes=-1)


def _tileize(x):
    """[k..., E] -> [k..., G, SUB, LANE] (free reshape: E is minor)."""
    e = x.shape[-1]
    return x.reshape(x.shape[:-1] + (e // TILE, SUB, LANE))


def _untileize(x):
    return x.reshape(x.shape[:-3] + (-1,))


def _spec(shape):
    """Block = full leading dims x one env tile."""
    nlead = len(shape) - 3
    block = shape[:nlead] + (1, SUB, LANE)

    def idx(g):
        return (0,) * nlead + (g, 0, 0)

    return pl.BlockSpec(block, idx)


def _sq(ref):
    """Load a [k..., 1, SUB, LANE] block and drop the grid axis."""
    x = ref[...]
    return x[..., 0, :, :]


def _closure_convert(batched_fn, arg_shapes):
    """Hoist every trace-time constant of `batched_fn` into explicit args.

    Pallas kernels may not capture materialized array constants (model
    fields and the jnp subexpressions constant-folded from them during
    tracing); jax.closure_convert rewrites the function so those constants
    become leading-order inputs we can feed through the grid as replicated
    VMEM blocks. Rank-0/1 constants are reshaped to (1, n) for TPU layout
    and restored inside the kernel.
    """
    from jax import core as jcore

    from ..ops.linalg import matvec_sum_form

    specs = [jax.ShapeDtypeStruct(s, jnp.float32) for s in arg_shapes]
    # trace under sum-form matvecs: double-vmapped dot_generals would carry
    # two batch dims, which Mosaic's tpu.matmul rejects on real hardware
    with matvec_sum_form():
        closed = jax.make_jaxpr(batched_fn)(*specs)
    consts = [jnp.asarray(c) for c in closed.consts]
    n_args = len(arg_shapes)

    def converted(*args_and_consts):
        args = args_and_consts[:n_args]
        cvals = args_and_consts[n_args:]
        out = jcore.eval_jaxpr(closed.jaxpr, list(cvals), *args)
        return tuple(out)

    # TPU block layout wants >=2-D arrays; flatten rank-0/1 consts to (1, n)
    shaped = [c.reshape(1, -1) if c.ndim < 2 else c for c in consts]
    orig_shapes = [c.shape for c in consts]

    def restore(flat_consts):
        return [
            f.reshape(s) if f.shape != tuple(s) else f
            for f, s in zip(flat_consts, orig_shapes)
        ]

    def const_spec(c):
        return pl.BlockSpec(c.shape, lambda g, _nd=c.ndim: (0,) * _nd)

    return converted, shaped, [const_spec(c) for c in shaped], restore


def _ex(x):
    """[k..., SUB, LANE] -> [k..., 1, SUB, LANE] for the output store."""
    return x[..., None, :, :]


def substep_forward_batched(model: Model, dt: float, q_t, qd_t, ja_t,
                            ma_t: Optional[jnp.ndarray], hinv_t):
    """One cached substep for the whole batch.

    q_t [C, E], qd_t/ja_t [D, E], ma_t [M, E] or None, hinv_t [D, D, E];
    E must be a multiple of 1024. Returns (q'_t [C, E], qd'_t [D, E]).
    """
    E = q_t.shape[-1]
    G = E // TILE
    C, D = q_t.shape[0], qd_t.shape[0]
    has_m = ma_t is not None

    # dummy 1-wide muscle input when absent (zero-size pallas blocks are
    # not representable; the arg is unused in that case)
    M = ma_t.shape[0] if has_m else 1

    def single(q, qd, ja, ma, hinv):
        qn, qdn, _ = articulation_substep(
            model, q, qd, ja, ma if has_m else None, dt,
            mass_cache=(hinv, hinv), static_accum=True,
        )
        return qn, qdn

    batched = _double_vmap(single)
    arg_shapes = [(C, SUB, LANE), (D, SUB, LANE), (D, SUB, LANE),
                  (M, SUB, LANE), (D, D, SUB, LANE)]
    converted, consts, const_specs, restore = _closure_convert(
        batched, arg_shapes)
    n_data = 4 + 1

    def kernel(*refs):
        data = refs[:n_data]
        cons = refs[n_data:n_data + len(consts)]
        qn_o, qdn_o = refs[n_data + len(consts):]
        cvals = restore([c[...] for c in cons])
        q, qd, ja, ma, hinv = [_sq(r) for r in data]
        qn, qdn = converted(q, qd, ja, ma, hinv, *cvals)
        qn_o[...] = _ex(qn)
        qdn_o[...] = _ex(qdn)

    ma_in = ma_t if has_m else jnp.zeros((1, E), jnp.float32)
    ins = [_tileize(q_t), _tileize(qd_t), _tileize(ja_t), _tileize(ma_in),
           _tileize(hinv_t)]

    out_shapes = (
        jax.ShapeDtypeStruct((C, G, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((D, G, SUB, LANE), jnp.float32),
    )
    qn, qdn = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[_spec(x.shape) for x in ins] + const_specs,
        out_specs=(_spec(out_shapes[0].shape), _spec(out_shapes[1].shape)),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*ins, *consts)
    return _untileize(qn), _untileize(qdn)


def substep_vjp_batched(model: Model, dt: float, q_t, qd_t, ja_t,
                        ma_t: Optional[jnp.ndarray], h_t, hinv_t,
                        gq_t, gqd_t):
    """VJP of one cached substep for the whole batch.

    Cotangents (gq_t [C, E], gqd_t [D, E]) w.r.t. the substep OUTPUTS;
    returns (dq [C,E], dqd [D,E], dja [D,E], dma [M,E] | None, dH [D,D,E]).
    The H cotangent follows solve_frozen_inv's convention (adj_H = -lam x^T,
    ops/linalg.py); Hinv is frozen.
    """
    E = q_t.shape[-1]
    G = E // TILE
    C, D = q_t.shape[0], qd_t.shape[0]
    has_m = ma_t is not None
    M = ma_t.shape[0] if has_m else 1

    def single_vjp(q, qd, ja, ma, h, hinv, gq, gqd):
        def f(q1, qd1, ja1, ma1, h1):
            qn, qdn, _ = articulation_substep(
                model, q1, qd1, ja1, ma1 if has_m else None, dt,
                mass_cache=(h1, hinv), static_accum=True,
            )
            return qn, qdn

        _, vjp = jax.vjp(f, q, qd, ja, ma, h)
        dq, dqd, dja, dma, dh = vjp((gq, gqd))
        return dq, dqd, dja, (dma if has_m else jnp.zeros_like(ma)), dh

    batched = _double_vmap(single_vjp)
    arg_shapes = [(C, SUB, LANE), (D, SUB, LANE), (D, SUB, LANE),
                  (M, SUB, LANE), (D, D, SUB, LANE), (D, D, SUB, LANE),
                  (C, SUB, LANE), (D, SUB, LANE)]
    converted, consts, const_specs, restore = _closure_convert(
        batched, arg_shapes)
    n_data = len(arg_shapes)

    def kernel(*refs):
        data = refs[:n_data]
        cons = refs[n_data:n_data + len(consts)]
        dq_o, dqd_o, dja_o, dma_o, dh_o = refs[n_data + len(consts):]
        cvals = restore([c[...] for c in cons])
        vals = [_sq(r) for r in data]
        dq, dqd, dja, dma, dh = converted(*vals, *cvals)
        dq_o[...] = _ex(dq)
        dqd_o[...] = _ex(dqd)
        dja_o[...] = _ex(dja)
        dma_o[...] = _ex(dma)
        dh_o[...] = _ex(dh)

    ma_in = ma_t if has_m else jnp.zeros((1, E), jnp.float32)
    ins = [_tileize(q_t), _tileize(qd_t), _tileize(ja_t), _tileize(ma_in),
           _tileize(h_t), _tileize(hinv_t), _tileize(gq_t), _tileize(gqd_t)]

    outs = (
        jax.ShapeDtypeStruct((C, G, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((D, G, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((D, G, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((M, G, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((D, D, G, SUB, LANE), jnp.float32),
    )
    res = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[_spec(x.shape) for x in ins] + const_specs,
        out_specs=tuple(_spec(o.shape) for o in outs),
        out_shape=outs,
        interpret=_interpret(),
    )(*ins, *consts)
    dq, dqd, dja, dma, dh = [_untileize(r) for r in res]
    return dq, dqd, dja, (dma if has_m else None), dh
