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
    # real Mosaic on TPU; interpreter elsewhere (CPU tests).
    # DIFFRL_PALLAS_AOT=1 forces compiled (Mosaic) lowering regardless of the
    # default backend so a deviceless TPU-topology AOT compile
    # (tools/pallas_aot_check.py) exercises real Mosaic from a CPU host.
    import os

    if os.environ.get("DIFFRL_PALLAS_AOT") == "1":
        return False
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


def _assert_mosaic_compatible_dots(jaxpr):
    """Trace-time guard: no dot_general with >=2 batch dims in the kernel.

    CPU tests run pallas_call with interpret=True, which happily executes
    any dot_general — but real Mosaic rejects >=2 batch dims ("Up to 1
    batch dim supported"). A jnp.matmul/einsum added anywhere in the
    substep chain would otherwise pass CI and fail only at TPU compile
    time; this walk catches the regression on CPU (ADVICE round 2).
    """
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            (_, _), (lhs_batch, _) = eqn.params["dimension_numbers"]
            if len(lhs_batch) >= 2:
                raise ValueError(
                    "substep kernel contains a dot_general with "
                    f"{len(lhs_batch)} batch dims; Mosaic supports at most "
                    "1. Use ops.linalg.matvec_small (sum form) instead of "
                    "einsum/@ inside the substep chain.")
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                _assert_mosaic_compatible_dots(sub.jaxpr)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        _assert_mosaic_compatible_dots(s.jaxpr)


def _closure_convert(single_fn, single_arg_shapes):
    """Hoist the single-env function's constants; consts tile like data.

    Three constraints shape this (all found via the deviceless AOT compile,
    tools/pallas_aot_check.py):

    - Pallas kernels may not capture materialized array constants, so model
      fields (and every jnp subexpression constant-folded from them during
      tracing) must become explicit kernel inputs. make_jaxpr + eval_jaxpr
      hoists exactly that frontier (jax.closure_convert hoists only
      closed-over TRACERS, leaving concrete model constants captured).
    - Mosaic cannot broadcast a VMEM value across both sublanes and lanes
      ("Broadcast in both sublanes and lanes: Not implemented"), so a
      natural-shape constant meeting an env-tiled value inside the kernel
      fails to lower. Fix: double-vmap over args AND consts alike, feeding
      each const pre-broadcast to [k..., SUB, LANE]. Every in-kernel op is
      then tile-elementwise; no broadcasts remain.
    - That pre-broadcast must NOT run eagerly at trace time: ops on
      concrete constants execute immediately under tracing, and multi-MB
      materialized tiles then lower as dense MLIR literals — ir_constant
      alone took >3 min for a 2-dof robot. ``tile_consts`` below makes the
      broadcast an equation by adding a tracer-derived zero tile, and the
      caller hoists it OUTSIDE the substep scans so it runs once per call.

    Returns (batched_fn(args..., *consts), raw_consts, const_specs).
    """
    from jax import core as jcore

    from ..ops.linalg import matvec_sum_form

    specs = [jax.ShapeDtypeStruct(s, jnp.float32) for s in single_arg_shapes]
    # trace under sum-form matvecs: double-vmapped dot_generals would carry
    # two batch dims, which Mosaic's tpu.matmul rejects on real hardware
    with matvec_sum_form():
        closed = jax.make_jaxpr(single_fn)(*specs)
    consts = [jnp.asarray(c) for c in closed.consts]
    n_args = len(single_arg_shapes)

    for c in consts:
        if c.dtype == jnp.bool_:
            # i1 VMEM blocks don't lower; masks must stay float/compares
            raise ValueError(
                "bool constant reached the pallas substep kernel; rewrite "
                "the producing op to compare floats in-kernel instead")

    def converted(*args_and_consts):
        args = args_and_consts[:n_args]
        cvals = args_and_consts[n_args:]
        return tuple(jcore.eval_jaxpr(closed.jaxpr, list(cvals), *args))

    batched = _double_vmap(converted)

    # trace-time Mosaic guard (CPU interpret mode would hide these)
    guard_avals = (
        [jax.ShapeDtypeStruct(s + (SUB, LANE), jnp.float32)
         for s in single_arg_shapes]
        + [jax.ShapeDtypeStruct(c.shape + (SUB, LANE), c.dtype)
           for c in consts])
    with matvec_sum_form():
        _assert_mosaic_compatible_dots(
            jax.make_jaxpr(batched)(*guard_avals).jaxpr)

    def const_spec(c):
        nd = c.ndim + 2
        return pl.BlockSpec(c.shape + (SUB, LANE),
                            lambda g, _nd=nd: (0,) * _nd)

    return batched, consts, [const_spec(c) for c in consts]


def tile_consts(consts, like_tracer):
    """Broadcast each const to [k..., SUB, LANE] WITHOUT eager expansion.

    ``like_tracer`` is any env-tiled data tracer ([k, E]); adding a zero
    tile derived from it keeps the broadcast an equation in the traced
    computation (a pure jnp.broadcast_to of a concrete const would execute
    eagerly and bake a multi-MB dense literal into the MLIR). Call ONCE per
    simulate call, outside the substep scans, so the materialized tiles are
    loop-invariant scan inputs, not per-substep recomputes.
    """
    zero = (like_tracer.ravel()[:TILE] * 0.0).reshape(SUB, LANE)
    return [c[..., None, None] + zero.astype(c.dtype) for c in consts]


def _ex(x):
    """[k..., SUB, LANE] -> [k..., 1, SUB, LANE] for the output store."""
    return x[..., None, :, :]


def prepare_substep_forward(model: Model, dt: float, C: int, D: int,
                            M: int, has_m: bool):
    """Trace + closure-convert the forward substep once (reusable prep)."""

    def single(q, qd, ja, ma, hinv):
        qn, qdn, _ = articulation_substep(
            model, q, qd, ja, ma if has_m else None, dt,
            mass_cache=(hinv, hinv), static_accum=True,
        )
        return qn, qdn

    return _closure_convert(single, [(C,), (D,), (D,), (M,), (D, D)])


def prepare_substep_vjp(model: Model, dt: float, C: int, D: int,
                        M: int, has_m: bool):
    """Trace + closure-convert the substep VJP once (reusable prep)."""

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

    return _closure_convert(
        single_vjp, [(C,), (D,), (D,), (M,), (D, D), (D, D), (C,), (D,)])


def substep_forward_batched(model: Model, dt: float, q_t, qd_t, ja_t,
                            ma_t: Optional[jnp.ndarray], hinv_t,
                            prep=None, tiled_consts=None):
    """One cached substep for the whole batch.

    q_t [C, E], qd_t/ja_t [D, E], ma_t [M, E] or None, hinv_t [D, D, E];
    E must be a multiple of 1024. Returns (q'_t [C, E], qd'_t [D, E]).
    ``prep``/``tiled_consts`` (from prepare_substep_forward/tile_consts)
    let callers hoist the trace and the const tiling out of scans.
    """
    E = q_t.shape[-1]
    G = E // TILE
    C, D = q_t.shape[0], qd_t.shape[0]
    has_m = ma_t is not None

    # dummy 1-wide muscle input when absent (zero-size pallas blocks are
    # not representable; the arg is unused in that case)
    M = ma_t.shape[0] if has_m else 1

    if prep is None:
        prep = prepare_substep_forward(model, dt, C, D, M, has_m)
    batched, consts, const_specs = prep
    if tiled_consts is None:
        tiled_consts = tile_consts(consts, q_t)
    n_data = 4 + 1

    def kernel(*refs):
        data = refs[:n_data]
        cons = refs[n_data:n_data + len(consts)]
        qn_o, qdn_o = refs[n_data + len(consts):]
        cvals = [c[...] for c in cons]
        q, qd, ja, ma, hinv = [_sq(r) for r in data]
        qn, qdn = batched(q, qd, ja, ma, hinv, *cvals)
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
    )(*ins, *tiled_consts)
    return _untileize(qn), _untileize(qdn)


def substep_vjp_batched(model: Model, dt: float, q_t, qd_t, ja_t,
                        ma_t: Optional[jnp.ndarray], h_t, hinv_t,
                        gq_t, gqd_t, prep=None, tiled_consts=None):
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

    if prep is None:
        prep = prepare_substep_vjp(model, dt, C, D, M, has_m)
    batched, consts, const_specs = prep
    if tiled_consts is None:
        tiled_consts = tile_consts(consts, q_t)
    n_data = 8

    def kernel(*refs):
        data = refs[:n_data]
        cons = refs[n_data:n_data + len(consts)]
        dq_o, dqd_o, dja_o, dma_o, dh_o = refs[n_data + len(consts):]
        cvals = [c[...] for c in cons]
        vals = [_sq(r) for r in data]
        dq, dqd, dja, dma, dh = batched(*vals, *cvals)
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
    )(*ins, *tiled_consts)
    dq, dqd, dja, dma, dh = [_untileize(r) for r in res]
    return dq, dqd, dja, (dma if has_m else None), dh
