"""Executor: builds the jitted time-marching callable from a Schedule.

TPU-native replacement for the reference's generated C time loop + JIT
toolchain (devito/arch/compiler.py jit_compile:376, operator.py apply:956):
the whole hot loop — time marching, stencil updates, source injection,
receiver interpolation — is one `lax.fori_loop` inside one `jax.jit`, with
buffer donation so XLA updates state in-place in HBM.

Rolling time buffers (SteppingDimension semantics) are carried as a tuple
of per-slot arrays and rotated *statically* each iteration (register
renaming), so the hot path contains no dynamic time indexing at all — the
functional analog of the reference's modulo-indexed buffers
(ir/clusters/algorithms.py Stepper), but XLA-alias-friendly.
"""

from collections import OrderedDict

import numpy as np

from ..ir.lowering import LoweredEq, LoweredSparse
from ..exceptions import CompilationError

__all__ = ['build_runner']


def _write_region_slices(eq):
    """Padded-buffer slices for the write region of a dense eq."""
    fn = eq.target
    slices = []
    for (start, stop), (hl, hr) in zip(eq.region, fn.halo):
        slices.append(slice(hl + start, hl + stop))
    return tuple(slices)


def _region_map(eq):
    """{dim name: (start, length)} for the translator."""
    fn = eq.target
    return OrderedDict(
        (d.name, (start, stop - start))
        for d, (start, stop) in zip(fn.space_dimensions, eq.region))


class StepContextMixin:
    """Resolution of stepping-buffer slots shared by the exec functions."""

    @staticmethod
    def slot_pos(k, nslots, direction):
        if direction >= 0:
            return (nslots - 2 + k) % nslots
        return (nslots - 2 - k) % nslots


def _resolve_time_indexed(bufs, fn, tk, toff, t, direction):
    """Return the (3-d or lower) array for a time-resolved access."""
    import jax
    buf = bufs[fn.name]
    if tk is None:
        return buf
    if tk == 'stepping':
        slots = buf  # tuple of per-slot arrays
        return slots[StepContextMixin.slot_pos(toff, len(slots), direction)]
    if tk == 'save':
        return jax.lax.dynamic_index_in_dim(buf, t + toff, 0, keepdims=False)
    if tk == 'cond':
        factor = fn.dimensions[0].factor or 1
        return jax.lax.dynamic_index_in_dim(buf, t // factor + toff, 0,
                                            keepdims=False)
    raise CompilationError(f"Bad time access kind {tk}")


def _use_pallas():
    import jax
    from ..parameters import configuration
    from . import pallas_backend as pb
    mode = configuration['backend']
    if mode == 'xla':
        return False, False
    on_cpu = jax.default_backend() == 'cpu'
    if mode == 'pallas':
        return True, on_cpu  # interpret off-TPU
    # auto: pallas on accelerators only, and only if the structure probe
    # compiles on this chip (Mosaic feature coverage varies by generation)
    if on_cpu:
        return False, False
    return pb.validate_backend(), False


def _target_prev(eq, bufs, t, direction):
    """Current (pre-update) content of the buffer slot ``eq`` writes."""
    import jax
    name = eq.target.name
    tk = eq.time_kind
    if tk == 'stepping':
        slots = bufs[name]
        pos = StepContextMixin.slot_pos(eq.time_off, len(slots), direction)
        return slots[pos]
    buf = bufs[name]
    if tk == 'save':
        return jax.lax.dynamic_index_in_dim(buf, t + eq.time_off, 0,
                                            keepdims=False)
    if tk == 'cond':
        factor = eq.cond_factor or 1
        return jax.lax.dynamic_index_in_dim(buf, t // factor + eq.time_off,
                                            0, keepdims=False)
    return buf


def _exec_dense(eq, bufs, params, t, direction):
    import jax
    import jax.numpy as jnp
    from .translate import translate, DenseCtx
    from ..ir.lowering import time_access_of

    fn = eq.target
    name = fn.name

    use, interpret = _use_pallas()
    val = None
    val_fullz = False
    if use and t is not None:
        from . import pallas_backend as pb
        plan = eq.__dict__.get('_pallas_plan', '?')
        if plan == '?':
            plan = pb.plan_for(eq, None)
            eq._pallas_plan = plan
        if plan is not None:
            resolved = [
                _resolve_time_indexed(bufs, g['fn'], g['tk'], g['toff'], t,
                                      direction)
                for g in plan.groups]
            tp = None
            if plan.fullz:
                # pre-update content of the slot being written: lets the
                # kernel emit complete lane rows so the DUS below is
                # lane-aligned (a z-offset DUS costs a cross-lane rotation
                # of the whole buffer)
                tp = _target_prev(eq, bufs, t, direction)
            val = pb.execute_plan(plan, resolved, params, interpret,
                                  target_prev=tp)
            val_fullz = plan.fullz and tp is not None

    if val is None:
        ctx = DenseCtx(bufs, params, _region_map(eq), t=t,
                       direction=direction)
        val = translate(eq.rhs, ctx)
    else:
        ctx = DenseCtx(bufs, params, _region_map(eq), t=t,
                       direction=direction)

    slices = _write_region_slices(eq)
    if val_fullz:
        # kernel output carries full lane rows (halo lanes passed through)
        slices = slices[:-1] + (slice(0, eq.target.shape_allocated[-1]),)
    region_shape = tuple(s.stop - s.start for s in slices)

    tk = eq.time_kind
    out = dict(bufs)

    if tk == 'stepping':
        slots = list(bufs[name])
        pos = StepContextMixin.slot_pos(eq.time_off, len(slots), direction)
        target_arr = slots[pos]

        def _current():
            return target_arr[slices]

        val = _finalize_val(eq, val, _current, ctx, region_shape,
                            target_arr.dtype, jnp)
        slots[pos] = target_arr.at[slices].set(val)
        out[name] = tuple(slots)
        return out

    buf = bufs[name]
    if tk == 'save':
        tidx = t + eq.time_off
    elif tk == 'cond':
        factor = eq.cond_factor or 1
        tidx = t // factor + eq.time_off
    else:
        tidx = None

    def _current():
        if tidx is None:
            return buf[slices]
        cur = jax.lax.dynamic_index_in_dim(buf, tidx, 0, keepdims=False)
        return cur[slices]

    val = _finalize_val(eq, val, _current, ctx, region_shape, buf.dtype, jnp)

    def _write(b):
        if tidx is None:
            return b.at[slices].set(val)
        return b.at[(tidx,) + slices].set(val)

    if tk == 'cond' and (eq.cond_factor or 1) > 1:
        factor = eq.cond_factor
        buf = jax.lax.cond(jnp.mod(t, factor) == 0, _write, lambda b: b, buf)
    else:
        buf = _write(buf)
    out[name] = buf
    return out


def _finalize_val(eq, val, current, ctx, region_shape, dtype, jnp):
    from .translate import translate
    if eq.reduction == 'max':
        val = jnp.maximum(current(), val)
    elif eq.reduction == 'min':
        val = jnp.minimum(current(), val)
    elif eq.increment:
        val = current() + val
    if eq.condition is not None:
        cond = translate(eq.condition, ctx)
        val = jnp.where(cond, val, current())
    return jnp.broadcast_to(val, region_shape).astype(dtype)


def _sparse_geometry(sf, bufs, params):
    """Compute corner indices {dim: (C, P) int arrays, domain coords,
    clipped} and weights (C, P) for a sparse function's interpolation
    stencil. Positions derive from the runtime coordinates buffer
    (reference: WeightedInterpolator, operations/interpolators.py:210)."""
    import jax.numpy as jnp
    from itertools import product

    fn = sf
    grid = fn.grid
    interp = fn.interpolator
    dims = grid.dimensions

    per_dim = []
    valid = None
    if getattr(interp, 'name', '') in ('precomputed', 'matrix'):
        # gridpoints + coefficient tables supplied by the user
        # (reference: PrecomputedInterpolator:555 / MatrixSparseTimeFunction)
        r = interp.r
        for j, d in enumerate(dims):
            n = grid.shape[j]
            offsets, coeffs, gp = interp.dim_weights_precomputed(j)
            if interp.name == 'precomputed':
                # sample points are gridpoint + (i - r + 1), i in [0, 2r)
                # (reference sinc/precomputed convention)
                offsets = [i - r + 1 for i in range(coeffs.shape[1])]
            # matrix convention: gridpoint is the MINIMUM index,
            # offsets 0..r-1 (reference docstring)
            wlist = [coeffs[:, i] for i in range(coeffs.shape[1])]
            v = (gp >= 0) & (gp <= n - 1)
            valid = v if valid is None else (valid & v)
            per_dim.append((d, offsets, wlist, gp, n))
    else:
        coords = bufs[f"{fn.name}_coords"]
        for j, d in enumerate(dims):
            h = params.get(d.spacing.name, grid.spacing[j])
            o = grid.origin[j]
            n = grid.shape[j]
            px = (coords[:, j] - o) / h  # position in grid points (P,)
            offsets, wlist, base = interp.dim_weights(px)
            v = (px >= 0) & (px <= n - 1)
            valid = v if valid is None else (valid & v)
            per_dim.append((d, offsets, wlist, base, n))

    corner_idx = {d.name: [] for d, *_ in per_dim}
    weights = []
    ranges = [range(len(off)) for _, off, _, _, _ in per_dim]
    for combo in product(*ranges):
        w = None
        for (d, offsets, wlist, base, n), c in zip(per_dim, combo):
            idx = jnp.clip(base + offsets[c], 0, n - 1)
            corner_idx[d.name].append(idx)
            w = wlist[c] if w is None else w * wlist[c]
        weights.append(w)
    W = jnp.stack(weights)  # (C, P)
    W = W * valid.astype(W.dtype)
    idxs = {k: jnp.stack(v) for k, v in corner_idx.items()}  # (C, P)
    return idxs, W


def _exec_sparse(item, bufs, params, t, geom_cache, direction):
    import jax.numpy as jnp
    from .translate import translate, SparseCtx

    sf = item.sparse
    key = sf.name
    if key not in geom_cache:
        geom_cache[key] = _sparse_geometry(sf, bufs, params)
    corner_idx, W = geom_cache[key]

    ctx = SparseCtx(bufs, params, corner_idx, W, sf, t=t,
                    direction=direction)
    val = translate(item.expr, ctx)  # (C, P) or (P,) or scalar
    matrix = getattr(type(sf), '_matrix', None)

    out = dict(bufs)
    if item.kind == 'interp':
        if hasattr(val, 'ndim') and val.ndim == 2:
            res = jnp.sum(W * val, axis=0)
        else:
            res = jnp.sum(W, axis=0) * val
        if matrix is not None:
            # channels = M^T @ per-location values
            res = jnp.asarray(matrix).T @ res
        buf = bufs[sf.name]
        res = jnp.broadcast_to(res, buf.shape[-1:]).astype(buf.dtype)
        if sf.is_SparseTimeFunction:
            tidx = t + item.target_time_off
            if item.increment:
                buf = buf.at[tidx, :].add(res)
            else:
                buf = buf.at[tidx, :].set(res)
        else:
            buf = buf.at[:].set(res) if not item.increment \
                else buf.at[:].add(res)
        out[sf.name] = buf
    else:  # inject
        field = item.field
        sidx = tuple(corner_idx[d.name] + hl
                     for d, (hl, hr) in zip(field.space_dimensions,
                                            field.halo))
        if matrix is not None:
            # per-location values = M @ channel values
            val = jnp.asarray(matrix) @ jnp.broadcast_to(
                val, (matrix.shape[1],))
        if item.field_time_kind == 'stepping':
            slots = list(bufs[field.name])
            pos = StepContextMixin.slot_pos(item.field_time_off or 0,
                                           len(slots), direction)
            contrib = (W * val).astype(slots[pos].dtype)
            slots[pos] = slots[pos].at[sidx].add(contrib)
            out[field.name] = tuple(slots)
            return out
        buf = bufs[field.name]
        contrib = (W * val).astype(buf.dtype)
        if item.field_time_kind == 'save':
            tidx = t + item.field_time_off
            buf = buf.at[(tidx,) + sidx].add(contrib)
        else:
            buf = buf.at[sidx].add(contrib)
        out[field.name] = buf
    return out


def build_runner(schedule, write_names, stepping_info=None, errctl=None):
    """Build ``run(wbufs, rbufs, params, time_m, time_M) -> wbufs``.

    ``stepping_info``: {fn name: nslots} for rolling-buffer TimeFunctions;
    their (nslots, ...) canonical arrays are decomposed into per-slot
    tuples around the loop and rotated statically inside it.

    ``errctl``: name of a stepping TimeFunction to stability-scan every 100
    steps inside the loop (reference: passes/iet/errors.py:79 — the C
    codegen emits ``if (t % 100 == 0) if (!isfinite(sum)) break``); here the
    flag rides the fori_loop carry and turns the remaining iterations into
    no-ops via lax.cond, and apply() raises ExecutionError.

    Only the written buffers are carried through the time loop (and donated
    by the Operator's jit); read-only buffers are loop-invariant closures.
    """
    import jax

    stepping_info = stepping_info or {}
    direction = schedule.direction
    forward = direction >= 0

    def _exec_items(items, bufs, params, t, geom_cache):
        for it in items:
            if isinstance(it, LoweredEq):
                bufs = _exec_dense(it, bufs, params, t, direction)
            elif isinstance(it, LoweredSparse):
                bufs = _exec_sparse(it, bufs, params, t, geom_cache,
                                    direction)
            else:
                raise CompilationError(f"Cannot execute {it}")
        return bufs

    def _decompose(bufs, t0):
        """Split stepping buffers into logical-time-ordered slot tuples.
        Slot i of the tuple corresponds to canonical row computed from t0
        so that `.data`'s modulo-row convention is preserved."""
        out = dict(bufs)
        for name, m in stepping_info.items():
            if name not in out:
                continue
            buf = out[name]
            slots = []
            for i in range(m):
                if forward:
                    # tuple position i <-> time t0 + 1 + (i - (m - 1))
                    tau = t0 + 1 + i - (m - 1)
                else:
                    # backward: position i <-> time t0 - 1 + (m - 1) - i
                    tau = t0 - 1 + (m - 1) - i
                row = jax.numpy.mod(tau, m)
                slots.append(jax.lax.dynamic_index_in_dim(
                    buf, row, 0, keepdims=False))
            out[name] = tuple(slots)
        return out

    def _recompose(bufs, t_end):
        """Write slot tuples back into canonical (m, ...) arrays."""
        out = dict(bufs)
        for name, m in stepping_info.items():
            if name not in out or not isinstance(out[name], tuple):
                continue
            slots = out[name]
            base = None
            for i, s in enumerate(slots):
                if forward:
                    tau = t_end + 1 + i - (m - 1)
                else:
                    tau = t_end - 1 + (m - 1) - i
                row = jax.numpy.mod(tau, m)
                if base is None:
                    base = jax.numpy.zeros((m,) + s.shape, s.dtype)
                base = jax.lax.dynamic_update_index_in_dim(
                    base, s, row, 0)
            out[name] = base
        return out

    def run(wbufs, rbufs, params, time_m, time_M):
        bufs = {**rbufs, **wbufs}
        geom_cache = {}
        bufs = _exec_items(schedule.prologue, bufs, params, None, geom_cache)

        if schedule.body:
            for it in schedule.body:
                if isinstance(it, LoweredSparse):
                    sf = it.sparse
                    if sf.name not in geom_cache:
                        geom_cache[sf.name] = _sparse_geometry(sf, bufs,
                                                               params)

            t0 = time_m if forward else time_M
            bufs = _decompose(bufs, t0)

            def step(i, carry):
                t = time_m + i if forward else time_M - i
                merged = {**bufs, **carry}
                merged = _exec_items(schedule.body, merged, params, t,
                                     geom_cache)
                result = {k: merged[k] for k in write_names}
                # rotate stepping windows: oldest slot becomes next new
                for name, m in stepping_info.items():
                    if name in result and isinstance(result[name], tuple):
                        s = result[name]
                        result[name] = s[1:] + (s[0],)
                return result

            if errctl is None:
                body = step
            else:
                import jax.numpy as jnp

                def body(i, carry):
                    err = carry.pop('__err__')

                    def _go(cin):
                        out = step(i, cin)
                        t = time_m + i if forward else time_M - i
                        slot = out[errctl]
                        probe = slot[0] if isinstance(slot, tuple) else slot
                        bad = ~jnp.isfinite(jnp.sum(probe))
                        do_check = jnp.mod(t, 100) == 0
                        out['__err__'] = jnp.where(do_check, bad, False)
                        return out

                    def _halt(cin):
                        return {**cin, '__err__': jnp.bool_(True)}

                    return jax.lax.cond(err, _halt, _go, carry)

            n = time_M - time_m + 1
            carry0 = {k: bufs[k] for k in write_names}
            if errctl is not None:
                import jax.numpy as jnp
                carry0 = {**carry0, '__err__': jnp.bool_(False)}
            carry = jax.lax.fori_loop(0, n, body, carry0)
            err_flag = carry.pop('__err__', None)
            bufs = {**bufs, **carry}
            # after the loop the window sits at t_end + direction; undo the
            # final rotation so recomposition indexes correctly
            t_end = time_M if forward else time_m
            for name, m in stepping_info.items():
                if name in bufs and isinstance(bufs[name], tuple):
                    s = bufs[name]
                    bufs[name] = (s[-1],) + s[:-1]
            bufs = _recompose(bufs, t_end)

        bufs = _exec_items(schedule.epilogue, bufs, params, None, geom_cache)
        out = {k: bufs[k] for k in write_names}
        if schedule.body and errctl is not None:
            out['__err__'] = err_flag
        return out

    return run
