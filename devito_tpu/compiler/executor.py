"""Executor: builds the jitted time-marching callable from a Schedule.

TPU-native replacement for the reference's generated C time loop + JIT
toolchain (devito/arch/compiler.py jit_compile:376, operator.py apply:956):
the whole hot loop — time marching, stencil updates, source injection,
receiver interpolation — is one `lax.fori_loop` inside one `jax.jit`, with
buffer donation so XLA updates state in-place in HBM.
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


def _exec_dense(eq, bufs, params, t):
    import jax
    import jax.numpy as jnp
    from .translate import translate, DenseCtx

    fn = eq.target
    name = fn.name
    buf = bufs[name]
    ctx = DenseCtx(bufs, params, _region_map(eq), t=t)
    val = translate(eq.rhs, ctx)

    slices = _write_region_slices(eq)
    region_shape = tuple(s.stop - s.start for s in slices)

    # Resolve the (possibly dynamic) time index of the write
    if eq.time_kind == 'stepping':
        nslots = buf.shape[0]
        tidx = jnp.mod(t + eq.time_off, nslots)
    elif eq.time_kind == 'save':
        tidx = t + eq.time_off
    elif eq.time_kind == 'cond':
        factor = eq.cond_factor or 1
        tidx = t // factor + eq.time_off
    else:
        tidx = None

    # Current value of the write region (for increments/conditions)
    def _current():
        if tidx is None:
            return buf[slices]
        cur = jax.lax.dynamic_index_in_dim(buf, tidx, 0, keepdims=False)
        return cur[slices]

    if eq.reduction == 'max':
        val = jnp.maximum(_current(), val)
    elif eq.reduction == 'min':
        val = jnp.minimum(_current(), val)
    elif eq.increment:
        val = _current() + val

    if eq.condition is not None:
        cond = translate(eq.condition, ctx)
        val = jnp.where(cond, val, _current())

    val = jnp.broadcast_to(val, region_shape).astype(buf.dtype)

    def _write(b):
        if tidx is None:
            return b.at[slices].set(val)
        return b.at[(tidx,) + slices].set(val)

    if eq.time_kind == 'cond' and (eq.cond_factor or 1) > 1:
        factor = eq.cond_factor
        buf = jax.lax.cond(jnp.mod(t, factor) == 0, _write, lambda b: b, buf)
    else:
        buf = _write(buf)

    out = dict(bufs)
    out[name] = buf
    return out


def _sparse_geometry(sf, bufs, params):
    """Compute corner indices {dim: (C, P) int arrays, domain coords,
    clipped} and weights (C, P) for a sparse function's interpolation
    stencil. Positions derive from the runtime coordinates buffer
    (reference: WeightedInterpolator, operations/interpolators.py:210)."""
    import jax.numpy as jnp
    from itertools import product

    fn = sf
    grid = fn.grid
    coords = bufs[f"{fn.name}_coords"]
    interp = fn.interpolator
    dims = grid.dimensions
    nd = len(dims)

    per_dim = []
    valid = None
    for j, d in enumerate(dims):
        h = params.get(d.spacing.name, grid.spacing[j])
        o = grid.origin[j]
        n = grid.shape[j]
        px = (coords[:, j] - o) / h  # position in grid points (P,)
        offsets, wlist, base = interp.dim_weights(px)
        v = (px >= 0) & (px <= n - 1)
        valid = v if valid is None else (valid & v)
        per_dim.append((d, offsets, wlist, base, n))

    # corner product
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


def _exec_sparse(item, bufs, params, t, geom_cache):
    import jax
    import jax.numpy as jnp
    from .translate import translate, SparseCtx

    sf = item.sparse
    key = sf.name
    if key not in geom_cache:
        geom_cache[key] = _sparse_geometry(sf, bufs, params)
    corner_idx, W = geom_cache[key]

    ctx = SparseCtx(bufs, params, corner_idx, W, sf, t=t)
    val = translate(item.expr, ctx)  # (C, P) or (P,) or scalar

    out = dict(bufs)
    if item.kind == 'interp':
        if hasattr(val, 'ndim') and val.ndim == 2:
            res = jnp.sum(W * val, axis=0)
        else:
            res = jnp.sum(W, axis=0) * val
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
        buf = bufs[field.name]
        contrib = (W * val).astype(buf.dtype)  # (C, P)
        if item.field_time_kind == 'stepping':
            nslots = buf.shape[0]
            tidx = jnp.mod(t + item.field_time_off, nslots)
        elif item.field_time_kind == 'save':
            tidx = t + item.field_time_off
        else:
            tidx = None
        sidx = tuple(corner_idx[d.name] + hl
                     for d, (hl, hr) in zip(field.space_dimensions,
                                            field.halo))
        if tidx is None:
            buf = buf.at[sidx].add(contrib)
        else:
            buf = buf.at[(tidx,) + sidx].add(contrib)
        out[field.name] = buf
    return out


def build_runner(schedule, write_names):
    """Build ``run(wbufs, rbufs, params, time_m, time_M) -> wbufs``.

    Only the written buffers are carried through the time loop (and donated
    by the Operator's jit); read-only buffers are loop-invariant closures.
    """
    import jax

    def _exec_items(items, bufs, params, t, geom_cache):
        for it in items:
            if isinstance(it, LoweredEq):
                bufs = _exec_dense(it, bufs, params, t)
            elif isinstance(it, LoweredSparse):
                bufs = _exec_sparse(it, bufs, params, t, geom_cache)
            else:
                raise CompilationError(f"Cannot execute {it}")
        return bufs

    forward = schedule.direction >= 0

    def run(wbufs, rbufs, params, time_m, time_M):
        bufs = {**rbufs, **wbufs}
        geom_cache = {}
        bufs = _exec_items(schedule.prologue, bufs, params, None, geom_cache)

        if schedule.body:
            # Hoist sparse geometry (coordinates -> corners/weights) out of
            # the loop; it is loop-invariant.
            for it in schedule.body:
                if isinstance(it, LoweredSparse):
                    sf = it.sparse
                    if sf.name not in geom_cache:
                        geom_cache[sf.name] = _sparse_geometry(sf, bufs,
                                                               params)

            def body(i, carry):
                t = time_m + i if forward else time_M - i
                merged = {**bufs, **carry}
                merged = _exec_items(schedule.body, merged, params, t,
                                     geom_cache)
                return {k: merged[k] for k in write_names}

            n = time_M - time_m + 1
            carry0 = {k: bufs[k] for k in write_names}
            carry = jax.lax.fori_loop(0, n, body, carry0)
            bufs = {**bufs, **carry}

        bufs = _exec_items(schedule.epilogue, bufs, params, None, geom_cache)
        return {k: bufs[k] for k in write_names}

    return run
