"""Executor: builds the jitted time-marching callable from a Schedule.

TPU-native replacement for the reference's generated C time loop + JIT
toolchain (devito/arch/compiler.py jit_compile:376, operator.py apply:956):
the whole hot loop — time marching, stencil updates, source injection,
receiver interpolation — is one `lax.fori_loop` inside one `jax.jit`, with
buffer donation so XLA updates state in-place in HBM.

Rolling time buffers (SteppingDimension semantics) stay *stacked* as
their canonical (nslots, ...) arrays in the loop carry and are indexed
with dynamic modulo rows — the direct functional analog of the
reference's modulo-indexed buffers (ir/clusters/algorithms.py Stepper).
This formulation measured fastest on v5e (experiments/stencil_probe*.py
history):
- the dynamic-slice of the tap-read row materializes one temp per step
  that XLA's memory-space-assignment pins in VMEM, so all ~25 shifted
  stencil reads hit VMEM instead of HBM (a per-tap-stream fusion reads
  ~1.9 GB/step instead of ~270 MB);
- the carry layout never changes, so the donated while-loop buffers
  update in place — a rotated-tuple window costs 2-3 full-buffer
  permutation copies per step (~1 ms at 256^3), and a statically-indexed
  unrolled cycle only gets the VMEM pin for one of its sub-steps.

Writes into padded buffers are lane-aligned: the written z-range is
expanded to the full allocated lane extent with halo lanes taken from
loop-invariant hoisted strips, so the dynamic-update-slice never needs a
cross-lane rotation (a z-offset DUS measured ~7x slower on v5e, and an
in-fusion read of the target row for the halo lanes flips XLA to a
per-tap-stream fusion strategy).  See experiments/stencil_probe6/7.py for
the measurement history.
"""

from collections import OrderedDict
from math import gcd

import os

import numpy as np

from ..ir.lowering import LoweredEq, LoweredSparse
from ..exceptions import CompilationError

__all__ = ['build_runner', 'modulo_period']


def _zdev_pad(eq):
    """``(live z extent, device lane extent)`` when the target is
    z-compact with a dead lane tail (domain z not a 128 multiple —
    types/dense.py shape_device) and the write covers the full domain z
    range; else None.  Such writes OVERCOMPUTE into the tail lanes (the
    region extends to the full lane extent, so every tensor in the
    fusion stays tile-aligned — a 180-lane compact row flipped XLA's
    layout assignment graph-wide, PERF_NOTES 'z-compact requires a
    lane-aligned extent') and mask the tail back to zero at the fusion
    root so shifted taps keep reading it as the zero z halo."""
    fn = eq.target
    if not getattr(fn, 'is_zcompact', False):
        return None
    sshape = fn.shape[1:] if fn.is_TimeFunction else fn.shape
    n = sshape[-1]
    zext = fn._zdev_extent()
    if zext == n or tuple(eq.region[-1]) != (0, n):
        return None
    if not _zdev_pad_safe(eq):
        return None
    return (n, zext)


def _zdev_pad_safe(eq):
    """Overcompute is only valid when the rhs evaluates naturally over
    the widened lane range: every dense read's last index must be a
    plain stencil access (its own last dim + integer shift).  Strided /
    subsampled / absolute last indices (e.g. ``u2[t, xs, ys] = u[t,
    2*xs, 2*ys]`` via spatially-subsampled dims) yield a fixed-extent
    value that cannot be broadcast over the widened region."""
    import sympy
    from ..types.basic import retrieve_functions
    fn = eq.target
    tdims = getattr(fn, 'dimensions', ())
    tlast = tdims[-1] if tdims else None
    # ancestors of the target's last dim (a spatially-subsampled write
    # dim reads its sources through the parent at a stride)
    ancestors = set()
    d = tlast
    while getattr(d, 'parent', None) is not None:
        d = d.parent
        ancestors.add(d)
    exprs = [eq.rhs] + ([eq.condition] if eq.condition is not None else [])
    for e in exprs:
        for a in retrieve_functions(e):
            f2 = a.function
            if getattr(f2, 'is_SparseFunction', False):
                return False
            args = getattr(a, 'args', ())
            dims = getattr(f2, 'dimensions', ())
            if not dims:
                continue  # bare symbol / scalar
            if tlast is not None and tlast not in dims:
                if any(d in ancestors for d in dims):
                    # reads vary along the widened axis via a parent
                    # dim (stride/factor mapping): fixed extent
                    return False
                continue  # broadcast read: no dependence on the axis
            if not args or len(args) != len(dims):
                continue
            try:
                off = sympy.simplify(args[-1] - dims[-1])
            except Exception:
                return False
            if not (off.is_number and off.is_integer is not False):
                return False
    return True


def _write_region_slices(eq):
    """Device-buffer slices for the write region of a dense eq (halo
    offsets follow the device layout — zero z-halo under z-compact;
    full-lane extended for tail-padded z-compact targets, _zdev_pad).
    Regions are GLOBAL domain coordinates; a target defined on a
    SubDomain subtracts its origin offset to address the local buffer."""
    fn = eq.target
    slices = []
    for (start, stop), (hl, hr), oo in zip(eq.region, fn.dev_halo,
                                           fn.origin_offset):
        slices.append(slice(hl + start - oo, hl + stop - oo))
    pad = _zdev_pad(eq)
    if pad is not None:
        slices[-1] = slice(0, pad[1])
    return tuple(slices)


def _region_map(eq):
    """{dim name: (start, length)} for the translator — SubDimension
    axes key by their ROOT names (a SubDomain-defined target iterates
    SubDimensions whose accesses resolve to root names in
    space_index_specs)."""
    fn = eq.target
    return OrderedDict(
        ((d.root.name if getattr(d, 'is_Sub', False) else d.name),
         (start, stop - start))
        for d, (start, stop) in zip(fn.space_dimensions, eq.region))


def _stride_map(eq):
    """{parent dim name: (target dim name, factor)} for target space
    dims that are spatially-subsampled ConditionalDimensions — accesses
    through the parent become strided reads (translate.DenseCtx)."""
    out = {}
    for d in eq.target.space_dimensions:
        if getattr(d, 'is_Conditional', False) and d.parent is not None:
            out[d.parent.name] = (d.name, int(d.factor or 1))
    return out


def _free_dims(eq):
    """Reduction dimensions: rhs space dims absent from the target —
    an ``Inc`` over them is a contraction (reference misc/linalg.py
    ``Inc(b, A*x)``; the reference emits sequential accumulation loops,
    here the whole contraction lowers to one fused multiply-reduce that
    XLA maps onto the MXU for matmul-shaped cases). Returns
    {dim name: (0, extent)} in a deterministic order."""
    from ..types.basic import retrieve_functions
    # SubDimension axes resolve by ROOT name (same convention as
    # _region_map and the access specs)
    target_names = {(d.root.name if getattr(d, 'is_Sub', False) else d.name)
                    for d in eq.target.space_dimensions}
    # parents of subsampled target dims are not free: they map to
    # strided reads over the subsampled region
    target_names.update(_stride_map(eq))
    out = OrderedDict()
    for a in retrieve_functions(eq.rhs):
        f = a.function
        if f.is_SparseFunction:
            continue
        sdims = f.space_dimensions
        sshape = f.shape[len(f.shape) - len(sdims):]  # drop time axis
        oofs = getattr(f, 'origin_offset', None) or (0,) * len(sdims)
        for d, n, oo in zip(sdims, sshape, oofs):
            # SubDomain-defined operands iterate SubDimensions whose
            # accesses resolve to root names; other derived dims (e.g.
            # subsampled conditionals) keep their own identity
            dn = d.root.name if getattr(d, 'is_Sub', False) else d.name
            if dn not in target_names and dn not in out:
                # region stays GLOBAL: a SubDomain-defined operand's
                # extent starts at its origin offset
                out[dn] = (oo, int(n))
    return out


def factor_value(f, params=None):
    """Runtime value of a ConditionalDimension subsampling factor: an
    int, or the traced runtime value for Constant-valued factors
    (reference: test_dimension.py test_symbolic_factor:1331 — the factor
    is overridable per apply)."""
    if f is None:
        return 1
    nm = getattr(f, 'name', None)
    if nm is not None and params is not None and nm in params:
        # the param may ride as a float scalar; // with it must still
        # produce an integer row index
        return jnp_int32(params[nm])
    try:
        return int(f)
    except TypeError:
        return int(getattr(f, 'data', f))


def modulo_period(stepping_info):
    """lcm of the rolling-buffer slot counts."""
    P = 1
    for m in (stepping_info or {}).values():
        P = P * m // gcd(P, m)
    return P


def step_row(t, toff, m):
    """Canonical buffer row of a stepping access ``u[t + toff]`` (row r
    holds time tau with tau % m == r); ``t`` may be traced."""
    import jax.numpy as jnp
    return jnp.mod(t + toff, m).astype(np.int32)


def save_row(t, toff, params, fn):
    """Buffer row of a ``save`` access at time ``t + toff``. Under host
    streaming (operator.py _apply_streamed) the streamed function's device
    buffer holds only a window of rows and ``__save_base_<name>__`` (a
    traced scalar riding the params) is the time of row 0; for
    non-streamed functions (sparse source/receiver rows included) the
    base is 0."""
    base = 0
    if params is not None:
        base = params.get(f'__save_base_{fn.name}__', 0)
    return t + toff - base


def _upcast(arr, fn):
    """Upcast a narrow-storage row to the function's compute dtype.

    Placed AFTER the row's dynamic slice so the convert fuses into the
    consuming stencil fusion: HBM streams the narrow (e.g. bf16) bytes
    and the VPU widens in-register (types/dense.py _storage_registry)."""
    want = getattr(fn, 'dtype', None)
    if want is not None and arr.dtype != want:
        return arr.astype(want)
    return arr


def _phase_slot(phase, toff, m, direction):
    """STATIC slot index of a stepping access under phase-unrolled
    execution (see build_runner): slots are labeled so that at sub-step
    phase ``k`` the access ``u[t + toff]`` lives in local slot
    ``(k + direction*toff) mod m`` — a Python int, so the read is a
    plain carried-array reference instead of a dynamic row slice."""
    if phase is None:
        raise CompilationError("stepping slots accessed without a phase")
    return (phase + direction * int(toff)) % m


def _resolve_time_indexed(bufs, fn, tk, toff, t, direction, params=None,
                          upcast=True, phase=None):
    """Return the (3-d or lower) array for a time-resolved access."""
    import jax
    up = _upcast if upcast else (lambda a, f: a)
    buf = bufs[fn.name]
    if tk is None:
        return up(buf, fn)
    if tk == 'stepping':
        if isinstance(buf, tuple):
            return up(buf[_phase_slot(phase, toff, fn._time_size,
                                      direction)], fn)
        if t is None:
            raise CompilationError(
                "Stepping access outside the time loop")
        return up(jax.lax.dynamic_index_in_dim(
            buf, step_row(t, toff, fn._time_size), 0, keepdims=False), fn)
    if tk == 'save':
        return up(jax.lax.dynamic_index_in_dim(
            buf, save_row(t, toff, params, fn), 0, keepdims=False), fn)
    if tk == 'cond':
        factor = factor_value(fn.dimensions[0].factor, params)
        return up(jax.lax.dynamic_index_in_dim(
            buf, jnp_int32(t // factor + toff), 0, keepdims=False), fn)
    if tk == 'abs':
        # absolute index: integer / runtime-Constant expression (the
        # canonical __loop_time__ marker resolves to the loop variable)
        idx = _eval_scalar(toff, dict(params or {}, __loop_time__=t))
        return up(jax.lax.dynamic_index_in_dim(
            buf, jnp_int32(idx), 0, keepdims=False), fn)
    raise CompilationError(f"Bad time access kind {tk}")


def _time_row_index(fn, tk, toff, t, params):
    """Traced buffer row index of a time-resolved access (None when the
    function has no time axis)."""
    if tk is None:
        return None
    if tk == 'stepping':
        if t is None:
            raise CompilationError("Stepping access outside the time loop")
        return step_row(t, toff, fn._time_size)
    if tk == 'save':
        return save_row(t, toff, params, fn)
    if tk == 'cond':
        factor = factor_value(fn.dimensions[0].factor, params)
        return t // factor + toff
    if tk == 'abs':
        return jnp_int32(_eval_scalar(toff, dict(params or {},
                                                 __loop_time__=t)))
    raise CompilationError(f"Bad time access kind {tk}")


def _windowed_slab(bufs, fn, tk, toff, t, params, x0, xlen, phase=None,
                   direction=1):
    """[x0, x0+xlen) slab (leading space axis, buffer coords) of a
    time-resolved row, sliced in ONE dynamic_slice straight off the
    time-stacked buffer. Extracting the full row first and slicing it
    per x-chunk would let XLA CSE the shared row extraction into a
    whole-row HBM materialization — at >=384^3 that costs more than the
    chunks themselves."""
    import jax
    buf = bufs[fn.name]
    if isinstance(buf, tuple):  # phase-unrolled stepping slots
        slot = buf[_phase_slot(phase, toff, fn._time_size, direction)]
        return jax.lax.dynamic_slice_in_dim(slot, jnp_int32(x0), xlen,
                                            axis=0)
    ri = _time_row_index(fn, tk, toff, t, params)
    if ri is None:
        # dynamic form: x0 is traced under the rolled chunk loop
        return jax.lax.dynamic_slice_in_dim(buf, jnp_int32(x0), xlen,
                                            axis=0)
    starts = (jnp_int32(ri), jnp_int32(x0)) + tuple(
        jnp_int32(0) for _ in range(buf.ndim - 2))
    sizes = (1, xlen) + tuple(buf.shape[2:])
    return jax.lax.dynamic_slice(buf, starts, sizes)[0]


def jnp_int32(v):
    import jax.numpy as jnp
    return jnp.asarray(v).astype(jnp.int32)


def _eval_scalar(e, params):
    """Evaluate a scalar sympy expression of runtime parameters into a
    traced value (used for absolute time indices)."""
    import sympy
    e = sympy.sympify(e)
    if e.is_Number:
        return int(e) if e.is_Integer else float(e)
    if isinstance(e, sympy.Symbol):
        name = e.name
        if name not in params:
            raise CompilationError(f"Unknown runtime symbol {name}")
        return params[name]
    if e.is_Add:
        out = 0
        for a in e.args:
            out = out + _eval_scalar(a, params)
        return out
    if e.is_Mul:
        out = 1
        for a in e.args:
            out = out * _eval_scalar(a, params)
        return out
    if e.is_Pow:
        return _eval_scalar(e.base, params) ** _eval_scalar(e.exp, params)
    raise CompilationError(f"Cannot evaluate runtime index {e}")



def _load_pallas():
    """Import the EXPERIMENTAL Pallas backend (moved to experiments/ in
    round 4 — measured 18x slower than the XLA executor on v5e, see
    PERF_NOTES; requires the repo checkout on sys.path)."""
    import importlib
    try:
        return importlib.import_module('experiments.pallas_backend')
    except ImportError as exc:
        raise CompilationError(
            "backend='pallas' is experimental and lives in experiments/ "
            "(repo checkout required); the shipped compute path is the "
            "XLA executor") from exc


def _use_pallas():
    import jax
    from ..parameters import configuration
    mode = configuration['backend']
    if mode == 'xla':
        return False, False
    on_cpu = jax.default_backend() == 'cpu'
    if mode == 'pallas':
        return True, on_cpu  # interpret off-TPU
    # auto: the XLA executor (z-compact layout + VMEM-pinned row staging)
    # out-streams the hand-built Pallas DMA pipeline on current chips
    # (~720 vs ~310 GB/s aggregate; PERF_NOTES.md), so the flagship path
    # is XLA and Pallas stays opt-in.
    return False, False


def _target_prev(eq, bufs, t, direction, params=None, phase=None):
    """Current (pre-update) content of the buffer slot ``eq`` writes."""
    import jax
    name = eq.target.name
    tk = eq.time_kind
    if tk == 'stepping':
        if isinstance(bufs[name], tuple):
            return bufs[name][_phase_slot(phase, eq.time_off,
                                          eq.target._time_size, direction)]
        return jax.lax.dynamic_index_in_dim(
            bufs[name], step_row(t, eq.time_off, eq.target._time_size),
            0, keepdims=False)
    buf = bufs[name]
    if tk == 'save':
        return jax.lax.dynamic_index_in_dim(
            buf, save_row(t, eq.time_off, params, eq.target), 0,
            keepdims=False)
    if tk == 'cond':
        factor = factor_value(eq.cond_factor, params)
        return jax.lax.dynamic_index_in_dim(
            buf, jnp_int32(t // factor + eq.time_off), 0, keepdims=False)
    return buf


class _FullStrips:
    """Hoisted loop-invariant border strips expanding a sole-writer plain
    write to the FULL allocated buffer: the per-step write then needs no
    (dynamic-)update-slice at all — the producing fusion's output simply
    replaces the donated carry buffer in place.  ``axes`` is a list of
    (axis, left, right) from innermost to outermost; inner axes' strips
    already span the axes expanded before them."""

    def __init__(self, axes):
        self.axes = axes


def _expand_full_write(val, fs, jnp):
    for ax, left, right in fs.axes:
        parts = []
        if left is not None:
            parts.append(left)
        parts.append(val)
        if right is not None:
            parts.append(right)
        if len(parts) > 1:
            val = jnp.concatenate(parts, axis=ax)
    return val


class _RowStrips:
    """Hoisted loop-invariant halo strips for a STEPPING write, stacked
    per canonical buffer row: ``axes`` is a list of (space axis, left,
    right) from innermost to outermost; strips of inner axes already
    span the axes expanded before them.  Expanding the write to the full
    lane (z) and sublane (y) extents keeps the per-step
    dynamic-update-slice tile-aligned — a z-offset DUS costs a
    cross-lane rotation, and a y-offset not a multiple of the 8-row
    sublane (e.g. space_order=4 halos) forces a standalone rotated DUS
    (measured ~0.23 ms/step per elastic field at 176^3)."""

    def __init__(self, axes):
        self.axes = axes


def _align_lane_write(val, slices, strip, buf_shape, row_idx, jnp):
    """Expand a stepping write's misaligned axes to their full allocated
    extents using hoisted ``_RowStrips`` (``row_idx`` — traced — selects
    the canonical row).  Returns the expanded (val, slices)."""
    import jax

    def _row(s):
        return jax.lax.dynamic_index_in_dim(s, row_idx, 0, keepdims=False)

    slices = list(slices)
    for ax, left, right in strip.axes:
        parts = []
        if left is not None:
            parts.append(_row(left))
        parts.append(val)
        if right is not None:
            parts.append(_row(right))
        if len(parts) > 1:
            val = jnp.concatenate(parts, axis=ax)
        slices[ax] = slice(0, buf_shape[ax + 1])
    return val, tuple(slices)



def _chunk_shifts(eq, x0, xlen):
    """(left, right) overhang of a halo-extended write region beyond the
    target's domain along the chunk axis. The window-slab margins shrink
    by these so slabs never index outside the allocated buffers; tap
    offsets must then fit the narrowed margins (plan check)."""
    fn = eq.target
    n = (fn.shape[1:] if fn.is_TimeFunction else fn.shape)[0]
    return max(0, -x0), max(0, x0 + xlen - n)


#: autotuner channel for the x-chunk plan knobs (operator._autotune):
#: overrides the heuristic slab target / chunk count at trace time
#: without touching the DTPU_XCHUNK_* env vars (the user escape hatch,
#: which takes precedence only when the override is unset).
_chunk_override = {}


def set_chunk_override(target_mb=None, force_n=None):
    """Install (or, with no arguments, clear) the x-chunk knob override
    consulted by `_x_chunk_plan` on the next trace. Reference analog:
    the block-shape candidates the autotuner injects at apply time
    (devito/core/autotuning.py:284 generate_block_shapes)."""
    _chunk_override.clear()
    if target_mb is not None:
        _chunk_override['target_mb'] = target_mb
    if force_n is not None:
        _chunk_override['force_n'] = force_n


def _x_chunk_plan(eq, region, t, strips, shard_spec):
    """Decide x-chunked execution of a stepping stencil write.

    Past ~320^3, the staged f32 row of a multi-tap stencil operand no
    longer fits VMEM, XLA's memory-space assignment stops pinning it,
    and the loop fusion re-reads HBM once per tap (~27x traffic for an
    SO=8 laplacian — the 5x 512^3 cliff). Splitting the leading (major)
    space dim into chunks whose materialized operand slabs fit VMEM
    restores the pin; chunk DUS writes along the major dim need no lane
    or sublane alignment. Returns (xdim name, region x start,
    [(offset, length)...], materialize keys) or None (run monolithic).

    Returns (xd, x0, chunks, mat, rolled). ``rolled`` plans execute as a
    ``lax.fori_loop`` over equal-length chunks (the last start clamped,
    overlap-recomputing a few rows) — one chunk body compiled once, so
    the chunk count is no longer bounded by unrolled compile time (12
    unrolled chunks compile in ~10 s but 17 blew a 580 s budget; the cap
    forced oversized, unpinnable slabs at 512^3 SO=12 / fp32).

    Reference analog: cache blocking (devito/passes/clusters/blocking.py)
    — re-designed as a VMEM working-set split, the TPU's actual cache.
    """
    import os
    if (t is None or shard_spec or eq.reduction
            or eq.time_kind not in ('stepping', None) or not region):
        return None
    if eq.time_kind is None and not eq.time_dep:
        return None  # prologue/epilogue one-shots: not the hot loop
    if strips and strips.get(id(eq)) is not None:
        return None
    from ..ir.lowering import (time_access_of, space_index_specs,
                               space_offsets_of)
    from ..types.basic import retrieve_functions
    xd, (x0, xlen) = next(iter(region.items()))
    d0 = eq.target.space_dimensions[0]
    if getattr(d0, 'is_Conditional', False) or d0.name != xd:
        return None
    # halo-extended write regions (CIRE temps computed into their halo,
    # ir/lowering.py _halo_write) start/stop outside the domain: the
    # slab margins shrink by the overhang on each side so the window
    # stays inside the allocated buffer (see _chunk_shifts)
    s_l, s_r = _chunk_shifts(eq, x0, xlen)
    if any(getattr(eq.target, 'origin_offset', ()) or ()):
        return None  # SubDomain-defined target: local-buffer offsets
    tname = eq.target.function.name
    nonlead_x = False
    rows = {}
    exprs = [eq.rhs] + ([eq.condition] if eq.condition is not None else [])
    for ex in exprs:
        for a in retrieve_functions(ex):
            fn = a.function
            if fn.is_SparseFunction:
                return None
            if any(getattr(fn, 'origin_offset', ()) or ()):
                return None  # SubDomain-defined read: offset slabs
            if fn.name == tname:
                tkk, toff = time_access_of(a)
                if tkk == eq.time_kind:
                    # rhs reads of the row being written would see earlier
                    # chunks' writes through ``acc`` (Gauss-Seidel). Rows
                    # alias MODULO the time buffer size: with m=2, a
                    # u.backward read (t-1) is the same physical row as
                    # the u.forward write (t+1) — textual offset equality
                    # missed that (silent wrong numbers past the trigger)
                    try:
                        aliased = ((int(toff) - int(eq.time_off))
                                   % max(int(fn.function._time_size), 1) == 0)
                    except (TypeError, ValueError):
                        aliased = True  # unresolvable offset: be safe
                    if aliased:
                        return None
            specs = space_index_specs(a)
            if not specs:
                continue
            # an access indexing the chunk axis on a NON-leading axis
            # (transposed reads) slices by a start that is traced under
            # the rolled loop — those plans stay unrolled (capped)
            for spj in specs[1:]:
                if spj[0] == 'rel' and spj[1] == xd:
                    nonlead_x = True
            sd = fn.space_dimensions
            if not sd or sd[0].name != xd:
                continue  # no leading-x axis: read whole (aux arrays)
            sp0 = specs[0]
            if sp0[0] != 'rel' or sp0[1] != xd:
                return None  # abs/transposed leading index
            hl, hr = fn.dev_halo[0]
            if sp0[2] < -(hl - s_l) or sp0[2] > hr - s_r:
                return None  # tap outside the (shift-narrowed) window
            tkk, toff = time_access_of(a)
            key = (fn.name, tkk, str(toff))
            ent = rows.setdefault(key, [fn, set()])
            try:
                ent[1].add(tuple(space_offsets_of(a, absolute='zero')))
            except Exception:
                return None
    if not rows:
        return None
    cands, storeb = [], 0
    for key, (fn, offs) in rows.items():
        if len(offs) < 3:
            continue  # 1-2 taps: lazy slab, no materialization
        space = fn.shape_device[-len(fn.space_dimensions):]
        perrow = 4 * int(np.prod(space[1:]))
        hl, hr = fn.dev_halo[0]
        # trigger on the LARGEST single materialized row's STORAGE
        # bytes: the monolithic cliff is one staged row no longer
        # pinning/copying cheaply (fp32 rows cost 2x bf16 ones, so fp32
        # wavefields cross at half the grid size — measured 256^3 fp32:
        # mono 22.6 / chunked 26.3 GPts/s; 256^3 bf16 stays mono). NOT
        # the sum over operands: a multi-field eq (TTI: u + 3 CIRE
        # temps) whose 14 MB rows all pin individually must stay
        # monolithic — summing triggered chunking at 192^3 and the
        # per-chunk window converts dominated (10.6 vs ~6.5 ms/step, r4)
        itemb = np.dtype(fn.function.storage_dtype).itemsize
        storeb = max(storeb, itemb * int(np.prod(space)))
        cands.append((len(offs), perrow, (hl + hr) * perrow, hl + hr, key,
                      itemb))
    trigger = int(float(os.environ.get('DTPU_XCHUNK_TRIGGER_MB', 60)) * 1e6)
    if not cands or storeb <= trigger:
        return None

    # slab-size target: 64 MB pins on-chip when the materialized
    # operands STORE narrow (the bf16 HBM streams leave VMEM headroom);
    # fp32-stored operands measured best at ~52 MB slabs (512^3 SO=8
    # fp32: 12 chunks/64 MB = 20.0 GPts/s, 16 chunks/52 MB = 24.3 —
    # r4 chunk sweeps, PERF_NOTES). The autotuner (operator._autotune)
    # searches this knob at apply time; its choice (or the env var)
    # overrides the heuristic default.
    def _slab_target(kept):
        tdefault = 52 if min(c[5] for c in kept) >= 4 else 64
        ov = _chunk_override.get('target_mb')
        if ov is None:
            ov = os.environ.get('DTPU_XCHUNK_TARGET_MB', tdefault)
        return int(float(ov) * 1e6)

    target = _slab_target(cands)
    # bound the ACTUAL materialized slab bytes (chunk rows + halo rows,
    # summed over materialized operands) by the target, so the slabs
    # stay VMEM-pinnable regardless of grid size. When the halo rows of
    # ALL candidates jointly blow the target (multi-operand SO=12 eqs on
    # large y*z planes: TTI canonical z-quarter floored clen at 16 with
    # 60% of every slab re-read halo — PERF_NOTES r4), pinning
    # EVERYTHING is self-defeating: keep only the top-K operands by tap
    # count (materialization saves ~(ntaps-1)x traffic, so high-tap
    # operands earn their VMEM first) such that chunks stay at least
    # ~2 halo depths long, and let the few-tap rest stream lazily
    cands.sort(key=lambda c: (-c[0], c[4]))
    rowb = sum(c[1] for c in cands)
    halob = sum(c[2] for c in cands)
    clen = (target - halob) // rowb if rowb else 0
    halo_dom = False
    while len(cands) > 1:
        clen_min = max(16, 2 * max(c[3] for c in cands))
        if clen >= clen_min:
            break
        _, pr, hb, _, _, _ = cands.pop()  # fewest taps streams lazily
        halo_dom = True
        rowb -= pr
        halob -= hb
        # the dropped operand's dtype no longer sizes any slab: re-derive
        # the target from the KEPT mix (an fp32 drop must not keep the
        # tighter 52 MB target motivated by fp32 slabs — advisor r4)
        target = _slab_target(cands)
        clen = (target - halob) // rowb
    mat = {c[4] for c in cands}
    # halo-dominated also when chunks end up shorter than ~2 halo depths
    # of any KEPT operand: covers the single-candidate plan that meets
    # the criterion without the drop loop ever running (advisor r4) and
    # the clen<16 floor below
    halo_dom = halo_dom or clen < max(16, 2 * max(c[3] for c in cands))
    if clen < 16:
        # a single operand's halo rows alone blow the target (very
        # large y*z planes): a bounded chunk count still beats the
        # ~27x monolithic re-read traffic, even with unpinnable slabs
        clen = 16
    clen = min(clen, xlen)
    max_unroll = int(os.environ.get('DTPU_XCHUNK_MAX_UNROLL', 12))
    force_n = (_chunk_override.get('force_n')
               or os.environ.get('DTPU_XCHUNK_FORCE_N'))
    nchunks = -(-xlen // clen)
    if force_n:
        nchunks = max(1, min(int(force_n), xlen))
    if nchunks > max_unroll and nonlead_x:
        # rolled bodies cannot slice a traced start on a non-leading
        # axis: stay unrolled at the compile-time cap
        nchunks = max_unroll
    clen = -(-xlen // nchunks)
    nchunks = -(-xlen // clen)
    rolled = nchunks > max_unroll
    if halo_dom and not nonlead_x and nchunks > 1 and not force_n:
        # halo-dominated plans (the drop loop fired, or a single
        # operand's halo floored clen) run on huge y*z planes where the
        # eq's full-grid aux reads (TTI model-term trig) are hundreds of
        # MB at f32: unrolled chunk bodies let XLA CSE the per-chunk aux
        # slices into whole-grid temps and keep several live at once
        # (canonical z-quarter 512x402x222 SO=12 compiled to 20.25 GB —
        # OOM on a 16 GB chip). The rolled fori_loop body computes them
        # per chunk, bounding live temps to one chunk's worth
        rolled = True
    if rolled:
        # equal-length chunks, last start clamped (the overlap rows
        # recompute identical values: chunks never read the write row)
        chunks = [(min(a, xlen - clen), clen)
                  for a in range(0, xlen, clen)]
    else:
        chunks = [(a, min(clen, xlen - a)) for a in range(0, xlen, clen)]
    return xd, x0, chunks, mat, rolled


def _zero_align_chunk_write(val, slices, buf_shape, eq, fn, jnp, lead=1):
    """Sublane/lane-align a chunk DUS by extending the written slab with
    zeros over the pristine-zero halo.

    A write whose inner start is tile-misaligned (e.g. y halo 12 with
    sublane quantum 8) cannot bitcast-fuse: XLA emits a standalone
    shuffling dynamic-update-slice (measured 0.204 ms/chunk x 12 at
    512^3 SO=12 — 2.4 ms/step). When the eq writes the axis's full
    domain range and the function's halo is maintained zero, the halo
    cells beyond the write are dead-and-zero, so padding the slab with
    zeros to the aligned window is a no-op on the buffer contents and
    lets the DUS fuse. The major (chunk) axis needs no alignment."""
    if getattr(fn, 'halo_state', 'dirty') != 'zero':
        return val, tuple(slices)
    slices = list(slices)
    nsp = len(slices)
    sshape = fn.shape[1:] if fn.is_TimeFunction else fn.shape
    pads = [(0, 0)] * nsp
    changed = False
    for ax, q in ((nsp - 1, 128), (nsp - 2, 8)):
        if ax <= 0:
            continue  # the chunked major axis needs no alignment
        if tuple(eq.region[ax]) != (0, sshape[ax]):
            continue  # sub-domain write: halo cells not provably dead
        s, e = slices[ax].start, slices[ax].stop
        ns = (s // q) * q
        if ns == s:
            # an aligned start keeps SO=8-style writes on their exact
            # monolithic-identical path (no reshaping pad at all)
            continue
        ext = buf_shape[ax + lead]  # lead: time axis (0 for timeless)
        ne = min(-(-e // q) * q, ext)
        pads[ax] = (s - ns, ne - e)
        slices[ax] = slice(ns, ne)
        changed = True
    if not changed:
        return val, tuple(slices)
    return jnp.pad(val, pads), tuple(slices)


def _exec_chunks_rolled(eq, bufs, params, t, direction, plan, region,
                        phase=None):
    """x-chunked execution as a ``lax.fori_loop`` over equal-length
    chunks (traced chunk start). Semantically identical to the unrolled
    chunk loop in ``_exec_dense`` — same slab windows, same
    read-from-accumulator DUS — but the body compiles ONCE, so the chunk
    count is free: slabs can be sized to pin in VMEM at any grid size
    (the unrolled path's 12-chunk compile cap forced 73 MB slabs at
    512^3 SO=12, past memory-space assignment's budget)."""
    import jax
    import jax.numpy as jnp
    from .translate import translate, DenseCtx

    xd, px0, chunks, mat, _ = plan
    fn = eq.target
    name = fn.name
    clen = chunks[0][1]
    xlen = chunks[-1][0] + chunks[-1][1]
    maxa = xlen - clen
    fullsl = _write_region_slices(eq)
    buf = bufs[name]
    timeless = eq.time_kind is None
    stack = slot_li = None
    if isinstance(buf, tuple):  # phase-unrolled stepping target
        slot_li = _phase_slot(phase, eq.time_off, fn._time_size,
                              direction)
        timeless = True  # slot arrays carry no time axis
        stack, buf = buf, buf[slot_li]
    row_idx = None if timeless else step_row(t, eq.time_off,
                                             fn._time_size)
    shifts = _chunk_shifts(eq, px0, xlen)
    mat_names = sorted({k[0] for k in mat} - {name})
    sl_tail = fullsl[1:]
    tail_sizes = tuple(s.stop - s.start for s in sl_tail)
    stride = _stride_map(eq)
    lead = () if timeless else (row_idx,)

    def body(i, acc):
        a = jnp.minimum(i * clen, maxa).astype(jnp.int32)
        bufs_i = dict(bufs)
        bufs_i[name] = acc if slot_li is None else (
            stack[:slot_li] + (acc,) + stack[slot_li + 1:])
        for rn in mat_names:
            # pair the slab reads with the accumulated carry so the
            # window materializations order after the previous chunk's
            # DUS (same placement the unrolled path enforces)
            b, _bar = jax.lax.optimization_barrier((bufs[rn], acc))
            bufs_i[rn] = b
        region_i = OrderedDict(region)
        region_i[xd] = (px0 + a, clen)
        ctx_i = DenseCtx(bufs_i, params, region_i, t=t, direction=direction,
                         stride_map=stride,
                         window=(xd, px0 + a, clen, mat) + shifts,
                         phase=phase)
        val_i = translate(eq.rhs, ctx_i)
        x0buf = jnp_int32(fullsl[0].start) + a

        def _cur():
            starts = lead + (x0buf,) + tuple(
                jnp_int32(s.start) for s in sl_tail)
            out = jax.lax.dynamic_slice(
                acc, starts, (1,) * len(lead) + (clen,) + tail_sizes)
            return out[0] if lead else out

        val_i = _finalize_val(eq, val_i, _cur, ctx_i, (clen,) + tail_sizes,
                              buf.dtype, jnp)
        sl_align = (slice(0, clen),) + sl_tail
        val_i, sl_align = _zero_align_chunk_write(val_i, sl_align,
                                                  buf.shape, eq, fn, jnp,
                                                  lead=len(lead))
        starts = lead + (x0buf,) + tuple(
            jnp_int32(s.start) for s in sl_align[1:])
        upd = val_i[None] if lead else val_i
        return jax.lax.dynamic_update_slice(acc, upd, starts)

    acc = jax.lax.fori_loop(0, len(chunks), body, buf)
    out = dict(bufs)
    out[name] = acc if slot_li is None else (
        stack[:slot_li] + (acc,) + stack[slot_li + 1:])
    return out


def _exec_dense(eq, bufs, params, t, direction, strips=None,
                shard_spec=None, gspmd=False, phase=None):
    import jax
    import jax.numpy as jnp
    from .translate import translate, DenseCtx

    fn = eq.target
    name = fn.name

    use, interpret = _use_pallas()
    val = None
    val_fullz = False
    if use and t is not None:
        pb = _load_pallas()
        plan = eq.__dict__.get('_pallas_plan', '?')
        if plan == '?':
            plan = pb.plan_for(eq, None)
            eq._pallas_plan = plan
        if plan is not None:
            resolved = [
                _resolve_time_indexed(bufs, g['fn'], g['tk'], g['toff'], t,
                                      direction, params=params)
                for g in plan.groups]
            tp = None
            if plan.fullz:
                # pre-update content of the slot being written: lets the
                # kernel emit complete lane rows so the DUS below is
                # lane-aligned (a z-offset DUS costs a cross-lane rotation
                # of the whole buffer)
                tp = _target_prev(eq, bufs, t, direction, params=params)
            val = pb.execute_plan(plan, resolved, params, interpret,
                                  target_prev=tp)
            val_fullz = plan.fullz and tp is not None

    region = _region_map(eq)
    zpad = _zdev_pad(eq)
    if zpad is not None:
        # overcompute into the dead lane tail (see _zdev_pad)
        zkey = next(reversed(region))
        region[zkey] = (0, zpad[1])
    free = _free_dims(eq)
    if free:
        if shard_spec:
            # per-shard extents on partitioned free dims (_free_dims
            # reads the functions' GLOBAL shapes)
            free = OrderedDict(
                (dn, (0, shard_spec[dn][2]) if dn in shard_spec else ext)
                for dn, ext in free.items())
        region = OrderedDict(list(region.items()) + list(free.items()))
    if val is None and not free and not gspmd:
        plan = _x_chunk_plan(eq, region, t, strips, shard_spec)
        if plan is not None and plan[4]:
            return _exec_chunks_rolled(eq, bufs, params, t, direction,
                                       plan, region, phase=phase)
        if plan is not None:
            xd, px0, chunks, mat, _ = plan
            fullsl = _write_region_slices(eq)
            buf = bufs[name]
            timeless = eq.time_kind is None
            slot_li = None
            if isinstance(buf, tuple):  # phase-unrolled stepping target
                slot_li = _phase_slot(phase, eq.time_off, fn._time_size,
                                      direction)
                timeless = True  # slot arrays carry no time axis
                stack, buf = buf, buf[slot_li]
            row_idx = None if timeless else step_row(t, eq.time_off,
                                                     fn._time_size)
            shifts = _chunk_shifts(eq, px0,
                                   chunks[-1][0] + chunks[-1][1])
            lead = () if timeless else (jnp_int32(row_idx),)
            acc = buf
            mat_names = sorted({k[0] for k in mat} - {name})
            for a, clen in chunks:
                # the target's own reads (u[t], u[t-1]) route through
                # ``acc``, the post-previous-DUS value: semantically
                # identical (the DUS only touches the write row, and
                # the plan declines rhs reads of that row), but it kills
                # the original buffer's liveness past each chunk write,
                # so XLA updates every chunk DUS IN PLACE — reading the
                # original ``buf`` kept it live and copied the whole
                # buffer per chunk (measured 5x 0.56 ms/step at 384^3;
                # read-from-acc: 5.04 -> 2.21 ms/step, xchunk_probe2)
                bufs_i = dict(bufs)
                bufs_i[name] = acc if slot_li is None else (
                    stack[:slot_li] + (acc,) + stack[slot_li + 1:])
                if a > 0 and mat_names:
                    # other functions' windows: serialize via a barrier
                    # paired with the previous chunk's DUS output, else
                    # XLA CSE-merges every window materialization into
                    # one upfront fusion that spills all but one window
                    # to HBM (measured 0.97 ms/step at 384^3)
                    for rn in mat_names:
                        b, _ = jax.lax.optimization_barrier(
                            (bufs[rn], acc))
                        bufs_i[rn] = b
                region_i = OrderedDict(region)
                region_i[xd] = (px0 + a, clen)
                ctx_i = DenseCtx(bufs_i, params, region_i, t=t,
                                 direction=direction,
                                 stride_map=_stride_map(eq),
                                 window=(xd, px0 + a, clen, mat) + shifts,
                                 phase=phase)
                val_i = translate(eq.rhs, ctx_i)
                sl_i = (slice(fullsl[0].start + a,
                              fullsl[0].start + a + clen),) + fullsl[1:]
                shape_i = tuple(s.stop - s.start for s in sl_i)

                def _cur(sl=sl_i, src=acc):
                    # one dynamic_slice (row + chunk window) off the
                    # ACCUMULATED buffer (chunks write disjoint slabs,
                    # so the pre-write values are intact; reading the
                    # original would re-pin its liveness and force the
                    # per-chunk copies back)
                    starts = lead + tuple(jnp_int32(s.start) for s in sl)
                    sizes = (1,) * len(lead) + tuple(
                        s.stop - s.start for s in sl)
                    out = jax.lax.dynamic_slice(src, starts, sizes)
                    return out[0] if lead else out

                val_i = _finalize_val(eq, val_i, _cur, ctx_i, shape_i,
                                      buf.dtype, jnp)
                val_i, sl_i = _zero_align_chunk_write(
                    val_i, sl_i, buf.shape, eq, fn, jnp, lead=len(lead))
                sts = lead + tuple(np.int32(s.start) for s in sl_i)
                upd = val_i[None] if lead else val_i
                acc = jax.lax.dynamic_update_slice(acc, upd, sts)
            out = dict(bufs)
            out[name] = acc if slot_li is None else (
                stack[:slot_li] + (acc,) + stack[slot_li + 1:])
            return out

    ctx = DenseCtx(bufs, params, region, t=t, direction=direction,
                   stride_map=_stride_map(eq), phase=phase)
    if val is None:
        val = translate(eq.rhs, ctx)
        if free:
            nt_ax = len(region) - len(free)
            if shard_spec:
                # uneven axes: the last shard's dead cells (global index
                # >= the true extent) must not contribute to the
                # contraction
                for k, dn in enumerate(free):
                    part = shard_spec.get(dn)
                    if part is None or len(part) < 4:
                        continue
                    axn, nparts, lext, nglb = part
                    if lext * nparts == nglb:
                        continue
                    off = params[f'__shard_off_{dn}__']
                    gidx = off + jnp.arange(lext)
                    shp = [1] * max(val.ndim, nt_ax + len(free))
                    shp[nt_ax + k] = lext
                    live = (gidx < nglb).reshape(shp)
                    if eq.reduction in ('max', 'min'):
                        fill = (jnp.finfo(val.dtype).min
                                if eq.reduction == 'max'
                                else jnp.finfo(val.dtype).max)
                        val = jnp.where(live, val, fill)
                    else:
                        # where, not multiply: dead-padded cells may hold
                        # inf/nan from the rhs (e.g. 1/f on a zero pad)
                        # and 0*inf = nan would poison the psum
                        val = jnp.where(live, val,
                                        jnp.zeros((), val.dtype))
            ax = tuple(range(nt_ax, len(region)))
            if eq.reduction == 'max':
                val = jnp.max(val, axis=ax)
            elif eq.reduction == 'min':
                val = jnp.min(val, axis=ax)
            else:
                val = jnp.sum(val, axis=ax)
            if shard_spec:
                # explicit halo path: a contraction over partitioned
                # dims sums only the shard-local extent — combine the
                # partials over those mesh axes (reference analog:
                # ReductionBuilder -> MPI_Allreduce,
                # devito/mpi/routines.py:1403)
                axes = tuple(shard_spec[d][0] for d in free
                             if d in shard_spec and shard_spec[d][1] > 1)
                if axes:
                    if eq.reduction == 'max':
                        val = jax.lax.pmax(val, axes)
                    elif eq.reduction == 'min':
                        val = jax.lax.pmin(val, axes)
                    else:
                        val = jax.lax.psum(val, axes)

    slices = _write_region_slices(eq)
    if val_fullz:
        # kernel output carries full lane rows (halo lanes passed through)
        slices = slices[:-1] + (slice(0, eq.target.shape_allocated[-1]),)
    region_shape = tuple(s.stop - s.start for s in slices)

    tk = eq.time_kind
    out = dict(bufs)

    if tk == 'stepping':
        buf = bufs[name]
        m = fn._time_size
        if isinstance(buf, tuple):
            # phase-unrolled slots: the write replaces one carried slot
            # array — no dynamic row slice, no row-materialization copy
            # (measured 2.45 of 5.52 ms/step at fp32 512^3, fp32_probe)
            li = _phase_slot(phase, eq.time_off, m, direction)
            slot = buf[li]

            def _current():
                return slot[slices]

            val = _finalize_val(eq, val, _current, ctx, region_shape,
                                slot.dtype, jnp)
            strip = strips.get(id(eq)) if strips else None
            if not val_fullz and strip is not None:
                row_idx = step_row(t, eq.time_off, m)
                val, slices = _align_lane_write(
                    val, slices, strip, (m,) + slot.shape, row_idx, jnp)
            if all(sl.start == 0 and sl.stop == slot.shape[ax]
                   for ax, sl in enumerate(slices)):
                new = val  # full-extent: pure fusion output
            else:
                new = jax.lax.dynamic_update_slice(
                    slot, val, tuple(np.int32(sl.start) for sl in slices))
            out[name] = buf[:li] + (new,) + buf[li + 1:]
            return out
        row_idx = step_row(t, eq.time_off, m)

        def _current():
            cur = jax.lax.dynamic_index_in_dim(buf, row_idx, 0,
                                               keepdims=False)
            return cur[slices]

        val = _finalize_val(eq, val, _current, ctx, region_shape,
                            buf.dtype, jnp)
        strip = strips.get(id(eq)) if strips else None
        if not val_fullz and strip is not None:
            val, slices = _align_lane_write(val, slices, strip,
                                            buf.shape, row_idx, jnp)
        if gspmd:
            # full-extent update: GSPMD cannot partition a DUS whose
            # update is smaller than the operand along a sharded axis —
            # it all-gathers BOTH the update and the whole carry buffer
            # (measured 12 all-gathers/step on a (4,2,1) mesh). Expanding
            # the written slab to the full space extents (zeros over a
            # pristine-zero halo; old row values otherwise) makes the DUS
            # shard-local: update and operand shard identically and the
            # only dynamic start is the unsharded time row.
            val, slices = _expand_full_extent_write(
                val, slices, buf, fn, row_idx, jnp, jax)
        starts = (row_idx,) + tuple(np.int32(sl.start) for sl in slices)
        out[name] = jax.lax.dynamic_update_slice(buf, val[None], starts)
        return out

    buf = bufs[name]
    if tk == 'save':
        tidx = save_row(t, eq.time_off, params, eq.target)
    elif tk == 'cond':
        factor = factor_value(eq.cond_factor, params)
        tidx = t // factor + eq.time_off
    else:
        tidx = None

    def _current():
        if tidx is None:
            return buf[slices]
        cur = jax.lax.dynamic_index_in_dim(buf, tidx, 0, keepdims=False)
        return cur[slices]

    val = _finalize_val(eq, val, _current, ctx, region_shape, buf.dtype, jnp)

    strip = strips.get(id(eq)) if strips else None
    if tidx is None and isinstance(strip, _FullStrips):
        out[name] = _expand_full_write(val, strip, jnp)
        return out

    def _write(b):
        if tidx is None:
            return b.at[slices].set(val)
        return b.at[(tidx,) + slices].set(val)

    cf = eq.cond_factor
    # guard decision is STATIC: symbolic (Constant) factors always guard
    # (their runtime value is traced); plain ints only when > 1
    need_guard = cf is not None and (getattr(cf, 'name', None) is not None
                                     or int(cf) > 1)
    if tk == 'cond' and need_guard:
        factor = factor_value(cf, params)
        buf = jax.lax.cond(jnp.mod(t, factor) == 0, _write, lambda b: b, buf)
    else:
        buf = _write(buf)
    out[name] = buf
    return out


def _expand_full_extent_write(val, slices, buf, fn, row_idx, jnp, jax):
    """Expand a stepping write to the target's full space extents.

    Used on the GSPMD fallback path (see the caller): a partial-extent
    dynamic-update-slice forces the SPMD partitioner to all-gather the
    carry buffer and the update; a full-extent update partitions
    locally. Halo cells are filled with zeros when the function's halo
    is maintained pristine-zero, else with the row's current values via
    an elementwise (trivially partitionable) ``where``."""
    pads = [(sl.start, buf.shape[i + 1] - sl.stop)
            for i, sl in enumerate(slices)]
    if all(p == (0, 0) for p in pads):
        return val, tuple(slices)
    full = jnp.pad(val, pads)
    if getattr(fn, 'halo_state', 'dirty') != 'zero':
        cur = jax.lax.dynamic_index_in_dim(buf, row_idx, 0, keepdims=False)
        mask = jnp.ones((), bool)
        for ax, sl in enumerate(slices):
            idx = jnp.arange(buf.shape[ax + 1])
            shp = [1] * len(slices)
            shp[ax] = buf.shape[ax + 1]
            mask = mask & ((idx >= sl.start) & (idx < sl.stop)).reshape(shp)
        full = jnp.where(mask, full, cur)
    return full, tuple(slice(0, buf.shape[i + 1])
                       for i in range(len(slices)))


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
    val = jnp.broadcast_to(val, region_shape).astype(dtype)
    zpad = _zdev_pad(eq)
    if zpad is not None:
        # dead lane tail stays zero (it doubles as the right z halo of
        # every shifted tap; jnp.where also kills inf/nan computed from
        # zero-tail coefficient reads, e.g. 1/m)
        n, zext = zpad
        live = jnp.arange(zext) < n
        val = jnp.where(live, val, jnp.zeros((), dtype))
    return val


def _sparse_geometry(sf, bufs, params, shard_spec=None):
    """Compute corner indices {dim: (C, P) int arrays, domain coords,
    clipped} and weights (C, P) for a sparse function's interpolation
    stencil. Positions derive from the runtime coordinates buffer
    (reference: WeightedInterpolator, operations/interpolators.py:210).

    Returns (corner_idx, W, own): ``own`` is the shard's owned-point
    index vector when an ownership bucket buffer ``<name>_own`` is
    present (explicit halo path; parallel/halo.py bucket_sparse_points)
    — geometry then covers only the ~P/N local points, with -1 padding
    masked into W — else None (all P points, replicated)."""
    import jax.numpy as jnp
    from itertools import product

    fn = sf
    grid = fn.grid
    interp = fn.interpolator
    dims = grid.dimensions

    own = None
    ob = bufs.get(f'{fn.name}_own')
    if ob is not None and getattr(interp, 'name', '') not in (
            'precomputed', 'matrix'):
        own_raw = ob.reshape(-1)
        pad_mask = own_raw >= 0
        own = jnp.clip(own_raw, 0, None)

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
                # gridpoint is the MINIMUM index; sample points are
                # gridpoint + i, i in [0, ncoeffs) (verified against the
                # executed reference's PrecomputedSparseFunction)
                offsets = list(range(coeffs.shape[1]))
            # matrix convention: gridpoint is the MINIMUM index,
            # offsets 0..r-1 (reference docstring)
            wlist = [coeffs[:, i] for i in range(coeffs.shape[1])]
            v = (gp >= 0) & (gp <= n - 1)
            valid = v if valid is None else (valid & v)
            per_dim.append((d, offsets, wlist, gp, n))
    else:
        coords = bufs[f"{fn.name}_coords"]
        if own is not None:
            coords = coords[own]
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
    if own is not None:
        W = W * pad_mask.astype(W.dtype)
    idxs = {k: jnp.stack(v) for k, v in corner_idx.items()}  # (C, P)
    # corner enumeration is product(*ranges): the LAST dim varies fastest,
    # so corners come in contiguous groups of cz sharing their leading
    # indices — the row-gather fast path (SparseCtx.access) exploits this
    idxs['__cz__'] = len(ranges[-1]) if ranges else 1
    if shard_spec:
        # shard-local indices: each corner is owned by exactly one shard;
        # foreign contributions are masked out (reference analog: sparse
        # ownership scatter, devito/mpi/distributed.py SparseDistributor)
        import jax
        for d in dims:
            part = shard_spec.get(d.name)
            if part is None:
                continue
            axis_name, nparts, lext = part[:3]
            off = jax.lax.axis_index(axis_name) * lext
            loc = idxs[d.name] - off
            inb = (loc >= 0) & (loc <= lext - 1)
            W = W * inb.astype(W.dtype)
            idxs[d.name] = jnp.clip(loc, 0, lext - 1)
    return idxs, W, own


def _interp_separable(item, sf, bufs, params, t, direction, phase=None):
    """Tensor-product interpolation: per-axis MXU contractions instead
    of pointwise corner gathers (operations/separable.py — the weight
    matrices ship as ``<name>_sepM<j>`` runtime buffers, packed by
    Operator._prepare when the coordinates factorize).  Returns the
    (P,) interpolated values, or None when the sampled expression is
    not a linear combination of affine dense accesses."""
    import jax.numpy as jnp
    from ..operations.separable import linear_terms
    from ..ir.lowering import time_access_of, space_offsets_of

    ndim = len(sf.grid.dimensions)
    Ms = [bufs.get(f'{sf.name}_sepM{j}') for j in range(ndim)]
    terms = linear_terms(item.expr)
    if terms is None:
        return None
    shape = sf.grid.shape
    letters_in = 'abcd'[:ndim]
    letters_out = 'pqrs'[:ndim]
    spec = (letters_in + ',' +
            ','.join(f'{i}{o}' for i, o in zip(letters_in, letters_out))
            + '->' + letters_out)
    res = None
    for coeff, a in terms:
        fn = a.function
        try:
            offs = space_offsets_of(a)
        except Exception:
            return None
        if len(offs) != ndim:
            return None
        tk, toff = time_access_of(a)
        arr = _resolve_time_indexed(bufs, fn, tk, toff, t, direction,
                                    params=params, phase=phase)
        if arr.ndim != ndim:
            return None
        slices = []
        for (hl, hr), off, n, ext in zip(fn.dev_halo, offs, shape,
                                         arr.shape):
            s = hl + off
            if s < 0 or s + n > ext:
                return None  # offset tap outside the device halo
            slices.append(slice(s, s + n))
        sub = arr[tuple(slices)]
        val = jnp.einsum(spec, sub, *Ms,
                         preferred_element_type=Ms[0].dtype,
                         optimize='optimal').reshape(-1)
        res = coeff * val if res is None else res + coeff * val
    code = bufs.get(f'{sf.name}_sepcode')
    if code is not None:
        res = res[code]
    return res


def _write_interp(item, sf, res, matrix, bufs, out, params, t, jnp):
    """Store the (P,) interpolated values into the sparse rows."""
    if matrix is not None:
        # channels = M^T @ per-location values
        res = jnp.asarray(matrix).T @ res
    buf = bufs[sf.name]
    res = jnp.broadcast_to(res, buf.shape[-1:]).astype(buf.dtype)
    if sf.is_SparseTimeFunction:
        td = sf.dimensions[0]
        factor = (td.factor or 1) if getattr(td, 'is_Conditional',
                                             False) else 1
        tidx = (t // factor if factor > 1 else t) + \
            item.target_time_off

        def _wr(b):
            if item.increment:
                return b.at[tidx, :].add(res)
            return b.at[tidx, :].set(res)
        if factor > 1:
            # subsampled recording: fire every `factor`-th step
            import jax
            buf = jax.lax.cond(jnp.mod(t, factor) == 0, _wr,
                               lambda b: b, buf)
        else:
            buf = _wr(buf)
    else:
        buf = buf.at[:].set(res) if not item.increment \
            else buf.at[:].add(res)
    out[sf.name] = buf
    return out


def _exec_sparse(item, bufs, params, t, geom_cache, direction,
                 shard_spec=None, phase=None):
    import jax.numpy as jnp
    from .translate import translate, SparseCtx

    sf = item.sparse
    matrix = getattr(type(sf), '_matrix', None)
    out = dict(bufs)

    if (item.kind == 'interp' and matrix is None and not shard_spec
            and bufs.get(f'{sf.name}_sepM0') is not None
            and bufs.get(f'{sf.name}_own') is None):
        res = _interp_separable(item, sf, bufs, params, t, direction,
                                phase=phase)
        if res is not None:
            return _write_interp(item, sf, res, None, bufs, out, params,
                                 t, jnp)

    key = sf.name
    if key not in geom_cache:
        geom_cache[key] = _sparse_geometry(sf, bufs, params,
                                           shard_spec=shard_spec)
    corner_idx, W, own = geom_cache[key]
    cz = corner_idx.get('__cz__', 1)

    ctx = SparseCtx(bufs, params, corner_idx, W, sf, t=t,
                    direction=direction, cz=cz, own=own, phase=phase)
    val = translate(item.expr, ctx)  # (C, P) or (P,) or scalar

    if item.kind == 'interp':
        if hasattr(val, 'ndim') and val.ndim == 2:
            res = jnp.sum(W * val, axis=0)
        else:
            res = jnp.sum(W, axis=0) * val
        if own is not None:
            # owner-bucketed points: scatter the shard's local results
            # back to global point slots (padding adds masked zeros at
            # slot 0), then sum partials across shards — a straddling
            # point's owned-corner partials combine here
            res = jnp.zeros((sf.npoint,), res.dtype).at[own].add(
                jnp.broadcast_to(res, own.shape))
        if shard_spec:
            import jax
            axes = tuple(p[0] for p in shard_spec.values() if p[1] > 1)
            if axes:
                res = jax.lax.psum(res, axes)
        return _write_interp(item, sf, res, matrix, bufs, out, params,
                             t, jnp)
    else:  # inject
        field = item.field
        sidx = tuple(corner_idx[d.name] + hl
                     for d, (hl, hr) in zip(field.space_dimensions,
                                            field.dev_halo))
        if matrix is not None:
            # per-location values = M @ channel values
            val = jnp.asarray(matrix) @ jnp.broadcast_to(
                val, (matrix.shape[1],))
        if item.field_time_kind == 'stepping':
            buf = bufs[field.name]
            if isinstance(buf, tuple):  # phase-unrolled slots
                li = _phase_slot(phase, item.field_time_off or 0,
                                 field._time_size, direction)
                slot = buf[li]
                slot = slot.at[sidx].add((W * val).astype(slot.dtype))
                out[field.name] = buf[:li] + (slot,) + buf[li + 1:]
                return out
            row_idx = step_row(t, item.field_time_off or 0,
                               field._time_size)
            contrib = (W * val).astype(buf.dtype)
            buf = buf.at[(row_idx,) + sidx].add(contrib)
            out[field.name] = buf
            return out
        buf = bufs[field.name]
        contrib = (W * val).astype(buf.dtype)
        if item.field_time_kind == 'save':
            tidx = save_row(t, item.field_time_off, params, item.field)
            buf = buf.at[(tidx,) + sidx].add(contrib)
        else:
            buf = buf.at[sidx].add(contrib)
        out[field.name] = buf
    return out


def build_runner(schedule, write_names, stepping_info=None, errctl=None,
                 anchor=0, exchange=None, shard_spec=None,
                 lane_strips=True, gspmd=False, static_phase=None):
    """Build ``run(wbufs, rbufs, params, time_m, time_M) -> wbufs``.

    ``stepping_info``: {fn name: nslots} for rolling-buffer TimeFunctions;
    their (nslots, ...) canonical arrays (row r holds time tau with
    tau % nslots == r) stay stacked in the loop carry and are read/written
    at dynamic modulo rows (see module docstring for why this is the fast
    formulation on TPU).

    ``anchor`` is accepted for API stability but unused.

    ``exchange``: optional per-step hook ``exchange(bufs, t) -> bufs``
    refreshing halo slabs from mesh neighbours (parallel/halo.py) — runs
    at the top of each time step, inside shard_map.

    ``shard_spec``: {dim name: (mesh axis name, nparts, local extent)}
    when running inside shard_map; localizes sparse scatter/gather
    indices and psums interpolation partial sums.

    ``lane_strips``: hoist loop-invariant z-halo strips so stepping
    writes are full-lane aligned (the single-chip win — see module
    docstring). Off under GSPMD sharding: the strip concat along a
    sharded lane axis makes the SPMD partitioner emit per-step
    all-gathers/all-to-alls, which cost far more than the cross-lane
    DUS rotation the strips avoid.

    ``errctl``: tuple of stepping TimeFunction names to stability-scan
    every 100 steps inside the loop (reference: passes/iet/errors.py:79 — the C
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

    # step-local compiler temporaries: recomputed every step and only
    # read AFTER their write within the same step, so they need no loop
    # carry slot (donated HBM buffer).  Leaving them as in-step values
    # frees XLA/MSA to schedule their lifetime (measured 2.91 -> 2.02
    # ms/step on a 25-tap consumer of one 51 MB temp at TTI-like sizes,
    # experiments/stencil_probe11.py).  Reference analog: CIRE Array
    # temporaries are block-scoped in the generated C, not kernel
    # arguments (passes/clusters/aliases.py lower_schedule).
    local_names = set()
    import os as _os
    if (exchange is None and lane_strips and not shard_spec
            and _os.environ.get('DTPU_STEP_LOCAL', '1') != '0'):
        writers = {}
        for it in schedule.all_items:
            if isinstance(it, LoweredEq):
                nm = it.target.name
                writers[nm] = writers.get(nm, 0) + 1
            elif isinstance(it, LoweredSparse) and it.kind == 'inject':
                nm = it.field.name
                writers[nm] = writers.get(nm, 0) + 1

        def _reads_of(it):
            from ..types.basic import retrieve_functions
            out = set()
            exprs = []
            if isinstance(it, LoweredEq):
                exprs = [it.rhs] + ([it.condition]
                                    if it.condition is not None else [])
            elif isinstance(it, LoweredSparse):
                exprs = [it.expr]
            for e in exprs:
                for a in retrieve_functions(e):
                    out.add(a.function.name)
            if isinstance(it, LoweredSparse):
                out.add(it.sparse.name)          # coords / own buffers
                if it.kind == 'inject':
                    out.add(it.field.name)       # read-modify-write
            return out

        outside_reads = set()
        for it in tuple(schedule.prologue) + tuple(schedule.epilogue):
            outside_reads |= _reads_of(it)

        seen_reads = set()
        for it in schedule.body:
            if (isinstance(it, LoweredEq) and it.time_kind is None
                    and it.time_dep
                    and getattr(it.target, '_compiler_temp', False)
                    and not it.increment and it.reduction is None
                    and it.condition is None
                    and writers.get(it.target.name) == 1
                    and it.target.name not in seen_reads
                    and it.target.name not in outside_reads):
                local_names.add(it.target.name)
            seen_reads |= _reads_of(it)
    carry_names = tuple(n for n in write_names if n not in local_names)

    # schedule-section scope names, matching Operator._estimate_flops'
    # enumeration: the jax.named_scope tags flow into the HLO ops'
    # tf_op metadata, so the measured profiler (operator/trace_profile)
    # can attribute each device op's busy time to ITS section even
    # after XLA fuses across items
    sec_names = {}
    for it in schedule.body:
        if isinstance(it, (LoweredEq, LoweredSparse)):
            sec_names[id(it)] = f'dtpu_sec{len(sec_names)}'

    def _exec_one(it, bufs, params, t, geom_cache, strips, phase=None):
        from contextlib import nullcontext
        scope = sec_names.get(id(it))
        ctx = jax.named_scope(scope) if scope else nullcontext()
        with ctx:
            if isinstance(it, LoweredEq):
                return _exec_dense(it, bufs, params, t, direction,
                                   strips, shard_spec, gspmd, phase=phase)
            if isinstance(it, LoweredSparse):
                return _exec_sparse(it, bufs, params, t, geom_cache,
                                    direction, shard_spec, phase=phase)
            if getattr(it, 'kind', None) == 'halo':
                # halo marker (parallel/halo.py): exchange start/
                # finish/sync scheduled like any other item
                return it.run(bufs, params, t)
            raise CompilationError(f"Cannot execute {it}")

    def _exec_items(items, bufs, params, t, geom_cache, strips=None,
                    phase=None):
        # NB: sibling-eq grouping (evaluating independent eqs against the
        # shared pre-group state so XLA could multi-output fuse them) was
        # tried in round 4 and produced a BIT-IDENTICAL executable on
        # elastic 160^3: independent eqs never read each other's buffers,
        # so the traced graph already exposes the shared operands and
        # XLA still chooses separate loop fusions (PERF_NOTES r4).
        for it in items:
            bufs = _exec_one(it, bufs, params, t, geom_cache, strips,
                             phase=phase)
        return bufs

    def _hoist_strips(raw_bufs):
        """Loop-invariant z-halo strips for lane-aligned writes, stacked
        per canonical row.

        For a dense stepping-target eq whose write covers the full domain
        z-range, the lanes outside the written z-range are halo/alignment
        pad — no equation or injection can ever write them (write regions
        are domain-bounded), so their content is constant through the
        loop.  Capturing them once lets the per-step write be a full-lane
        aligned DUS whose halo lanes come from hoisted constants instead
        of a per-step read of the target row (which flips XLA to a
        per-tap-stream fusion strategy — measured 4x slower)."""
        strips = {}
        if not lane_strips:
            return strips
        for it in schedule.body:
            if not isinstance(it, LoweredEq) or it.time_kind != 'stepping':
                continue
            fn = it.target
            if fn.name not in raw_bufs:
                continue
            # x-chunked execution supersedes the strip: the chunk plan
            # declines when a strip exists, and past the VMEM cliff the
            # chunked path wins by far more than aligned-DUS lanes save
            # (512^3 SO=12 ran 34.8 ms/step monolithic-with-strip vs
            # ~4 ms chunked; the strip only existed because halo 12 is
            # sublane-misaligned, while SO=8's halo 8 is aligned)
            probe_region = OrderedDict(
                (d.name, (a, b - a))
                for d, (a, b) in zip(fn.space_dimensions, it.region))
            if _x_chunk_plan(it, probe_region, 0, None,
                             shard_spec) is not None:
                continue
            sshape = fn.shape[1:] if fn.is_TimeFunction else fn.shape
            buf = raw_bufs[fn.name]  # canonical (m, ...) array
            slices = _write_region_slices(it)
            nsp = len(slices)
            ws = list(slices)
            axes = []
            # innermost (lane, z) axis first, then the sublane (y) axis;
            # each only when the eq writes the FULL domain range of that
            # dim (halo lanes then provably dead — write regions are
            # domain-bounded) and the device offset is tile-misaligned
            import os
            axq = [(nsp - 1, 128)]
            if (exchange is None and shard_spec is None
                    and os.environ.get('DEVITO_TPU_SUBLANE_STRIPS',
                                       '1') != '0'):
                # sublane expansion only on the single-chip path: under
                # a halo exchange (hook or scheduled items) the wider
                # DUS re-fuses the step and drifts off the serial
                # trajectory at the 1e-6 level the sharded-parity
                # tests pin
                axq.append((nsp - 2, 8))
            for ax, quantum in axq:
                if ax < 0:
                    continue
                sl = ws[ax]
                ext = buf.shape[ax + 1]
                if sl.start == 0 and sl.stop == ext:
                    continue  # already aligned
                if it.region[ax] != (0, sshape[ax]):
                    continue  # sub-domain write: halo not provably dead
                if ax != nsp - 1 and sl.start % quantum == 0:
                    continue  # sublane offset already aligned
                pre = (slice(None),) + tuple(ws[:ax])
                post = tuple(ws[ax + 1:])
                left = buf[pre + (slice(0, sl.start),) + post] \
                    if sl.start > 0 else None
                right = buf[pre + (slice(sl.stop, ext),) + post] \
                    if sl.stop < ext else None
                axes.append((ax, left, right))
                ws[ax] = slice(0, ext)
            if axes:
                strips[id(it)] = _RowStrips(axes)
        # plain (timeless) dense targets — CIRE derivative temporaries,
        # interpolation dense temps: when exactly one schedule item
        # writes the function, every lane outside its (fixed) write
        # region is loop-constant, so the same full-lane alignment
        # applies (the standalone z-offset DUS of a 192^3 TTI temp
        # measured ~0.75 ms/step of cross-lane rotation).  Skipped under
        # a halo-exchange hook: the exchange refreshes ghost lanes the
        # hoisted strips would stomp.
        if exchange is None:
            writers = {}
            for it in tuple(schedule.body) + tuple(schedule.epilogue):
                if isinstance(it, LoweredEq):
                    nm = it.target.name
                    writers[nm] = writers.get(nm, 0) + 1
                elif isinstance(it, LoweredSparse) and it.kind == 'inject':
                    nm = it.field.name
                    writers[nm] = writers.get(nm, 0) + 1
            for it in schedule.body:
                if not isinstance(it, LoweredEq) or it.time_kind is not None:
                    continue
                fn = it.target
                if fn.name not in raw_bufs or writers.get(fn.name) != 1:
                    continue
                buf = raw_bufs[fn.name]
                slices = _write_region_slices(it)
                if len(slices) != buf.ndim:
                    continue
                ws = list(slices)
                axes = []
                for ax in range(buf.ndim - 1, -1, -1):
                    sl = ws[ax]
                    ext = buf.shape[ax]
                    if sl.start == 0 and sl.stop == ext:
                        continue
                    pre = tuple(ws[:ax])
                    post = tuple(ws[ax + 1:])
                    left = buf[pre + (slice(0, sl.start),) + post] \
                        if sl.start > 0 else None
                    right = buf[pre + (slice(sl.stop, ext),) + post] \
                        if sl.stop < ext else None
                    axes.append((ax, left, right))
                    ws[ax] = slice(0, ext)
                if axes:
                    strips[id(it)] = _FullStrips(axes)
        return strips

    def _phase_unroll():
        """lcm of stepping-buffer sizes when the schedule is eligible
        for phase-unrolled (static-slot) execution, else 0.

        Eligibility: single-chip XLA path, and every body access to a
        stepping buffer is of 'stepping' kind (an absolute index like
        ``u[0, x, y]`` would need a dynamic slot lookup — the stacked
        path handles those)."""
        import os
        from math import gcd
        from ..types.basic import retrieve_functions
        from ..ir.lowering import time_access_of
        if (static_phase is False or exchange is not None or shard_spec
                or gspmd or not stepping_info or _use_pallas()[0]
                or os.environ.get('DTPU_STATIC_PHASE', '1') == '0'):
            return 0
        if static_phase is None:
            # default heuristic: schedules dominated by step-local
            # timeless temporaries (TTI's CIRE chains: 4 such eqs)
            # REGRESS under phase unrolling — the L-fold inlined macro
            # body keeps L copies of the temp chains live and XLA
            # spills (measured TTI 192^3 fp32: 6.0 -> 10.0 ms/step,
            # while acoustic gains 1.40x and elastic — 2 temps — 1.11x).
            # Force with autotune ('phase'/'nophase' candidates) or
            # build_runner(static_phase=True/False).
            ntimeless = sum(
                1 for it in schedule.body
                if isinstance(it, LoweredEq) and it.time_kind is None
                and it.time_dep)
            if ntimeless > 2:
                return 0
        L = 1
        for m in stepping_info.values():
            m = int(m)
            if m < 1:
                return 0
            L = L * m // gcd(L, m)
        if L > 6:
            return 0
        def _narrow(fn):
            # narrow-storage (bf16/fp16) slots stay on the stacked path:
            # XLA's fusion cost model refuses to fuse the per-tap
            # upcasts of a slot that many shifted reads share, and
            # streams one full-grid convert per tap instead (measured
            # 4.1 -> 21 ms/step at bf16 512^3, in every variant tried:
            # early upcast, post-slice upcast, substep barriers)
            sd = getattr(fn, 'storage_dtype', None)
            return sd is not None and sd != fn.dtype

        for it in schedule.body:
            if isinstance(it, LoweredEq):
                exprs = [it.rhs] + ([it.condition]
                                    if it.condition is not None else [])
                if it.time_kind == 'stepping' and _narrow(it.target):
                    return 0
            elif isinstance(it, LoweredSparse):
                exprs = [it.expr]
                fld = getattr(it, 'field', None)
                if fld is not None and fld.name in stepping_info \
                        and _narrow(fld):
                    return 0
            else:
                return 0  # scheduled halo markers: sharded-only path
            for e in exprs:
                for a in retrieve_functions(e):
                    if a.function.name in stepping_info:
                        tk, _ = time_access_of(a)
                        if tk != 'stepping':
                            return 0
                        if _narrow(a.function):
                            return 0
        return L

    def run(wbufs, rbufs, params, time_m, time_M):
        import jax.numpy as jnp

        bufs = {**rbufs, **wbufs}
        geom_cache = {}
        bufs = _exec_items(schedule.prologue, bufs, params, None, geom_cache)

        if schedule.body:
            for it in schedule.body:
                if isinstance(it, LoweredSparse):
                    sf = it.sparse
                    if sf.name not in geom_cache:
                        geom_cache[sf.name] = _sparse_geometry(
                            sf, bufs, params, shard_spec=shard_spec)

            strips = _hoist_strips(bufs)
            L = _phase_unroll()
            anchor = time_m if forward else time_M

            if L:
                # phase-unrolled (static-slot) execution: stepping
                # buffers become tuples of per-slot arrays labeled so
                # local slot i holds time anchor + direction*i; slot
                # routing inside the L-substep macro body is then STATIC
                # (_phase_slot) — no dynamic row slices, whose
                # materialized copies measured 2.45 of 5.52 ms/step at
                # fp32 512^3 (the round-4 'window-slab copy' residual)
                names = [nm for nm in stepping_info if nm in bufs]
                for nm in names:
                    m = stepping_info[nm]
                    b = bufs[nm]
                    bufs[nm] = tuple(
                        jax.lax.dynamic_index_in_dim(
                            b, jnp.mod(anchor + direction * i,
                                       m).astype(np.int32),
                            0, keepdims=False)
                        for i in range(m))

            def substeps(carry, t0, nsub):
                c = carry
                for k in range(nsub):
                    t = t0 + direction * k
                    merged = {**bufs, **c}
                    if exchange is not None:
                        merged = exchange(merged, t)
                    merged = _exec_items(schedule.body, merged, params, t,
                                         geom_cache, strips=strips,
                                         phase=(k if L else None))
                    c = {kk: merged[kk] for kk in carry_names}
                    if L and k < nsub - 1:
                        # seal each sub-step: without the barrier XLA
                        # CSEs identical reads of a carried slot across
                        # sub-steps — for narrow-storage (bf16) slots
                        # the shared upcast then materializes as a
                        # full-grid fp32 copy (measured 4.1 -> 21 ms/step
                        # at 512^3)
                        c = jax.lax.optimization_barrier(c)
                return c

            def step(i, carry, nsub=1):
                t0 = anchor + direction * (i * (L or 1))
                return substeps(carry, t0, nsub)

            if errctl is None:
                def body(i, carry):
                    return step(i, carry, nsub=(L or 1))
            else:
                def body(i, carry):
                    err = carry.pop('__err__')

                    def _go(cin):
                        out = step(i, cin, nsub=(L or 1))
                        t = anchor + direction * ((i + 1) * (L or 1) - 1)
                        # errctl names the written stepping fns: probe one
                        # slot of each buffer (any slot is at most m
                        # steps stale, matching the reference's sampled
                        # scan over all written fields, errors.py:20)
                        bad = jnp.bool_(False)
                        for nm in errctl:
                            bad |= ~jnp.isfinite(jnp.sum(out[nm][0]))
                        if shard_spec:
                            # shards must agree on the halt decision (a
                            # diverging lax.cond would desync the
                            # ppermute chains); reference analog:
                            # rank-local error -> comm.Abort
                            # (operator.py:743)
                            axes = tuple(pp[0] for pp in
                                         shard_spec.values() if pp[1] > 1)
                            if axes:
                                bad = jax.lax.psum(
                                    bad.astype(jnp.int32), axes) > 0
                        do_check = jnp.mod(t, 100) < (L or 1)
                        out['__err__'] = jnp.where(do_check, bad, False)
                        return out

                    def _halt(cin):
                        return {**cin, '__err__': jnp.bool_(True)}

                    return jax.lax.cond(err, _halt, _go, carry)

            n = jnp.maximum(time_M - time_m + 1, 0)
            carry0 = {k: bufs[k] for k in carry_names}
            if errctl is not None:
                carry0 = {**carry0, '__err__': jnp.bool_(False)}
            if L:
                macro = n // L
                carry = jax.lax.fori_loop(0, macro, body, carry0)
                # remainder (n mod L) sub-steps: one static branch per
                # possible count — phases restart at 0 since macro*L
                # whole cycles completed
                err_flag = carry.pop('__err__', None)

                def _mk(r):
                    def f(c):
                        return substeps(c, anchor + direction * macro * L,
                                        r)
                    return f
                carry = jax.lax.switch(n - macro * L,
                                       [_mk(r) for r in range(L)], carry)
            else:
                carry = jax.lax.fori_loop(0, n, body, carry0)
                err_flag = carry.pop('__err__', None)
            bufs = {**bufs, **carry}

            if L:
                # restack: local slot i -> global row (anchor + dir*i)%m
                for nm in [nm for nm in stepping_info if nm in bufs]:
                    b = bufs[nm]
                    if not isinstance(b, tuple):
                        continue
                    m = stepping_info[nm]
                    perm = jnp.mod(direction * (jnp.arange(m) - anchor), m)
                    bufs[nm] = jnp.take(jnp.stack(b), perm, axis=0)

        bufs = _exec_items(schedule.epilogue, bufs, params, None, geom_cache)
        out = {k: bufs[k] for k in write_names if k not in local_names}
        if schedule.body and errctl is not None:
            out['__err__'] = err_flag
        return out

    run.local_names = frozenset(local_names)
    return run
