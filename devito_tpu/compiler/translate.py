"""Symbolic expression -> JAX translator.

This is the TPU-native replacement for the reference's C code generation
(devito/ir/cgen/printer.py ccode:459 and the CGen IET visitor): instead of
printing C, evaluated sympy expressions are traced directly into an XLA
computation over (halo-padded) device buffers. XLA then performs the loop
fusion / vectorization that the reference implements by hand (Ompizer,
PragmaSimdTransformer).

Two access contexts:
- DenseCtx: function accesses become static slices of padded buffers
  (shifted-slice stencil algebra; everything fuses into one kernel).
- SparseCtx: accesses become gathers at interpolation corner indices
  (reference: devito/operations/interpolators.py lowered loops).
"""

import numpy as np
import sympy

from ..types.basic import AbstractFunction
from ..types.dimension import Dimension, ConditionalDimension
from ..ir.lowering import (time_access_of, space_offsets_of,
                           space_index_specs)
from ..exceptions import CompilationError

__all__ = ['translate', 'DenseCtx', 'SparseCtx']


def _fn_map():
    import jax.numpy as jnp
    return {
        # NB: sympy.sqrt is a function (not a class) — sqrt exprs are
        # Pow(x, 1/2) and handled above; listing it here made
        # isinstance() raise for any expr reaching this loop
        sympy.sin: jnp.sin, sympy.cos: jnp.cos, sympy.tan: jnp.tan,
        sympy.exp: jnp.exp, sympy.log: jnp.log,
        sympy.sinh: jnp.sinh, sympy.cosh: jnp.cosh, sympy.tanh: jnp.tanh,
        sympy.asin: jnp.arcsin, sympy.acos: jnp.arccos,
        sympy.atan: jnp.arctan, sympy.atan2: jnp.arctan2,
        sympy.Abs: jnp.abs, sympy.sign: jnp.sign,
        sympy.floor: lambda x: jnp.floor(x),
        sympy.ceiling: lambda x: jnp.ceil(x),
        sympy.re: lambda x: x.real if hasattr(x, 'real') else x,
        sympy.im: lambda x: x.imag if hasattr(x, 'imag') else 0.0,
    }


def translate(expr, ctx):
    """Translate a sympy expression into a JAX value in context ``ctx``."""
    import jax.numpy as jnp

    expr = sympy.sympify(expr)

    if isinstance(expr, AbstractFunction):
        return ctx.access(expr)
    if isinstance(expr, sympy.Integer):
        return int(expr)
    if isinstance(expr, (sympy.Float, sympy.Rational)):
        return float(expr)
    if expr is sympy.pi:
        return float(np.pi)
    if expr is sympy.I:
        # complex fields are first-class on XLA (reference parity:
        # tests/test_dtypes.py complex derivative/reduction suite)
        return 1j
    if isinstance(expr, sympy.Number) or (expr.is_number
                                          and expr.is_complex
                                          and not expr.free_symbols):
        c = complex(expr)
        return c if c.imag else c.real
    if isinstance(expr, sympy.Symbol):
        return ctx.symbol(expr)
    if isinstance(expr, sympy.Add):
        out = translate(expr.args[0], ctx)
        for a in expr.args[1:]:
            out = out + translate(a, ctx)
        return out
    if isinstance(expr, sympy.Mul):
        out = translate(expr.args[0], ctx)
        for a in expr.args[1:]:
            out = out * translate(a, ctx)
        return out
    if isinstance(expr, sympy.Pow):
        base = translate(expr.base, ctx)
        e = expr.exp
        if isinstance(e, sympy.Integer):
            n = int(e)
            if n == -1:
                return 1.0 / base
            if 0 <= n <= 4:
                out = 1
                for _ in range(n):
                    out = out * base
                return out
            if -4 <= n < 0:
                out = 1
                for _ in range(-n):
                    out = out * base
                return 1.0 / out
            return base ** n
        if e == sympy.Rational(1, 2):
            return jnp.sqrt(base)
        if e == sympy.Rational(-1, 2):
            import jax
            return jax.lax.rsqrt(base)
        return base ** translate(e, ctx)
    if isinstance(expr, (sympy.StrictLessThan, sympy.LessThan,
                         sympy.StrictGreaterThan, sympy.GreaterThan,
                         sympy.Equality, sympy.Unequality)):
        l = translate(expr.lhs, ctx)
        r = translate(expr.rhs, ctx)
        # keyed on the sympy base class: devito_tpu.types.relational
        # subclasses (Lt/Le/...) must resolve to the same compare
        ops = {sympy.StrictLessThan: lambda a, b: a < b,
               sympy.LessThan: lambda a, b: a <= b,
               sympy.StrictGreaterThan: lambda a, b: a > b,
               sympy.GreaterThan: lambda a, b: a >= b,
               sympy.Equality: lambda a, b: a == b,
               sympy.Unequality: lambda a, b: a != b}
        for base, fn in ops.items():
            if isinstance(expr, base):
                return fn(l, r)
        raise CompilationError(f"Unknown relational {type(expr)}")
    if isinstance(expr, sympy.And):
        out = translate(expr.args[0], ctx)
        for a in expr.args[1:]:
            out = out & translate(a, ctx)
        return out
    if isinstance(expr, sympy.Or):
        out = translate(expr.args[0], ctx)
        for a in expr.args[1:]:
            out = out | translate(a, ctx)
        return out
    if isinstance(expr, sympy.Not):
        return ~translate(expr.args[0], ctx)
    if isinstance(expr, sympy.Min):
        out = translate(expr.args[0], ctx)
        for a in expr.args[1:]:
            out = jnp.minimum(out, translate(a, ctx))
        return out
    if isinstance(expr, sympy.Max):
        out = translate(expr.args[0], ctx)
        for a in expr.args[1:]:
            out = jnp.maximum(out, translate(a, ctx))
        return out
    if isinstance(expr, sympy.Mod):
        return jnp.mod(translate(expr.args[0], ctx),
                       translate(expr.args[1], ctx))
    if isinstance(expr, sympy.Piecewise):
        out = None
        for val, cond in reversed(expr.args):
            v = translate(val, ctx)
            if cond is sympy.true:
                out = v
            else:
                c = translate(cond, ctx)
                out = jnp.where(c, v, out if out is not None else 0.0)
        return out

    fmap = _fn_map()
    for sfunc, jfunc in fmap.items():
        if isinstance(expr, sfunc):
            return jfunc(*[translate(a, ctx) for a in expr.args])

    raise CompilationError(f"Cannot translate {type(expr).__name__}: {expr}")


class BaseCtx:
    def __init__(self, buffers, params, t=None, direction=1, phase=None):
        self.buffers = buffers
        self.params = params
        self.t = t
        self.direction = direction
        # static sub-step phase under phase-unrolled execution
        # (executor._phase_slot); None on the dynamic-row path
        self.phase = phase

    def symbol(self, sym):
        name = sym.name
        if name in self.params:
            return self.params[name]
        if name == '__loop_time__' and self.t is not None:
            # canonical time-axis marker (ir/lowering.py LOOP_TIME)
            return self.t
        if isinstance(sym, Dimension) and self.t is not None:
            root = sym.root if sym.is_Derived else sym
            if root.is_Time:
                # e.g. sf.inject(expr=time): the loop's time index is a
                # legal value expression (reference
                # tests/test_sparse.py:470 test_mpi_no_data). A
                # time-subsampled ConditionalDimension used as a VALUE is
                # the subsampled index t // factor (reference:
                # test_dimension.py test_as_expr:1171, test_no_index)
                if isinstance(sym, ConditionalDimension):
                    f = self._cond_factor_value(sym)
                    if f is not None:
                        return self.t // f
                return self.t
        raise CompilationError(f"Unbound symbol {name}")

    def _cond_factor_value(self, cd):
        """Runtime value of a ConditionalDimension's subsampling factor
        (int, or a traced param for Constant factors); None if no
        factor."""
        f = getattr(cd, 'factor', None)
        if f is None:
            return None
        nm = getattr(f, 'name', None)
        if nm is not None and nm in self.params:
            return self.params[nm]
        try:
            return int(f)
        except TypeError:
            return int(getattr(f, 'data', f))

    def _time_resolved(self, fn, access):
        """Resolve an access's time index into the concrete (time-free)
        array: stepping buffers are statically-indexed window tuples
        (see compiler/executor.py), save/cond arrays dynamically
        indexed."""
        from .executor import _resolve_time_indexed
        tk, toff = time_access_of(access)
        return _resolve_time_indexed(self.buffers, fn, tk, toff, self.t,
                                     self.direction, params=self.params,
                                     phase=self.phase)


class DenseCtx(BaseCtx):
    """Dense region context: accesses -> static slices of padded buffers.

    ``region``: {root dim name: (start, length)} of the write region in
    domain coordinates.
    """

    def __init__(self, buffers, params, region, t=None, direction=1,
                 stride_map=None, window=None, phase=None):
        super().__init__(buffers, params, t=t, direction=direction,
                         phase=phase)
        self.region = region
        # ``window``: (dim name, domain start, domain length, mat keys) —
        # x-chunked execution (executor._x_chunk_plan): accesses to
        # functions whose LEADING space dim is the window dim read a
        # [start, start+length+hl+hr) slab of the time-resolved row
        # instead of the full row. Rows in ``mat keys`` are upcast and
        # optimization_barrier'd so XLA materializes the slab as its own
        # buffer — small enough for memory-space assignment to pin in
        # VMEM, which keeps the ~25 shifted stencil taps VMEM-resident at
        # grid sizes where the full staged row no longer fits (the
        # >=320^3 MSA cliff: an unpinned staged row is re-read from HBM
        # per tap, ~27x traffic).
        self.window = window
        self._wcache = {}
        # {parent dim name: (region dim name, factor)} — the write
        # region iterates a spatially-subsampled ConditionalDimension,
        # so accesses indexed by the PARENT read strided positions
        # parent = factor*sub (reference: test_dimension.py
        # test_spacial_subsampling:956)
        self.stride_map = stride_map or {}

    def symbol(self, sym):
        import jax.numpy as jnp
        if isinstance(sym, Dimension):
            # A bare dimension in an expression -> coordinate index array
            # broadcast along its axis over the region.  Inside shard_map
            # the ShardedRunner injects `__shard_off_<dim>__` (this
            # shard's global offset) into params so coordinates stay
            # GLOBAL — subdomain masks and x-dependent expressions then
            # translate identically on every shard.
            name = sym.root.name if sym.is_Derived else sym.name
            if sym.is_Time or name not in self.region:
                if sym.is_Time:
                    return self.t
                root = sym.root if sym.is_Derived else sym
                if root.is_Time and self.t is not None:
                    # time-derived dimension as a value (subsampled
                    # ConditionalDimension etc.) — BaseCtx semantics
                    return BaseCtx.symbol(self, sym)
                raise CompilationError(f"Unbound dimension {sym}")
            dims = list(self.region)
            j = dims.index(name)
            start, length = self.region[name]
            shape = [1] * len(dims)
            shape[j] = length
            # start + arange(length), not arange(start, ...): the chunk
            # axis's region start is traced under the rolled chunk loop
            iota = (jnp.arange(length) + start).reshape(shape)
            off = self.params.get(f'__shard_off_{name}__')
            if off is not None:
                iota = iota + off
            return iota
        return super().symbol(sym)

    def _windowed_row(self, fn, e, dom_start, dom_len, mat, shifts=(0, 0)):
        """Windowed (x-chunked) time-resolved row: a
        [dom_start, dom_start+dom_len+hl+hr) slab in buffer coords of
        the leading space axis (buffer index = halo_left + domain index,
        so the slab starts at buffer index ``dom_start``). Cached per
        (fn, time row) so every tap shares one slab."""
        import jax
        from .executor import _windowed_slab, _upcast
        tk, toff = time_access_of(e)
        key = (fn.name, tk, str(toff))
        hit = self._wcache.get(key)
        if hit is not None:
            return hit
        hl, hr = fn.dev_halo[0]
        # halo-extended chunk regions (CIRE temps) shrink the slab
        # margins by the domain overhang so the window never indexes
        # outside the allocated buffer (executor._chunk_shifts)
        s_l, s_r = shifts
        # one dynamic_slice straight off the (time-stacked) buffer: a
        # shared full-row extraction would get CSE'd by XLA into a whole
        # HBM row materialization (measured 1.2 ms/step fixed cost at
        # 384^3 — the row is bigger than any chunk)
        win = _windowed_slab(self.buffers, fn, tk, toff, self.t,
                             self.params, dom_start + s_l,
                             dom_len + (hl - s_l) + (hr - s_r),
                             phase=self.phase, direction=self.direction)
        win = _upcast(win, fn)
        if key in mat:
            (win,) = jax.lax.optimization_barrier((win,))
        self._wcache[key] = win
        return win

    def access(self, e):
        fn = e.function
        specs = space_index_specs(e)
        arr = None
        windowed = False
        late_upcast = False
        if self.window is not None and not fn.is_SparseFunction:
            wdn, wstart, wlen, mat = self.window[:4]
            sh = self.window[4:] or (0, 0)
            sd = fn.space_dimensions
            if (specs and sd and sd[0].name == wdn
                    and specs[0][0] == 'rel' and specs[0][1] == wdn):
                arr = self._windowed_row(fn, e, wstart, wlen, mat, sh)
                windowed = True
        if arr is None:
            if isinstance(self.buffers.get(fn.name), tuple):
                # phase-unrolled slots: slice the NARROW slot per tap and
                # upcast after — a per-access full-slot upcast node does
                # not CSE across taps and XLA materializes each as a
                # full-grid fp32 copy (measured 21 ms/step at bf16 512^3
                # vs 4.1 on the stacked path)
                from .executor import _resolve_time_indexed
                from ..ir.lowering import time_access_of
                tk, toff = time_access_of(e)
                arr = _resolve_time_indexed(
                    self.buffers, fn, tk, toff, self.t, self.direction,
                    params=self.params, upcast=False, phase=self.phase)
                late_upcast = True
            else:
                arr = self._time_resolved(fn, e)
        halo = fn.dev_halo
        last_plain = (specs and specs[-1][0] == 'rel'
                      and specs[-1][1] == fn.space_dimensions[-1].name
                      and specs[-1][2] == 0)
        if last_plain and specs[-1][1] not in self.region:
            # indexing dim outside the region (stride_map parent)
            last_plain = False
        if last_plain:
            # a halo-extended read region (CIRE temporaries computed into
            # the halo) also needs the synthesized z halo
            start, length = self.region[specs[-1][1]]
            if getattr(fn, 'is_zcompact', False):
                # device buffer carries round_up(n, 128) lanes: the dead
                # tail (kept zero) serves tail-extended regions directly
                nlast = fn._zdev_extent()
            else:
                nlast = (fn.shape[1:] if fn.is_TimeFunction
                         else fn.shape)[-1]
            if start < 0 or start + length > nlast:
                last_plain = False
        if getattr(fn, 'is_zcompact', False) and specs and not last_plain:
            # z-compact layout: synthesize the z halo with an in-VMEM
            # zero-pad of the (already staged) time-resolved row — the
            # pads of all taps of one row CSE into a single copy, which
            # XLA's memory-space assignment pins in VMEM (the padded-HBM
            # layout instead streams `round_up(n+2h,128)` lanes per row;
            # measured 1.9x on v5e, experiments/stencil_probe8.py)
            import jax.numpy as jnp
            zh = tuple(fn.halo[-1])
            arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [zh])
            halo = halo[:-1] + (zh,)
        # slice each axis by its INDEXING dimension's region (usually the
        # axis's own dim; another one for transposed indexing A[j, i]);
        # absolute indices become broadcast length-1 lines
        # origin offsets translate GLOBAL region coordinates to the local
        # buffer of a SubDomain-defined function (zero for whole-grid)
        origin = fn.origin_offset if hasattr(fn, 'origin_offset') else None
        slices, idx_dims = [], []
        for ax, (sp, (hl, hr)) in enumerate(zip(specs, halo)):
            oo = origin[ax] if origin else 0
            if windowed and ax == 0:
                # the slab already starts at the chunk-region start
                # (which is TRACED under the rolled chunk loop): the
                # slab-local slice offset is static — margin + tap
                # offset, where margin = hl shrunk by the halo-extended
                # region's left overhang
                _, dn, off = sp
                _, length = self.region[dn]
                m_l = hl - sh[0]
                slices.append(slice(m_l + off, m_l + off + length))
                idx_dims.append(dn)
                continue
            if sp[0] == 'abs':
                s = hl + sp[1] - oo
                slices.append(slice(s, s + 1))
                idx_dims.append(None)
            elif sp[1] not in self.region and sp[1] in self.stride_map:
                # strided access through the parent of a subsampled
                # region dimension: parent index = factor*sub + off
                _, dn, off = sp
                rdn, f = self.stride_map[dn]
                start, length = self.region[rdn]
                s = hl + f * start + off - oo
                slices.append(slice(s, s + f * (length - 1) + 1, f))
                idx_dims.append(rdn)
            else:
                _, dn, off = sp
                start, length = self.region[dn]
                s = hl + start + off - oo
                slices.append(slice(s, s + length))
                idx_dims.append(dn)
        # a tail-extended write region (z-compact targets overcompute into
        # their dead lane tail, executor._zdev_pad) may slice past a
        # padded-layout operand's lane extent: zero-pad the shortfall —
        # those output lanes are masked back to zero at the fusion root
        last = slices[-1] if slices else None
        if (isinstance(last, slice) and last.step in (None, 1)
                and last.stop is not None and last.stop > arr.shape[-1]):
            import jax.numpy as jnp
            arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1)
                          + [(0, last.stop - arr.shape[-1])])
        arr = arr[tuple(slices)]
        if late_upcast:
            from .executor import _upcast
            arr = _upcast(arr, fn)
        # Align axes to the region's dimension order. Grid-backed stencil
        # accesses index each axis by its own dim in grid order (no-op);
        # free-dimension contractions (Inc(b, A[i,j]*x[j]), reference
        # misc/linalg.py), transposed indexing, and reduced-rank functions
        # need an explicit permute + broadcast.
        rnames = list(self.region)
        if idx_dims != rnames:
            own = [d.name for d in fn.space_dimensions]
            # absolute axes anchor to their own dim's slot when available
            anchored = [dn if dn is not None else
                        (on if on in rnames else None)
                        for dn, on in zip(idx_dims, own)]
            # drop abs axes with no region slot (length 1, squeeze)
            keep = [a for a, dn in enumerate(anchored) if dn is not None]
            if len(keep) < len(anchored):
                arr = arr.reshape(tuple(arr.shape[a] for a in keep))
                anchored = [anchored[a] for a in keep]
            pos = [rnames.index(dn) for dn in anchored]
            order = sorted(range(len(anchored)), key=lambda a: pos[a])
            if order != list(range(len(anchored))):
                arr = arr.transpose(tuple(order))
            shape = [1] * len(rnames)
            for t, a in enumerate(order):
                shape[pos[a]] = arr.shape[t]
            arr = arr.reshape(tuple(shape))
        return arr


class SparseCtx(BaseCtx):
    """Sparse point context: dense accesses -> gathers at interpolation
    corner indices; sparse accesses -> point rows.

    Built by the executor from a sparse function's interpolator: provides
    ``corner_idx`` {dim name: int array (C, P)} (absolute domain coords,
    clipped), ``weights`` (C, P) including the out-of-bounds mask, and the
    sparse row time resolution.
    """

    def __init__(self, buffers, params, corner_idx, weights, sparse_fn,
                 t=None, direction=1, cz=1, own=None, phase=None):
        super().__init__(buffers, params, t=t, direction=direction,
                         phase=phase)
        self.cz = cz
        self.corner_idx = corner_idx
        self.weights = weights
        self.sparse_fn = sparse_fn
        # owner-bucketed mode (parallel/halo.py bucket_sparse_points):
        # the geometry covers only this shard's owned points; sparse
        # rows are gathered down to them point-by-point
        self.own = own

    def access(self, e):
        import jax.numpy as jnp
        fn = e.function
        if fn.is_SparseFunction:
            row = self._time_resolved(fn, e)  # (P,)
            if self.own is not None:
                row = row[..., self.own]  # (C,) owned points
            return row
        # dense gather at corners (z-compact functions are never gathered
        # at a nonzero z offset — Operator._find_zcompact_candidates)
        arr = self._time_resolved(fn, e)
        offs = space_offsets_of(e)
        idxs = []
        for (d, off, (hl, hr)) in zip(fn.space_dimensions, offs,
                                      fn.dev_halo):
            idxs.append(self.corner_idx[d.name] + (hl + off))
        C, P = idxs[0].shape
        cz = self.cz if C % max(self.cz, 1) == 0 else 1
        if arr.ndim >= 2 and C * P >= 4096:
            # TPU-friendly large gather: scalar gathers serialize on TPU
            # (measured 4 ms for 8x36k points on a 212^3 field — it
            # dominated the whole TTI step). Instead gather contiguous
            # LANE ROWS over the leading dims (DMA-friendly) — one row
            # per DISTINCT leading-corner group (the innermost dim varies
            # fastest in the corner enumeration) — then select innermost
            # indices with a fused one-hot lane reduction (the
            # iota-compare never materializes).
            lead = tuple(ix[::cz] for ix in idxs[:-1])   # (C/cz, P) each
            rows = arr[lead]                             # (C/cz, P, L)
            L = arr.shape[-1]
            zi = idxs[-1].reshape(C // cz, cz, P)        # (C/cz, cz, P)
            sel = (zi[..., None] ==
                   jnp.arange(L, dtype=idxs[-1].dtype))  # (C/cz, cz, P, L)
            val = jnp.sum(rows[:, None] * sel.astype(arr.dtype), axis=-1)
            return val.reshape(C, P)
        return arr[tuple(idxs)]  # (C, P)
