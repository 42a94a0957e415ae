"""Cross-iteration redundancy elimination, TPU-style (reference:
devito/passes/clusters/aliases.py cire:34, the reference's flagship
flop-reduction pass).

The reference extracts aliasing derivative subexpressions into Array
temporaries so its generated loops compute them once per block. Under XLA
the equivalent problem appears as *memory traffic*: nested rotated
derivatives (TTI's ``Gzz = D_z'^T(b D_z' u)``) and cross-equation shared
operators (both TTI updates read ``Gxx`` and ``Gz``) trace into a graph
whose fusion boundaries materialize the same stencil chains many times —
measured 8.9 GB/step vs ~0.5 GB ideal on a 192³ TTI step
(experiments/tti_flops.py).

This pass rewrites the *unevaluated* equations:

1. nested derivatives: every maximal derivative-containing subexpression
   sitting under another ``Derivative`` is materialized into a temporary
   grid Function, computed over a halo-extended region so the outer
   stencil's taps stay valid;
2. cross-equation sharing: top-level derivative subexpressions occurring
   in more than one equation are materialized once.

Rewrites are algebraically exact — the temporary's expansion is identical
to what in-place evaluation would have produced at every consumed index —
so adjoint/gradient tolerances are unchanged.
"""

import sympy

from ..finite_differences.derivative import Derivative, _expr_any_stagger
from ..types.equation import Eq

__all__ = ['extract_derivative_temps']


def _has_deriv(expr):
    if isinstance(expr, Derivative):
        return True
    if not isinstance(expr, sympy.Basic):
        return False
    return any(_has_deriv(a) for a in expr.args)


def _deriv_radius(deriv):
    """Maximal stencil radius (grid points) of a Derivative's taps."""
    from ..finite_differences.tools import stencil_points
    from ..utils import as_tuple
    r = 0
    fd_orders = as_tuple(deriv._fd_order, len(deriv._dims))
    for (dim, order), fo in zip(deriv._dims, fd_orders):
        try:
            x0 = deriv._x0.get(dim, 0)
            x0 = sympy.Rational(sympy.sympify(x0) - dim) if \
                getattr(x0, 'free_symbols', None) else sympy.Rational(x0)
        except Exception:
            x0 = 0
        try:
            pairs = stencil_points(fo if fo else 2, order, x0=x0,
                                   transpose=deriv._transpose)
            r = max(r, max(abs(int(k)) for k, _ in pairs))
        except Exception:
            r = max(r, (int(fo or 2) + 1) // 2 + 1)
    return r


class _Extractor:
    def __init__(self, grid, dtype, space_order):
        self.grid = grid
        self.dtype = dtype
        self.space_order = space_order
        self.temps = []          # [(Function, expr, radius)]
        self.memo = {}           # srepr -> Function access

    def materialize(self, expr, radius, staggered=None):
        key = expr
        if key in self.memo:
            fn, old_r = self.memo[key]
            if radius > old_r:
                self.memo[key] = (fn, radius)
                for i, (f, e, r) in enumerate(self.temps):
                    if f is fn:
                        self.temps[i] = (f, e, radius)
            return fn
        from ..types.dense import Function
        fn = Function(name=f'cire{len(self.temps)}', grid=self.grid,
                      space_order=self.space_order, dtype=self.dtype,
                      staggered=staggered)
        type(fn)._compiler_temp = True
        self.memo[key] = (fn, radius)
        self.temps.append((fn, expr, radius))
        return fn

    def _rewrite_operand(self, expr, radius):
        """Replace every maximal derivative-containing subtree of a
        Derivative operand with a temp access."""
        if isinstance(expr, Derivative):
            # a nested Derivative: rewrite ITS operand first (bottom-up),
            # then materialize the whole node
            inner = self._rewrite_operand(expr.expr, _deriv_radius(expr))
            if inner is not expr.expr:
                expr = expr.func(inner)
            return self.materialize(expr, radius)
        if not isinstance(expr, sympy.Basic) or not expr.args:
            return expr
        if not _has_deriv(expr):
            return expr
        if isinstance(expr, sympy.Add):
            if all(_has_deriv(a) for a in expr.args):
                # pure derivative sum (e.g. the rotated Gz): one temp;
                # bottom-up — handle nesting inside each term first
                args = []
                for a in expr.args:
                    if isinstance(a, Derivative) and _has_deriv(a.expr):
                        inner = self._rewrite_operand(a.expr,
                                                      _deriv_radius(a))
                        a = a.func(inner)
                    args.append(a)
                return self.materialize(expr.func(*args), radius)
            # mixed: descend
        new_args = [self._rewrite_operand(a, radius) for a in expr.args]
        if all(n is o for n, o in zip(new_args, expr.args)):
            return expr
        try:
            return expr.func(*new_args)
        except TypeError:
            return expr.func(*new_args, evaluate=False)

    def rewrite_nested(self, expr):
        """Top-down walk: for each Derivative with derivative-containing
        operand, extract the operand's derivative subtrees."""
        if isinstance(expr, Derivative):
            if _has_deriv(expr.expr) and expr._method == 'FD' and \
                    expr._weights is None and \
                    not _expr_any_stagger(expr.expr):
                # staggered operands are left in place: a node-anchored
                # temporary would change the staggered-lattice projection
                # rules (elastic/viscoelastic systems)
                new_inner = self._rewrite_operand(expr.expr,
                                                  _deriv_radius(expr))
                if new_inner is not expr.expr:
                    return expr.func(new_inner)
            return expr
        if not isinstance(expr, sympy.Basic) or not expr.args:
            return expr
        new_args = [self.rewrite_nested(a) for a in expr.args]
        if all(n is o for n, o in zip(new_args, expr.args)):
            return expr
        try:
            return expr.func(*new_args)
        except TypeError:
            return expr.func(*new_args, evaluate=False)


def _top_level_deriv_groups(expr, out):
    """Collect maximal derivative-containing subtrees of an rhs (for
    cross-equation sharing)."""
    if isinstance(expr, Derivative):
        out.append(expr)
        return
    if not isinstance(expr, sympy.Basic) or not expr.args:
        return
    if isinstance(expr, sympy.Add) and _has_deriv(expr) and \
            all(_has_deriv(a) for a in expr.args):
        out.append(expr)
        return
    for a in expr.args:
        _top_level_deriv_groups(a, out)


def _replace_exact(expr, mapping):
    """Replacement of whole subtrees (sympy-equality keyed)."""
    if expr in mapping:
        return mapping[expr]
    if not isinstance(expr, sympy.Basic) or not expr.args:
        return expr
    new_args = [_replace_exact(a, mapping) for a in expr.args]
    if all(n is o for n, o in zip(new_args, expr.args)):
        return expr
    try:
        return expr.func(*new_args)
    except TypeError:
        return expr.func(*new_args, evaluate=False)


def extract_derivative_temps(expressions):
    """Run the pass over user Eq objects. Returns (temp_eqs, rewritten)
    where temp_eqs are new Eq objects (with ``_halo_write`` set to the
    required write-region extension) to be scheduled before the rewritten
    originals. Returns ([], expressions) when nothing qualifies."""
    eqs = [e for e in expressions if isinstance(e, Eq)]
    if not eqs:
        return [], expressions

    # pick grid/dtype/space_order from the first grid-backed lhs
    grid = dtype = so = None
    for e in eqs:
        fn = getattr(e.lhs, 'function', None)
        if fn is not None and getattr(fn, 'grid', None) is not None \
                and not fn.is_SparseFunction:
            grid, dtype = fn.grid, fn.dtype
            so = fn.space_order or 2
            break
    if grid is None:
        return [], expressions

    ex = _Extractor(grid, dtype, so)

    # pass 1: nested derivatives, recording which temps each eq spawned
    stage1 = []
    spawned = {}   # id(rewritten eq) -> [temp indices created for it]
    changed = False
    for e in expressions:
        n0 = len(ex.temps)
        if isinstance(e, Eq) and _has_deriv(e.rhs):
            new_rhs = ex.rewrite_nested(e.rhs)
            if new_rhs is not e.rhs:
                changed = True
                e = e.func(e.lhs, new_rhs, evaluate=False)
        spawned[id(e)] = list(range(n0, len(ex.temps)))
        stage1.append(e)

    # pass 2: cross-equation shared derivative groups (counted on the
    # stage-1 forms; rewritten with temps placed at their first consumer)
    owners = {}
    lhs_sigs = {}
    for e in stage1:
        if isinstance(e, Eq) and _has_deriv(e.rhs):
            groups = []
            _top_level_deriv_groups(e.rhs, groups)
            lhs_fn = getattr(e.lhs, 'function', None)
            sig = getattr(lhs_fn, 'staggered', None) if lhs_fn is not None \
                else None
            for g in groups:
                owners.setdefault(g, set()).add(id(e))
                lhs_sigs.setdefault(g, set()).add(sig)
    # staggered groups are extracted only when every consumer's lhs
    # sits on one common lattice (e.g. elastic's diag(div(v)) shared by
    # the three node diagonal stress equations) — the temporary then
    # carries that stagger and the _eval_at projection is unchanged
    shared = {}
    for g, own in owners.items():
        if len(own) < 2:
            continue
        if not _expr_any_stagger(g):
            shared[g] = None
        elif len(lhs_sigs[g]) == 1:
            shared[g] = next(iter(lhs_sigs[g]))

    stage2 = []
    for e in stage1:
        n0 = len(ex.temps)
        if shared and isinstance(e, Eq) and _has_deriv(e.rhs):
            mapping = {g: None for g in shared}
            stags = dict(shared)
            # materialize lazily so placement lands at the first consumer
            def _map(expr):
                if expr in mapping:
                    if mapping[expr] is None:
                        mapping[expr] = ex.materialize(
                            expr, 0, staggered=stags[expr])
                    return mapping[expr]
                if not isinstance(expr, sympy.Basic) or not expr.args:
                    return expr
                new_args = [_map(a) for a in expr.args]
                if all(n is o for n, o in zip(new_args, expr.args)):
                    return expr
                try:
                    return expr.func(*new_args)
                except TypeError:
                    return expr.func(*new_args, evaluate=False)
            new_rhs = _map(e.rhs)
            if new_rhs is not e.rhs:
                changed = True
                e2 = e.func(e.lhs, new_rhs, evaluate=False)
                spawned[id(e2)] = spawned.pop(id(e), []) + \
                    list(range(n0, len(ex.temps)))
                e = e2
            else:
                spawned[id(e)] = spawned.get(id(e), []) + \
                    list(range(n0, len(ex.temps)))
        stage2.append(e)

    if not changed:
        return [], expressions

    def _temp_eq(idx):
        fn, expr, radius = ex.temps[idx]
        te = Eq(fn, expr, evaluate=False)
        te._halo_write = min(radius, min(h[0] for h in fn.halo) if fn.halo
                             else radius)
        return te

    # interleave: each temp right before its first consuming equation, so
    # temps reading body-written values (e.g. the adjoint's r.backward)
    # see the current iteration's value
    out = []
    emitted = set()
    for e in stage2:
        for idx in spawned.get(id(e), ()):
            if idx not in emitted:
                emitted.add(idx)
                out.append(_temp_eq(idx))
        out.append(e)
    for idx in range(len(ex.temps)):
        if idx not in emitted:
            out.append(_temp_eq(idx))
    return [], out
