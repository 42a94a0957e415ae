"""solve(): rearrange a PDE for a target.

Reference parity: devito/operations/solve.py:19 (fast-path ``linsolve``
for expressions linear in the target, sympy.solve fallback).
"""

import sympy

from ..finite_differences.differentiable import evaluate_expr, diffify
from ..finite_differences.derivative import Derivative
from ..exceptions import InvalidOperator

__all__ = ['solve', 'linsolve', 'eval_time_derivatives']


def eval_time_derivatives(expr):
    """Expand only the *time* derivatives (reference: solve.py:82) —
    space Derivative nodes stay lazy so equation lowering can later project
    them at the lhs stagger location (Derivative._eval_at)."""
    if isinstance(expr, Derivative):
        if any(d.is_Time for d in expr.dims):
            return expr._evaluate()
        return expr
    if not isinstance(expr, sympy.Basic) or not expr.args:
        return expr
    new_args = [eval_time_derivatives(a) for a in expr.args]
    if all(n is o for n, o in zip(new_args, expr.args)):
        return expr
    return expr.func(*new_args)


def solve(eq, target, **kwargs):
    """Solve ``eq`` (an Eq or an expression implicitly == 0) for ``target``
    (typically ``u.forward``). Fast path: linear extraction a*target + b
    -> -b/a (reference linsolve, solve.py:63); falls back to sympy.solve.
    Vector/tensor equations are solved per component.

    >>> from devito_tpu import Grid, TimeFunction, Eq
    >>> grid = Grid(shape=(4, 4))
    >>> u = TimeFunction(name='u', grid=grid)
    >>> str(solve(Eq(u.dt, 1), u.forward))
    'dt*(1 + u(t, x, y)/dt)'
    """
    from ..types.tensor import TensorLike
    if isinstance(eq, TensorLike) or isinstance(target, TensorLike):
        out = target._new_from(
            [[solve(e, t) if t != 0 else sympy.S.Zero
              for e, t in zip(erow, trow)]
             for erow, trow in zip(eq._comps, target._comps)])
        return out
    if isinstance(eq, sympy.Eq):
        expr = eq.lhs - eq.rhs
    else:
        expr = eq
    expr = eval_time_derivatives(expr)
    return linsolve(expr, target)


def linsolve(expr, target, **kwargs):
    b = expr.subs(target, 0)
    a = sympy.expand(expr - b).coeff(target)
    if a == 0:
        a = sympy.simplify(expr.subs(target, 1) - b)
    if a == 0:
        # target only appears inside spatial Derivative nodes (e.g.
        # solve(Eq(pn.laplace), pn), the Jacobi-iteration idiom of
        # 05_laplace/07_cavity/09_Darcy): expand the stencils, then
        # linear-extract the center coefficient
        ev = evaluate_expr(expr)
        b = ev.subs(target, 0)
        a = sympy.simplify(ev.subs(target, 1) - b)
        if a == 0:
            sols = sympy.solve(ev, target)
            if not sols:
                raise InvalidOperator(f"Cannot solve for {target}")
            return diffify(sols[0])
    return diffify(-b / a)
