"""solve(): rearrange a PDE for a target.

Reference parity: devito/operations/solve.py:19 (fast-path ``linsolve``
for expressions linear in the target, sympy.solve fallback).
"""

import sympy

from ..finite_differences.differentiable import evaluate_expr, diffify
from ..exceptions import InvalidOperator

__all__ = ['solve']


def solve(eq, target, **kwargs):
    """Solve ``eq`` (an Eq or an expression implicitly == 0) for ``target``
    (typically ``u.forward``). Fast path: linear extraction a*target + b
    -> -b/a; falls back to sympy.solve."""
    if isinstance(eq, sympy.Eq):
        expr = eq.lhs - eq.rhs
    else:
        expr = eq
    expr = evaluate_expr(expr)
    target = evaluate_expr(target)

    b = expr.subs(target, 0)
    a = sympy.expand(expr - b).coeff(target)
    if a == 0:
        a = sympy.simplify(expr.subs(target, 1) - b)
    if a == 0:
        sols = sympy.solve(expr, target)
        if not sols:
            raise InvalidOperator(f"Cannot solve for {target}")
        return diffify(sols[0])
    return diffify(-b / a)
