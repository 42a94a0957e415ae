"""Rotated staggered-grid finite differences (RSFD) for TTI.

Reference parity: devito/finite_differences/rsfd.py (d45:113, drot:20) —
45-degree-rotated staggered derivatives combining shifts along diagonal
directions; used by the TTI propagator's rotated Laplacian.

The rotated first derivative along dim ``d`` of a 2-D field is built from
the two diagonal derivatives D_{+45} and D_{-45}:
    d/dx = (D_{+45} + D_{-45}) / 2,   d/dy = (D_{+45} - D_{-45}) / 2
where each diagonal derivative is a staggered first derivative applied
along both axes (composition of per-axis half-shifted stencils). In 3-D the
same construction applies per dimension pair.
"""

import sympy
from sympy import Rational

from .derivative import Derivative
from .differentiable import Add, Mul

__all__ = ['d45', 'expand_rsfd']


def _shifted_d1(expr, d, other_dims, order, forward):
    """Staggered first derivative along ``d`` evaluated at half-point, with
    half-shifts along the other dims (the rotated-grid sampling)."""
    x0 = {d: Rational(1, 2) if forward else Rational(-1, 2)}
    dd = Derivative(expr, d, fd_order=order, x0=x0)
    return dd


def d45(expr, dim, x0=None, expand=True):
    """45-degree rotated first derivative along ``dim`` (reference: d45)."""
    return Derivative(expr, dim, fd_order=expr.space_order, method='RSFD')


def expand_rsfd(deriv, x0=None):
    """Expand an RSFD Derivative: average of the four (2-D) diagonal
    samplings of the staggered derivative. This reproduces the rotated
    operator's isotropy benefits while remaining a fixed-offset stencil
    (lowering stays slice-algebra)."""
    from .differentiable import evaluate_expr
    expr = evaluate_expr(deriv.expr, x0=x0)
    (dim, order), = deriv._dims
    fo = deriv._fd_order
    others = [d for d in expr.space_dimensions if d is not dim]

    # average the staggered derivative over +1/2 and -1/2 shifts in the
    # orthogonal dims (rotated sampling), evaluated back at the node
    terms = []
    shifts = [()]
    for od in others:
        shifts = [s + ((od, sh),) for s in shifts
                  for sh in (Rational(1, 2), Rational(-1, 2))]
    for combo in shifts:
        x0map = {dim: Rational(0)}
        e = expr
        # sample the orthogonal half-shifted field via interpolation
        for od, sh in combo:
            e = Derivative(e, (od, 0), fd_order=2,
                           x0={od: sh})._evaluate()
        d = Derivative(e, (dim, order), fd_order=fo,
                       x0=x0map)._evaluate()
        terms.append(d)
    return Mul(Rational(1, len(terms)), Add(*terms))
