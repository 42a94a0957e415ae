"""Finite-difference stencil synthesis: index generation + weights.

Reference parity: devito/finite_differences/tools.py (generate_indices:244,
numeric_weights:235) and finite_difference.py (generic_derivative:104,
make_derivative:158). Weights are exact sympy Rationals (same property the
reference relies on for its 1e-11/1e-12 adjoint tolerances), divided by the
spacing symbol raised to the derivative order.

Index convention (TPU build): indices are in *grid-point units*; a stencil
point is an integer shift ``k`` of the dimension index, whose physical
location is ``k + stagger`` (stagger in {0, 1/2}) in units of spacing.
"""

import sympy
from sympy import Rational

__all__ = ['generate_indices', 'fd_weights', 'stencil_points']


def generate_indices(fd_order, deriv_order, x0=0, stagger=0, side=None,
                     bias='forward'):
    """Return the integer index shifts ``k_i`` for a stencil evaluating the
    ``deriv_order``-th derivative at physical offset ``x0`` of an expression
    whose accesses sit at physical offset ``stagger``.

    - side=None, (x0 - stagger) integer: centered, fd_order+1 points
      (fd_order+deriv_order-1 points would be minimal; the reference also uses
      fd_order+1 for standard derivatives).
    - side=None, (x0 - stagger) half-integer: staggered, fd_order points.
    - side='left'/'right': one-sided, fd_order+1 points ending/starting at x0.
    """
    x0 = Rational(x0)
    stagger = Rational(stagger)
    rel = x0 - stagger  # location of eval point in the expr's index space

    if side == 'left':
        base = sympy.floor(rel)
        ks = [base - i for i in range(fd_order + 1)]
        ks.reverse()
    elif side == 'right':
        base = sympy.ceiling(rel)
        ks = [base + i for i in range(fd_order + 1)]
    elif rel.is_integer:
        r = max(fd_order // 2, 1)
        # For a first/odd derivative with fd_order==1 use a 2-point stencil,
        # forward-biased on time/unstaggered expressions and backward-biased
        # on staggered ones (reference generate_indices tie-break,
        # finite_differences/tools.py:296-301)
        if fd_order == 1:
            if deriv_order % 2 == 0:
                ks = [rel - 1, rel, rel + 1]
            elif bias == 'backward':
                ks = [rel - 1, rel]
            else:
                ks = [rel, rel + 1]
            ks = [sympy.Integer(k) for k in ks]
        else:
            ks = [rel + i for i in range(-r, r + 1)]
    else:
        # Half-integer offset: fd_order points symmetric around rel
        n = max(fd_order, 2)
        lo = sympy.floor(rel) - (n // 2 - 1)
        ks = [lo + i for i in range(n)]
    return [sympy.Integer(k) for k in ks]


def fd_weights(deriv_order, points, x0):
    """Exact FD weights for evaluating the ``deriv_order``-th derivative at
    ``x0`` from samples at ``points`` (all in units of spacing). Returns a
    list of sympy Rationals (to be divided by spacing**deriv_order).
    """
    if deriv_order == 0:
        if len(points) == 1:
            return [sympy.Integer(1)]
        table = sympy.finite_diff_weights(0, points, x0)
        return table[0][-1]
    table = sympy.finite_diff_weights(deriv_order, points, x0)
    return table[deriv_order][-1]


def stencil_points(fd_order, deriv_order, x0=0, stagger=0, side=None,
                   transpose=False, bias='forward'):
    """Return [(k_i, w_i)]: integer index shifts and exact weights.

    ``transpose=True`` returns the adjoint stencil with the reference's
    convention: same weights at negated PHYSICAL offsets (the reference's
    ``IndexSet.transpose`` maps ``x + p*h -> x - p*h`` with ``p`` including
    the stagger, tools.py:180-193), i.e. index shifts
    ``k' = -k - 2*stagger``. For unstaggered expressions this is the plain
    index negation ``-k``.
    """
    ks = generate_indices(fd_order, deriv_order, x0=x0, stagger=stagger,
                          side=side, bias=bias)
    pts = [k + Rational(stagger) for k in ks]
    ws = fd_weights(deriv_order, pts, Rational(x0))
    pairs = list(zip(ks, ws))
    if transpose:
        s2 = 2 * Rational(stagger)
        pairs = [(-k - s2, w) for k, w in pairs]
    return pairs
