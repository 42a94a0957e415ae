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

    if fd_order == 1 and rel.is_integer and side in (None, 'centered'):
        # 2-point stencil for a first/odd derivative (and the 3-point
        # centered one for even orders), forward-biased on
        # time/unstaggered expressions and backward-biased on staggered
        # ones (reference generate_indices tie-break, tools.py:296-301)
        if deriv_order % 2 == 0:
            ks = [rel - 1, rel, rel + 1]
        elif bias == 'backward':
            ks = [rel - 1, rel]
        else:
            ks = [rel, rel + 1]
        return [sympy.Integer(k) for k in ks]

    # the reference's unified window (tools.py:293-301): a centered
    # radius-fd_order/2 window around the evaluation point, shifted one
    # point for one-sided schemes; degenerate single-point windows grow
    # forward (time/unstaggered) or backward (staggered)
    sv = {'left': -1, 'right': 1}.get(side, 0)
    r = Rational(fd_order, 2)
    o_min = int(sympy.ceiling(rel - r)) + sv
    o_max = int(sympy.floor(rel + r)) + sv
    if o_max == o_min:
        if bias == 'backward':
            o_min -= 1
        else:
            o_max += 1
    ks = list(range(o_min, o_max + 1))
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
