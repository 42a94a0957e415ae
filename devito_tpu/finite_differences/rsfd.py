"""Rotated staggered-grid finite differences (RSFD) for TTI.

Reference parity: devito/finite_differences/rsfd.py (drot:20, d45:113,
dir_weights:148) — derivatives along the diagonals of the grid cell
(Saenger et al. 2000 rotated staggered grid), combined so the rotated
operator approximates d/dx, d/dy, d/dz. Used by the TTI propagator's
rotated Laplacian and by ``div45``/``grad45``/``curl45``.

Construction (per reference drot): for each cube diagonal ``dir`` with
per-dimension signs ``s_d`` the stencil index ``i`` moves simultaneously
along every grid dimension (``d -> d + s_d*i - s0_d``); the taps carry the
Taylor first-derivative weights along the derivative dimension, scaled by
``1 / (2**(ndim-1) * h_dim)``. The four (two in 2-D) diagonal derivatives
are summed with ``dir_weights`` signs to recover the axis derivative.

Index convention here is the TPU build's grid-point units: substitutions
shift dimension indices by integers (physical offsets carry the implicit
``stagger`` of the accessed expression), matching tools.stencil_points.
"""

import sympy
from sympy import Rational

from .tools import generate_indices, fd_weights

__all__ = ['d45', 'expand_rsfd']

# Per-diagonal signs (reference smapper): 3-D signs per (x, y, z); in 2-D
# take every other entry (x, z) and diagonals 3/4 vanish.
_SMAPPER = {1: (1, 1, 1), 2: (1, 1, -1), 3: (1, -1, 1), 4: (1, -1, -1)}

# How to combine the diagonal derivatives per axis (reference dir_weights).
_DIR_WEIGHTS = {(0, 2): (1, 1, 1, 1), (0, 3): (1, 1, 1, 1),
                (1, 2): (1, -1, 1, -1), (1, 3): (1, 1, -1, -1),
                (2, 2): (1, -1, 1, -1), (2, 3): (1, -1, 1, -1)}


def _shift(sign, mid):
    """Reference rsfd.shift:13 — extra whole-point shift for negative
    diagonal legs when the eval point differs from the expr's stagger."""
    if mid == 0:
        return 0 if sign > 0 else -1
    return 0 if sign > 0 else 1


def _stagger_of(expr, d):
    """Stagger offset (0 or 1/2) of the functions in ``expr`` along d."""
    from ..types.basic import retrieve_functions
    offs = {f.function.stagger_offset(d) for f in retrieve_functions(expr)}
    offs.discard(None)
    if len(offs) > 1:
        raise ValueError("RSFD requires uniform staggering across the "
                         "expression")
    return Rational(offs.pop()) if offs else Rational(0)


def _drot(expr, dim, dims, direction, x0, fd_order):
    """Diagonal derivative along cube diagonal ``direction`` (reference
    drot:20), as an explicit sum of shifted accesses."""
    ndim = len(dims)
    if direction > 2 and ndim == 2:
        return sympy.S.Zero

    scale = 2 ** (ndim - 1)
    mid = _stagger_of(expr, dim)
    start = Rational(x0.get(dim, mid))

    # integer index shifts along the derivative dim; physical points carry
    # the expr's stagger
    ks = generate_indices(fd_order, 1, x0=start, stagger=mid)
    pts = [k + mid for k in ks]
    coeffs = fd_weights(1, pts, start)

    signs = _SMAPPER[direction][::(1 if ndim == 3 else 2)]

    terms = []
    for k, w in zip(ks, coeffs):
        sub = {}
        for s, d in zip(signs, dims):
            s0 = 0 if mid == start else _shift(s, mid)
            sub[d] = d + s * int(k) - s0
        terms.append(w * expr.subs(sub, simultaneous=True))
    return sympy.Add(*terms) / (scale * dim.spacing)


def d45(expr, dim, x0=None, fd_order=None):
    """45-degree rotated first derivative of ``expr`` along ``dim``
    (reference d45:113). ``x0`` must be empty, all-node, or all-staggered
    (reference check_staggering:85)."""
    dims = getattr(expr, 'space_dimensions', None)
    if not dims:
        from ..types.basic import retrieve_functions
        fs = list(retrieve_functions(expr))
        if not fs:
            raise ValueError("Cannot infer space dimensions for RSFD")
        dims = fs[0].function.space_dimensions
    ndim = len(dims)
    if ndim not in (2, 3):
        raise ValueError("RSFD only supported in 2D and 3D")
    x0 = {k: Rational(v) for k, v in (x0 or {}).items()
          if getattr(k, 'is_Space', False)}
    vals = set(x0.values())
    if x0 and not (vals == {Rational(0)} or vals == {Rational(1, 2)}) \
            or (x0 and len(x0) != ndim):
        raise ValueError("Invalid staggering or x0 for rotated finite "
                         "differences")
    fo = fd_order or expr.space_order
    axis = list(dims).index(dim)
    w = _DIR_WEIGHTS[(axis, ndim)]
    return sympy.Add(*[w[i - 1] * _drot(expr, dim, dims, i, x0, fo)
                       for i in range(1, 5)])


def expand_rsfd(deriv, x0=None):
    """Expand a Derivative carrying ``method='RSFD'`` (hook from
    derivative.py). Only first derivatives support the rotated scheme."""
    from .differentiable import evaluate_expr
    (dim, order), = deriv._dims
    if order != 1:
        raise ValueError("RSFD only defined for first derivatives")
    expr = evaluate_expr(deriv.expr)
    x0map = dict(deriv._x0 or {})
    if x0:
        x0map.update(x0 if isinstance(x0, dict) else {})
    return d45(expr, dim, x0=x0map, fd_order=deriv._fd_order)
