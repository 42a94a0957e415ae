"""Separable (tensor-product) sparse interpolation.

Most acquisition geometries are tensor products: a surface receiver grid
is ``{x_i} x {y_j} x {z0}``, a receiver line is ``{x_i} x {z0}``.  The
reference's generated C gathers each point's stencil corners pointwise
(devito/operations/interpolators.py:210 WeightedInterpolator) — cheap on
a cached CPU, expensive on TPU where gathers serialize.  When the
runtime coordinates factorize into a product of per-axis position sets,
interpolation is a chain of per-axis contractions: tiny dense matmuls
that run on the MXU and read each sampled field exactly once.

The factorization runs host-side at ``Operator.apply`` time (coordinates
are concrete there); the per-axis weight matrices ship as runtime
buffers, so coordinate changes never retrace.  Weight/clip/out-of-bounds
semantics mirror the gather path (`compiler/executor.py
_sparse_geometry`) exactly: ``base = floor(px)``, corner indices clipped
to ``[0, n-1]`` (duplicates accumulate), a point whose position leaves
``[0, n-1]`` in any axis contributes zero.
"""

import numpy as np

__all__ = ['separable_geometry']


def _host_dim_weights(interp, px):
    """Numpy mirror of the interpolators' ``dim_weights`` (traced)
    methods — (offsets, list-of-weight-arrays, base indices)."""
    base = np.floor(px).astype(np.int64)
    frac = px - base
    name = getattr(interp, 'name', '')
    if name == 'linear':
        return [0, 1], [1.0 - frac, frac], base
    if name == 'sinc':
        r, b = interp.r, interp._b_table[interp.r]
        b0 = float(np.i0(b))
        offsets = list(range(-r + 1, r + 1))
        ws = []
        for off in offsets:
            rpos = off - frac
            arg = np.maximum(1.0 - (rpos / r) ** 2, 0.0)
            w = np.i0(b * np.sqrt(arg)) / b0 * np.sinc(rpos)
            ws.append(w)
        return offsets, ws, base
    raise NotImplementedError(name)


def separable_geometry(sf, params, min_points=1024):
    """Try to factorize ``sf``'s runtime coordinates into a tensor
    product of per-axis position sets.

    Returns None (not separable / not worth it), or a dict with
      ``M``    — per-axis weight matrices, shape (n_j, n_uj) float,
                 where n_j is the DOMAIN extent of grid dim j,
      ``code`` — (P,) int32 mapping each point to its slot in the
                 product-order raveled result, or None when that map is
                 the identity.
    """
    interp = sf.interpolator
    if getattr(interp, 'name', '') not in ('linear', 'sinc'):
        return None
    npoint = sf.npoint or 0
    if npoint < min_points:
        return None
    coords = np.asarray(type(sf)._coords_host)
    if coords.ndim != 2 or len(coords) != npoint:
        return None
    grid = sf.grid

    uniqs, invs, counts = [], [], []
    total = 1
    for j in range(coords.shape[1]):
        u, iv = np.unique(coords[:, j], return_inverse=True)
        uniqs.append(u)
        invs.append(iv)
        counts.append(len(u))
        total *= len(u)
    if total != npoint:
        return None
    code = np.ravel_multi_index(tuple(invs), tuple(counts))
    # bijection check: every product combination occurs exactly once
    seen = np.zeros(total, dtype=bool)
    seen[code] = True
    if not seen.all():
        return None

    dtype = np.float64 if np.dtype(sf.dtype) == np.float64 else np.float32
    Ms = []
    for j, d in enumerate(grid.dimensions):
        n = grid.shape[j]
        h = params.get(d.spacing.name, grid.spacing[j])
        o = grid.origin[j]
        pu = (uniqs[j] - o) / h
        offsets, wlist, base = _host_dim_weights(interp, pu)
        valid = (pu >= 0) & (pu <= n - 1)
        M = np.zeros((n, len(pu)), dtype=dtype)
        cols = np.arange(len(pu))
        for off, w in zip(offsets, wlist):
            rows = np.clip(base + off, 0, n - 1)
            np.add.at(M, (rows, cols), np.where(valid, w, 0.0))
        Ms.append(M)

    identity = bool(np.array_equal(code, np.arange(npoint)))
    return {'M': Ms, 'code': None if identity else code.astype(np.int32)}


def linear_terms(expr):
    """Decompose a sampled expression into ``[(coeff, access), ...]``
    where each access is a dense applied function (possibly offset /
    time-indexed) and each coeff is a float — or None when the
    expression is not such a linear combination (nonlinear terms,
    constant offsets, sparse factors).

    Interpolated expressions are linear in the sampled fields after
    evaluation (u + v, div(v) -> offset taps of the components), so the
    separable contraction distributes over the terms."""
    import sympy
    from ..types.basic import AbstractFunction

    terms = []

    def rec(e, c):
        if isinstance(e, AbstractFunction):
            if e.function.is_SparseFunction:
                return False
            terms.append((c, e))
            return True
        if e.is_Add:
            return all(rec(a, c) for a in e.args)
        if e.is_Mul:
            nums = [a for a in e.args if a.is_number]
            rest = [a for a in e.args if not a.is_number]
            if len(rest) != 1:
                return False
            return rec(rest[0], c * float(sympy.Float(sympy.Mul(*nums))))
        return False

    if not rec(expr, 1.0):
        return None
    return terms
