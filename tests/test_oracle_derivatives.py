"""Derivative-stencil parity sweep vs the executed reference.

For a matrix of (fd_order, deriv_order, staggering, transpose) cases, apply
the derivative to the same random field through an Operator on both sides
and compare outputs elementwise. This pins our FD index-generation and
weight-synthesis conventions (incl. the 2-point demotion of first
derivatives at fd_order=2, forward/backward bias, staggered lattices and
adjoint index flips) to the reference's actual behavior rather than to a
re-derivation of it.

Skipped automatically when no reference checkout is available.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit('/', 1)[0])

from oracle import harness  # noqa: E402

pytestmark = pytest.mark.skipif(not harness.available(),
                                reason="reference oracle unavailable")

N = 24
RNG = np.random.default_rng(7)
FIELD = RNG.standard_normal((N, N)).astype(np.float64)

CASES = [
    # (fd_order, expr_spec, label)
    (2, 'dx', 'dx-so2'),           # demoted 2-point forward
    (2, 'dx.T', 'dxT-so2'),        # demoted 2-point, transposed
    (4, 'dx', 'dx-so4'),
    (4, 'dx.T', 'dxT-so4'),
    (8, 'dx', 'dx-so8'),
    (2, 'dx2', 'dx2-so2'),
    (4, 'dx2', 'dx2-so4'),
    (8, 'dy2', 'dy2-so8'),
    (4, 'dxdy', 'cross-so4'),
    (8, 'dxdy', 'cross-so8'),
    (2, 'laplace', 'laplace-so2'),
    (6, 'laplace', 'laplace-so6'),
    (6, 'dx2.T', 'dx2T-so6'),
    (4, 'dy', 'dy-so4'),
    (4, 'dy.T', 'dyT-so4'),
    (6, 'dx', 'dx-so6'),
    (2, 'dx2', 'dx2-so2-again'),
    (4, 'dxl', 'left-so4'),
    (4, 'dxr', 'right-so4'),
]


def _run_ref(spec, so, staggered):
    ref = harness.reference()
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(N, N), extent=(N - 1., N - 1.), dtype=np.float64)
        x, y = g.dimensions
        stag = {'staggered': x} if staggered else {}
        f = dv.Function(name='forc', grid=g, space_order=so, **stag)
        w = dv.Function(name='worc', grid=g, space_order=so)
        f.data[:] = FIELD
        expr = f
        for part in spec.split('.'):
            expr = getattr(expr, part)
        dv.Operator(dv.Eq(w, expr))()
        return np.asarray(w.data).copy()


def _run_ours(spec, so, staggered):
    from devito_tpu import Grid, Function, Eq, Operator
    g = Grid(shape=(N, N), extent=(N - 1., N - 1.), dtype=np.float64)
    x, y = g.dimensions
    stag = {'staggered': x} if staggered else {}
    f = Function(name='forc', grid=g, space_order=so, **stag)
    w = Function(name='worc', grid=g, space_order=so)
    f.data[:] = FIELD
    expr = f
    for part in spec.split('.'):
        expr = getattr(expr, part)
    Operator(Eq(w, expr))()
    return np.asarray(w.data)


@pytest.mark.parametrize('so,spec,label', CASES,
                         ids=[c[2] for c in CASES])
def test_derivative_matches_oracle(so, spec, label):
    a = _run_ref(spec, so, staggered=False)
    b = _run_ours(spec, so, staggered=False)
    # compare the interior (both sides apply their own halo handling at
    # the boundary: reference reads zero-initialized halo, so do we)
    h = so
    sl = (slice(h, -h),) * 2
    assert np.allclose(b[sl], a[sl], rtol=1e-6, atol=1e-6), \
        f"{label}: maxdiff {np.abs(b[sl] - a[sl]).max():.3e}"


@pytest.mark.parametrize('so,spec,label', [
    (2, 'dx', 'stag-dx-so2'),      # demoted 2-point BACKWARD bias
    (4, 'dx', 'stag-dx-so4'),      # staggered lattice, even points
    (4, 'dx.T', 'stag-dxT-so4'),
    (8, 'dx', 'stag-dx-so8'),
], ids=lambda c: c if isinstance(c, str) else '')
def test_staggered_derivative_matches_oracle(so, spec, label):
    a = _run_ref(spec, so, staggered=True)
    b = _run_ours(spec, so, staggered=True)
    h = so
    sl = (slice(h, -h),) * 2
    assert np.allclose(b[sl], a[sl], rtol=1e-6, atol=1e-6), \
        f"{label}: maxdiff {np.abs(b[sl] - a[sl]).max():.3e}"
