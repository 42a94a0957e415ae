"""FD derivative correctness: weights, Taylor convergence order, transpose.

Reference parity: tests/test_derivatives.py (81 tests) — here the core
behavioral subset: stencil weights, convergence orders vs analytic
derivatives, adjoint (transpose) antisymmetry, staggered stencils.
"""

import numpy as np
import pytest
import sympy

from devito_tpu import Grid, Function, TimeFunction, Eq, Operator, dimensions
from devito_tpu.finite_differences.tools import stencil_points


class TestWeights:

    def test_centered_second_order(self):
        pairs = stencil_points(2, 2)
        assert pairs == [(-1, 1), (0, -2), (1, 1)]

    def test_centered_first_so2(self):
        pairs = dict(stencil_points(2, 1))
        assert pairs[-1] == sympy.Rational(-1, 2)
        assert pairs[1] == sympy.Rational(1, 2)

    def test_weights_sum_zero(self):
        for fo in (2, 4, 8, 12, 16):
            for do in (1, 2):
                ws = [w for _, w in stencil_points(fo, do)]
                assert sum(ws) == 0

    def test_interpolation_weights_sum_one(self):
        # deriv_order=0 -> interpolation to staggered point
        ws = [w for _, w in stencil_points(4, 0, x0=sympy.Rational(1, 2))]
        assert sum(ws) == 1

    def test_staggered_first_order(self):
        # so=2 staggered first derivative: (u[x+1]-u[x])/h at x+1/2
        pairs = stencil_points(2, 1, x0=sympy.Rational(1, 2))
        d = dict(pairs)
        assert d[0] == -1 and d[1] == 1

    def test_transpose_negates_offsets(self):
        fwd = stencil_points(8, 1)
        t = stencil_points(8, 1, transpose=True)
        assert sorted(t) == sorted((-k, w) for k, w in fwd)


class TestConvergence:
    """FD approximations converge at the advertised order."""

    @pytest.mark.parametrize('so', [2, 4, 8])
    def test_first_derivative_order(self, so):
        errs = []
        for n in (32, 64):
            h = 2 * np.pi / n
            x = np.arange(n) * h
            f = np.sin(x)
            approx = np.zeros(n)
            for k, w in stencil_points(so, 1):
                approx += float(w) * np.roll(f, -int(k))
            approx /= h
            errs.append(np.abs(approx - np.cos(x)).max())
        rate = np.log2(errs[0] / errs[1])
        assert abs(rate - so) < 0.35

    @pytest.mark.parametrize('so', [2, 4, 8])
    def test_second_derivative_order(self, so):
        errs = []
        for n in (32, 64):
            h = 2 * np.pi / n
            x = np.arange(n) * h
            f = np.sin(x)
            approx = np.zeros(n)
            for k, w in stencil_points(so, 2):
                approx += float(w) * np.roll(f, -int(k))
            approx /= h ** 2
            errs.append(np.abs(approx + np.sin(x)).max())
        rate = np.log2(errs[0] / errs[1])
        assert abs(rate - so) < 0.35

    @pytest.mark.parametrize('so', [2, 4, 8])
    def test_staggered_derivative_order(self, so):
        errs = []
        for n in (32, 64):
            h = 2 * np.pi / n
            x = np.arange(n) * h
            f = np.sin(x)
            approx = np.zeros(n)
            for k, w in stencil_points(so, 1, x0=sympy.Rational(1, 2)):
                approx += float(w) * np.roll(f, -int(k))
            approx /= h
            # derivative evaluated at x + h/2
            errs.append(np.abs(approx - np.cos(x + h / 2)).max())
        rate = np.log2(errs[0] / errs[1])
        assert abs(rate - so) < 0.35


class TestSymbolicAPI:

    def test_shortcuts(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=4)
        x, y = grid2d.dimensions
        assert u.dx.dims == (x,)
        assert u.dy2.deriv_order == 2
        assert u.dxdy.dims == (x, y)
        assert u.dt.dims[0].is_Time

    def test_laplace_term_count(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=8)
        ev = u.laplace.evaluate
        # 2 dims x 9 points, center terms may merge
        assert len(ev.args) >= 16

    def test_transpose_antisymmetry(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=8)
        assert sympy.simplify(u.dx.T.evaluate + u.dx.evaluate) == 0
        assert sympy.simplify(u.dx2.T.evaluate - u.dx2.evaluate) == 0

    def test_x0_half_offset(self, grid2d):
        u = Function(name='u', grid=grid2d, space_order=2)
        x, _ = grid2d.dimensions
        d = u.dx(x0=x + sympy.Rational(1, 2) * x.spacing)
        ev = d.evaluate
        accesses = [a for a in ev.atoms(sympy.Function)]
        offs = sorted(sympy.simplify(a.args[0] - x) for a in accesses)
        assert offs == [0, 1]

    def test_derivative_of_sum(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=2)
        v = TimeFunction(name='v', grid=grid2d, space_order=2)
        ev = (u + v).dx.evaluate
        assert sympy.simplify(ev - u.dx.evaluate - v.dx.evaluate) == 0

    def test_custom_weights(self, grid2d):
        u = Function(name='u', grid=grid2d, space_order=2)
        d = u.dx2(weights=(1, -2, 1))
        ev = d.evaluate
        x = grid2d.dimensions[0]
        assert ev.coeff(u.subs(x, x + 1)) == 1 / x.spacing ** 2
