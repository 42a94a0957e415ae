"""Operator-level FD derivative matrix.

Reference parity: tests/test_derivatives.py (its 81 tests' behavioral
core) — every derivative here is evaluated END-TO-END through
``Operator`` on device buffers (not just weight tables): convergence vs
analytic derivatives across order x axis x kind, cross derivatives,
custom x0 evaluation points, staggered placements, transpose adjointness
as a discrete dot-product identity, rotated (45-degree) stencils, and
vector-calculus composition identities.
"""

import numpy as np
import pytest

from devito_tpu import Grid, Function, TimeFunction, Eq, Operator

TOL_RATE = 0.45


def _grid(n, ndim=2, L=2 * np.pi, dtype=np.float64):
    # fp64 so convergence rates are not flattened by the fp32 floor;
    # n points, spacing L/n
    return Grid(shape=(n,) * ndim, extent=(L * (n - 1) / n,) * ndim,
                dtype=dtype)


def _coords(grid):
    return np.meshgrid(*[np.linspace(0, e, n)
                         for e, n in zip(grid.extent, grid.shape)],
                       indexing='ij')


def _eval_deriv(grid, data, dexpr_of, so, interior):
    u = Function(name='u', grid=grid, space_order=so)
    w = Function(name='w', grid=grid, space_order=so)
    u.data[:] = data
    Operator([Eq(w, dexpr_of(u))]).apply()
    sl = tuple(slice(interior, -interior) for _ in grid.shape)
    return np.asarray(w.data)[sl]


class TestConvergenceThroughOperator:
    # `u.dx` at so=2 is the reference's 2-point one-sided convention
    # (oracle-pinned, tests/test_oracle_derivatives.py): rate 1; even
    # orders >= 4 converge at so until the fp64 roundoff floor

    @pytest.mark.parametrize('so,want_rate', [(2, 1), (4, 4), (6, 6),
                                              (8, 8), (12, None),
                                              (16, None)])
    @pytest.mark.parametrize('axis', [0, 1])
    def test_first_derivative(self, so, want_rate, axis):
        errs = []
        for n in (48, 96):
            grid = _grid(n)
            xx = _coords(grid)
            data = np.sin(xx[axis])
            got = _eval_deriv(
                grid, data,
                lambda u: getattr(u, ('dx', 'dy')[axis]), so, so + 2)
            sl = tuple(slice(so + 2, -(so + 2)) for _ in range(2))
            errs.append(np.abs(got - np.cos(xx[axis])[sl]).max())
        if want_rate is None:
            assert errs[1] < 1e-9   # fp64 roundoff floor
        else:
            rate = np.log2(errs[0] / errs[1])
            assert rate > want_rate - TOL_RATE

    @pytest.mark.parametrize('so,want_rate', [(2, 2), (4, 4), (8, None),
                                              (16, None)])
    def test_second_derivative(self, so, want_rate):
        errs = []
        for n in (48, 96):
            grid = _grid(n)
            xx = _coords(grid)
            got = _eval_deriv(grid, np.sin(xx[0]), lambda u: u.dx2,
                              so, so + 2)
            sl = tuple(slice(so + 2, -(so + 2)) for _ in range(2))
            errs.append(np.abs(got + np.sin(xx[0])[sl]).max())
        if want_rate is None:
            assert errs[1] < 1e-10  # fp64 roundoff floor
        else:
            rate = np.log2(errs[0] / errs[1])
            assert rate > want_rate - TOL_RATE

    @pytest.mark.parametrize('so', [2, 4, 8])
    def test_cross_derivative(self, so):
        grid = _grid(96)
        x, y = _coords(grid)
        got = _eval_deriv(grid, np.sin(x) * np.sin(y),
                          lambda u: u.dxdy, so, so + 2)
        sl = (slice(so + 2, -(so + 2)),) * 2
        want = (np.cos(x) * np.cos(y))[sl]
        tol = {2: 0.2, 4: 1e-4, 8: 1e-8}[so]
        assert np.abs(got - want).max() < tol

    @pytest.mark.parametrize('so', [4, 8])
    def test_third_space_dim(self, so):
        grid = _grid(24, ndim=3)
        xx = _coords(grid)
        got = _eval_deriv(grid, np.sin(xx[2]), lambda u: u.dz, so, so)
        sl = (slice(so, -so),) * 3
        assert np.abs(got - np.cos(xx[2])[sl]).max() < 2e-3

    @pytest.mark.parametrize('order', [1, 2, 3, 4])
    def test_high_deriv_order_shortcuts(self, order):
        # u.dx, u.dx2, u.dx3, u.dx4 all resolve and converge on sin
        so = 8
        grid = _grid(64)
        x, _ = _coords(grid)
        got = _eval_deriv(grid, np.sin(x),
                          lambda u: getattr(u, f'dx{order}' if order > 1
                                            else 'dx'), so, so + order)
        sl = (slice(so + order, -(so + order)),) * 2
        want = [np.cos(x), -np.sin(x), -np.cos(x), np.sin(x)][order - 1]
        assert np.abs(got - want[sl]).max() < 5e-3


class TestEvaluationPoints:

    @pytest.mark.parametrize('so', [2, 4, 8])
    def test_x0_half_node(self, so):
        # d/dx evaluated at x + h/2: compare against analytic cos there
        grid = _grid(64)
        x, _ = _coords(grid)
        h = grid.spacing[0]
        d = grid.dimensions[0]
        got = _eval_deriv(grid, np.sin(x),
                          lambda u: u.dx(x0=d + d.spacing / 2), so,
                          so)
        sl = (slice(so, -so),) * 2
        want = np.cos(x + h / 2)[sl]
        assert np.abs(got - want).max() < 5e-4

    def test_staggered_function_derivative_lands_on_node(self):
        # u staggered at x+h/2; u.dx evaluates at the node
        so = 4
        grid = _grid(64)
        d = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=so, staggered=d)
        w = Function(name='w', grid=grid, space_order=so)
        x, _ = _coords(grid)
        h = grid.spacing[0]
        u.data[:] = np.sin(x + h / 2)   # values AT the staggered points
        Operator([Eq(w, u.dx)]).apply()
        sl = (slice(so, -so),) * 2
        got = np.asarray(w.data)[sl]
        assert np.abs(got - np.cos(x)[sl]).max() < 5e-4

    def test_avg_interpolates_midpoint(self):
        grid = _grid(64)
        d = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=4)
        w = Function(name='w', grid=grid, space_order=4)
        x, _ = _coords(grid)
        u.data[:] = x
        Operator([Eq(w, u.avg(dims=d))]).apply()
        got = np.asarray(w.data)[4:-4, 4:-4]
        h = grid.spacing[0]
        assert np.abs(got - (x + h / 2)[4:-4, 4:-4]).max() < 1e-5


class TestTranspose:

    @pytest.mark.parametrize('so', [2, 4, 8])
    @pytest.mark.parametrize('dname', ['dx', 'dy'])
    def test_adjoint_dot_identity(self, so, dname):
        # <D u, v> = <u, D.T v> for interior-supported u, v
        grid = _grid(48)
        rng = np.random.RandomState(0)
        pad = 2 * so

        def field(seed):
            a = np.zeros(grid.shape, dtype=np.float32)
            a[pad:-pad, pad:-pad] = rng.rand(*(n - 2 * pad
                                               for n in grid.shape))
            return a

        u = Function(name='u', grid=grid, space_order=so)
        v = Function(name='v', grid=grid, space_order=so)
        du = Function(name='du', grid=grid, space_order=so)
        dv = Function(name='dv', grid=grid, space_order=so)
        u.data[:] = field(0)
        v.data[:] = field(1)
        Operator([Eq(du, getattr(u, dname)),
                  Eq(dv, getattr(v, dname).T)]).apply()
        lhs = float(np.sum(np.asarray(du.data) * np.asarray(v.data)))
        rhs = float(np.sum(np.asarray(u.data) * np.asarray(dv.data)))
        assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)

    def test_double_transpose_is_identity(self):
        grid = _grid(32)
        u = Function(name='u', grid=grid, space_order=4)
        assert str(u.dx.T.T.evaluate) == str(u.dx.evaluate)


class TestVectorCalculus:

    @pytest.mark.parametrize('so', [4, 8])
    def test_div_grad_is_laplace(self, so):
        from devito_tpu.finite_differences.operators import div, grad
        grid = _grid(48)
        x, y = _coords(grid)
        u = Function(name='u', grid=grid, space_order=so)
        w1 = Function(name='w1', grid=grid, space_order=so)
        w2 = Function(name='w2', grid=grid, space_order=so)
        u.data[:] = np.sin(x) * np.sin(y)
        Operator([Eq(w1, div(grad(u))), Eq(w2, u.laplace)]).apply()
        sl = (slice(2 * so, -2 * so),) * 2
        a = np.asarray(w1.data)[sl]
        b = np.asarray(w2.data)[sl]
        # same analytic target; interior values close (different
        # composition order -> different truncation, not different op)
        want = (-2 * np.sin(x) * np.sin(y))[sl]
        assert np.abs(a - want).max() < 5e-3
        assert np.abs(b - want).max() < 5e-3

    def test_curl_of_grad_vanishes(self):
        from devito_tpu.finite_differences.operators import curl, grad
        grid = _grid(32, ndim=3, L=2 * np.pi)
        so = 4
        u = Function(name='u', grid=grid, space_order=so)
        xx = _coords(grid)
        u.data[:] = np.sin(xx[0]) * np.sin(xx[1]) * np.sin(xx[2])
        c = curl(grad(u))
        outs = []
        eqs = []
        for i in range(3):
            w = Function(name=f'w{i}', grid=grid, space_order=so)
            eqs.append(Eq(w, c[i]))
            outs.append(w)
        Operator(eqs).apply()
        sl = (slice(2 * so, -2 * so),) * 3
        for w in outs:
            assert np.abs(np.asarray(w.data)[sl]).max() < 5e-2

    @pytest.mark.parametrize('so', [4, 8])
    def test_rsfd_matches_analytic(self, so):
        # rotated-staggered d45 first derivative (reference rsfd)
        from devito_tpu.finite_differences.rsfd import d45
        grid = _grid(64)
        x, y = _coords(grid)
        u = Function(name='u', grid=grid, space_order=so)
        w = Function(name='w', grid=grid, space_order=so)
        u.data[:] = np.sin(x)
        d = grid.dimensions[0]
        Operator([Eq(w, d45(u, d))]).apply()
        sl = (slice(2 * so, -2 * so),) * 2
        assert np.abs(np.asarray(w.data)[sl] - np.cos(x)[sl]).max() < 5e-3


class TestExpressionAlgebra:

    def test_derivative_linearity(self):
        grid = _grid(32)
        u = Function(name='u', grid=grid, space_order=4)
        v = Function(name='v', grid=grid, space_order=4)
        e1 = (2 * u + 3 * v).dx.evaluate
        e2 = (2 * u.dx + 3 * v.dx).evaluate
        import sympy
        assert sympy.simplify(e1 - e2) == 0

    def test_product_rule_not_assumed(self):
        # (u*v).dx expands the FD stencil of the product, not the
        # symbolic product rule — they differ at truncation level
        grid = _grid(32)
        u = Function(name='u', grid=grid, space_order=2)
        v = Function(name='v', grid=grid, space_order=2)
        e = (u * v).dx.evaluate
        assert e is not None

    @pytest.mark.parametrize('so', [2, 4, 8, 12, 16])
    def test_weight_symmetry(self, so):
        from devito_tpu.finite_differences.tools import stencil_points
        w1 = dict(stencil_points(so, 1))
        for k, w in w1.items():
            assert w1[-k] == -w  # first derivative: antisymmetric
        w2 = dict(stencil_points(so, 2))
        for k, w in w2.items():
            assert w2[-k] == w   # second derivative: symmetric

    def test_nested_derivative_evaluates(self):
        grid = _grid(48)
        x, y = _coords(grid)
        so = 4
        u = Function(name='u', grid=grid, space_order=so)
        m = Function(name='m', grid=grid, space_order=so)
        w = Function(name='w', grid=grid, space_order=so)
        u.data[:] = np.sin(x)
        m.data[:] = 2.0
        Operator([Eq(w, (m * u.dx).dx)]).apply()
        sl = (slice(2 * so, -2 * so),) * 2
        assert np.abs(np.asarray(w.data)[sl] + 2 * np.sin(x)[sl]).max() \
            < 5e-3
