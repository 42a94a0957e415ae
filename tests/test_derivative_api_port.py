"""Derivative call-API matrix (reference: tests/test_derivatives.py —
fd_order/x0/side/shift arms, checked by numerical equivalence of the
evaluated stencils rather than C strings). VERDICT r3 item 6."""

import numpy as np
import pytest
import sympy

from devito_tpu import Grid, Function, TimeFunction, Eq, Operator
from devito_tpu.finite_differences.operators import div, grad, laplace
from devito_tpu.types.tensor import VectorFunction


def _stencil_map(expr):
    """{(shift tuple): float weight} of an evaluated derivative of a
    single function — robust numerical identity for stencil comparisons."""
    from devito_tpu.types.basic import retrieve_functions
    from devito_tpu.ir.lowering import space_offsets_of
    expr = sympy.expand(sympy.sympify(expr))
    out = {}
    terms = expr.args if expr.is_Add else (expr,)
    for t in terms:
        accs = [a for a in retrieve_functions(t)]
        assert len(accs) == 1, t
        coef = t / accs[0]
        offs = space_offsets_of(accs[0], absolute='zero')
        # strip spacing symbols for a pure number
        subs = {s: 1.0 for s in sympy.sympify(coef).free_symbols}
        key = tuple(int(o) for o in offs)
        out[key] = out.get(key, 0.0) + float(coef.subs(subs))
    return out


class TestFdOrder:

    @pytest.mark.parametrize('so', [4, 8])
    def test_fd_order_matches_lower_order_function(self, so):
        """u.dx(fd_order=k) == (space_order=k function).dx (reference:
        test_fd_new_order:382)."""
        grid = Grid((10,))
        u = Function(name='u', grid=grid, space_order=so)
        u1 = Function(name='u1', grid=grid, space_order=so // 2)
        a = _stencil_map(u.dx(fd_order=so // 2).evaluate)
        b = _stencil_map(u1.dx.evaluate)
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-12)

    def test_xderiv_order_dict(self):
        """Dict fd_order on cross derivatives == chained per-dim orders
        (reference: test_xderiv_order:390)."""
        grid = Grid(shape=(11, 11), extent=(10., 10.))
        x, y = grid.dimensions
        f = Function(name='f', grid=grid, space_order=4)
        e = (f.dxdy(fd_order={x: 2, y: 2}).evaluate
             - f.dx(fd_order=2).dy(fd_order=2).evaluate)
        assert sympy.simplify(sympy.expand(e)) == 0


class TestSideAndX0:

    def test_side_matches_shortcuts(self):
        """dx(side=) == dxl/dxr shortcuts (reference:
        test_fd_new_side:417)."""
        grid = Grid((10,))
        u = Function(name='u', grid=grid, space_order=4)
        assert _stencil_map(u.dx(side='left').evaluate) == \
            _stencil_map(u.dxl.evaluate)
        assert _stencil_map(u.dx(side='right').evaluate) == \
            _stencil_map(u.dxr.evaluate)

    def test_x0_whole_point_shift(self):
        """x0 = x +- h shifts the whole stencil (reference:
        test_fd_new_x0:435)."""
        grid = Grid((10,))
        x = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=4)
        base = _stencil_map(u.dx.evaluate)
        plus = _stencil_map(u.dx(x0=x + x.spacing).evaluate)
        assert plus == {(k[0] + 1,): v for k, v in base.items()}

    def test_fd_new_lo_half_shifts(self):
        """Half-point x0 at fd_order 1-ish gives forward/backward
        2-point differences (reference: test_fd_new_lo:468)."""
        grid = Grid((10,))
        x = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=2)
        dplus = _stencil_map(u.dx(x0=x + .5 * x.spacing,
                                  fd_order=1).evaluate)
        dminus = _stencil_map(u.dx(x0=x - .5 * x.spacing,
                                   fd_order=1).evaluate)
        assert dplus == {(0,): pytest.approx(-1.0), (1,): pytest.approx(1.0)}
        assert dminus == {(-1,): pytest.approx(-1.0),
                          (0,): pytest.approx(1.0)}

    def test_fd_new_x0_half_forneberg(self):
        """Half-shifted SO=4 first derivative reproduces the Fornberg
        weights (reference: test_fd_new_x0:435, so=4 row)."""
        grid = Grid((10,))
        x = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=4)
        got = _stencil_map(u.dx(x0=x - .5 * x.spacing).evaluate)
        want = {(0,): 1.125, (-2,): 0.0416666667, (-1,): -1.125,
                (1,): -0.0416666667}
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-8)


class TestShiftedVectorCalculus:

    @pytest.mark.parametrize('shift,ndim', [(None, 2), (.5, 2), (.5, 3),
                                            ((.5, .5, .5), 3)])
    def test_shifted_div(self, shift, ndim):
        """div(f, shift=) == sum of per-dim x0-shifted derivatives
        (reference: test_shifted_div:606)."""
        grid = Grid(tuple([11] * ndim))
        f = Function(name='f', grid=grid, space_order=4)
        for order in [None, 2]:
            df = div(f, shift=shift, order=order).evaluate
            ref = 0
            for i, d in enumerate(grid.dimensions):
                x0 = (None if shift is None
                      else d + shift[i] * d.spacing if type(shift) is tuple
                      else d + shift * d.spacing)
                kw = {'fd_order': order} if order else {}
                if x0 is not None:
                    kw['x0'] = x0
                ref += getattr(f, f'd{d.name}')(**kw)
            e = sympy.expand(sympy.sympify(df - ref.evaluate))
            assert sympy.simplify(e) == 0

    @pytest.mark.parametrize('shift,ndim', [(None, 2), (.5, 2), (.5, 3)])
    def test_shifted_grad(self, shift, ndim):
        """grad(f, shift=) components match per-dim shifted derivatives
        (reference: test_shifted_grad:620)."""
        grid = Grid(tuple([11] * ndim))
        f = Function(name='f', grid=grid, space_order=4)
        g = grad(f, shift=shift)
        for i, d in enumerate(grid.dimensions):
            x0 = (None if shift is None
                  else d + shift * d.spacing)
            kw = {'x0': x0} if x0 is not None else {}
            gk = getattr(f, f'd{d.name}')(**kw).evaluate
            gi = g[i].evaluate if hasattr(g[i], 'evaluate') else g[i]
            e = sympy.expand(sympy.sympify(gi - gk))
            assert sympy.simplify(e) == 0


class TestExecutionEquivalence:

    def test_fd_order_execution(self):
        """Lower-order stencil executes identically through both APIs."""
        grid = Grid(shape=(12, 12), extent=(11., 11.))
        u = Function(name='u', grid=grid, space_order=8)
        out1 = Function(name='o1', grid=grid)
        out2 = Function(name='o2', grid=grid)
        u2 = Function(name='u2', grid=grid, space_order=2)
        vals = np.random.RandomState(0).rand(12, 12).astype(np.float32)
        u.data[:] = vals
        u2.data[:] = vals
        Operator([Eq(out1, u.dx(fd_order=2)),
                  Eq(out2, u2.dx)], subs=grid.spacing_map).apply()
        assert np.allclose(np.asarray(out1.data), np.asarray(out2.data),
                           rtol=1e-6)

    def test_side_execution_upwind(self):
        """One-sided derivatives execute (upwind pattern)."""
        grid = Grid(shape=(12,), extent=(11.,))
        u = Function(name='u', grid=grid, space_order=2)
        o = Function(name='o', grid=grid)
        u.data[:] = np.arange(12.)
        Operator(Eq(o, u.dxl), subs=grid.spacing_map).apply()
        # d/dx of x = 1 away from boundaries
        assert np.allclose(np.asarray(o.data)[2:-2], 1.0, atol=1e-5)


class TestPolynomialExactness:
    """FD schemes are exact on polynomials of their order (reference:
    test_fd_space:234, test_fd_space_staggered:325)."""

    @pytest.mark.parametrize('derivative', ['dx', 'dx2'])
    @pytest.mark.parametrize('space_order', [2, 4, 6, 8, 12])
    def test_fd_space(self, derivative, space_order):
        nx = 100
        xx = np.linspace(-1, 1, nx)
        dx = xx[1] - xx[0]
        grid = Grid(shape=(nx,), dtype=np.float64)
        x = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=space_order)
        du = Function(name='du', grid=grid, space_order=space_order)
        poly = sum(sympy.Symbol('xs') ** i for i in range(space_order))
        xs = sympy.Symbol('xs')
        u.data[:] = [float(poly.subs(xs, xi)) for xi in xx]
        dpoly = sympy.diff(poly, xs, 2 if derivative == 'dx2' else 1)
        want = np.array([float(dpoly.subs(xs, xi)) for xi in xx])
        Operator(Eq(du, getattr(u, derivative)),
                 subs={x.spacing: dx}).apply()
        b = space_order
        err = np.abs(np.asarray(du.data)[b:-b] - want[b:-b])
        assert np.isclose(err.mean(), 0., atol=1e-3)

    @pytest.mark.parametrize('space_order', [2, 4, 8, 12])
    @pytest.mark.parametrize('stagger', ['node_to_half', 'half_to_node'])
    def test_fd_space_staggered(self, space_order, stagger):
        """Staggered first derivative lands exactly between lattices
        (reference: test_fd_space_staggered:325)."""
        nx = 101
        xx = np.linspace(-1, 1, nx)
        dx = xx[1] - xx[0]
        grid = Grid(shape=(nx,), dtype=np.float64)
        x = grid.dimensions[0]
        xs = sympy.Symbol('xs')
        poly = sum(xs ** i for i in range(space_order - 1))
        dpoly = sympy.diff(poly, xs)
        if stagger == 'node_to_half':
            u = Function(name='u', grid=grid, space_order=space_order)
            du = Function(name='du', grid=grid, space_order=space_order,
                          staggered=(x,))
            xx_u = xx
            xx_du = xx + .5 * dx
        else:
            u = Function(name='u', grid=grid, space_order=space_order,
                         staggered=(x,))
            du = Function(name='du', grid=grid, space_order=space_order)
            xx_u = xx + .5 * dx
            xx_du = xx
        u.data[:] = [float(poly.subs(xs, xi)) for xi in xx_u]
        want = np.array([float(dpoly.subs(xs, xi)) for xi in xx_du])
        Operator(Eq(du, u.dx), subs={x.spacing: dx}).apply()
        b = space_order
        err = np.abs(np.asarray(du.data)[b:-b] - want[b:-b])
        assert np.isclose(err.mean(), 0., atol=1e-3)
