"""Operator behavior matrix (reference: tests/test_operator.py — the
execution-level arithmetic/sparse/staggered subset; IET-structure and
codegen-string rows are N/A). VERDICT r3 item 6."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, SparseFunction,
                        SparseTimeFunction, Eq, Inc, Operator, Constant,
                        Dimension, dimensions)


class TestArithmetic:

    def test_constant_time_dense(self):
        """Constant/Function arithmetic + re-applying a different
        Constant (reference: test_constant_time_dense:528)."""
        i, j = dimensions('i j')
        const = Constant(name='truc', value=2.)
        a = Function(name='a', shape=(20, 20), dimensions=(i, j))
        a.data[:] = 2.
        op = Operator(Eq(a, a + 2. * const))
        op.apply(a=a, truc=const)
        assert np.allclose(np.asarray(a.data), 6.)
        op.apply(a=a, truc=Constant(name='truc2', value=3.))
        assert np.allclose(np.asarray(a.data), 12.)

    def test_incs_same_lhs(self):
        """Multiple updates of one lhs in one operator
        (reference: test_incs_same_lhs:545)."""
        grid = Grid(shape=(10, 10))
        u = Function(name='u', grid=grid, space_order=0)
        u.data[:] = 0.0
        Operator([Eq(u, u + 1.0), Eq(u, u + 2.0)]).apply()
        assert np.all(np.asarray(u.data) == 3)

    def test_scalar_expression_dtype(self):
        """Mixed int/float expressions produce the grid dtype."""
        grid = Grid(shape=(6, 6))
        f = Function(name='f', grid=grid)
        Operator(Eq(f, 3 + f + 2.5)).apply()
        d = np.asarray(f.data)
        assert d.dtype == np.float32 and np.all(d == 5.5)


class TestSparseOperators:
    """Exact-value sparse rows (reference:
    test_sparsefunction_inject:555 .. test_sparsetimefunction_inject_dt:645)."""

    def test_sparsefunction_inject(self):
        grid = Grid(shape=(11, 11))
        u = Function(name='u', grid=grid, space_order=1)
        sf1 = SparseFunction(name='s', grid=grid, npoint=1)
        op = Operator(sf1.inject(u, expr=sf1))
        assert np.asarray(sf1.data).shape == (1,)
        sf1.coordinates.data[0, :] = (0.6, 0.6)
        sf1.data[0] = 5.0
        u.data[:] = 0.0
        op.apply()
        d = np.asarray(u.data)
        assert d[6, 6] == pytest.approx(5.0)
        assert d.sum() == pytest.approx(5.0)

    def test_sparsefunction_interp(self):
        grid = Grid(shape=(11, 11))
        u = Function(name='u', grid=grid, space_order=1)
        sf1 = SparseFunction(name='s', grid=grid, npoint=1)
        op = Operator(sf1.interpolate(u))
        sf1.coordinates.data[0, :] = (0.45, 0.45)
        sf1.data[:] = 0.0
        u.data[:] = 0.0
        u.data[4, 4] = 4.0
        op.apply()
        # exactly mid-cell: bilinear weight 1/4 on the one nonzero
        assert np.asarray(sf1.data)[0] == pytest.approx(1.0)

    def test_sparsetimefunction_interp(self):
        grid = Grid(shape=(11, 11))
        u = TimeFunction(name='u', grid=grid, time_order=2, save=5,
                         space_order=1)
        sf1 = SparseTimeFunction(name='s', grid=grid, npoint=1, nt=5)
        op = Operator(sf1.interpolate(u))
        sf1.coordinates.data[0, :] = (0.45, 0.45)
        sf1.data[:] = 0.0
        u.data[:] = 0.0
        u.data[:, 4, 4] = 8 * np.arange(5) + 4
        op.apply(time_m=1, time_M=3, dt=1.)
        assert np.allclose(np.asarray(sf1.data)[:, 0],
                           [0.0, 3.0, 5.0, 7.0, 0.0], atol=1e-5)

    def test_sparsetimefunction_inject(self):
        grid = Grid(shape=(11, 11))
        u = TimeFunction(name='u', grid=grid, time_order=2, save=5,
                         space_order=1)
        sf1 = SparseTimeFunction(name='s', grid=grid, npoint=1, nt=5)
        op = Operator(sf1.inject(u, expr=3 * sf1))
        sf1.coordinates.data[0, :] = (0.45, 0.45)
        sf1.data[:, 0] = np.arange(5)
        u.data[:] = 0.0
        op.apply(time_m=1, time_M=3, dt=1.)
        d = np.asarray(u.data)
        assert np.allclose(d[1, 4:6, 4:6], 0.75, atol=1e-6)
        assert np.allclose(d[2, 4:6, 4:6], 1.5, atol=1e-6)
        assert np.allclose(d[3, 4:6, 4:6], 2.25, atol=1e-6)
        assert d.sum() == pytest.approx(4 * 0.75 + 4 * 1.5 + 4 * 2.25,
                                        rel=1e-5)

    def test_sparsetimefunction_inject_dt(self):
        """Injecting the TIME DERIVATIVE of a sparse series (reference:
        test_sparsetimefunction_inject_dt:645)."""
        grid = Grid(shape=(11, 11))
        u = TimeFunction(name='u', grid=grid, time_order=2, save=5,
                         space_order=1)
        sf1 = SparseTimeFunction(name='s', grid=grid, npoint=1, nt=5,
                                 time_order=2)
        op = Operator(sf1.inject(u, expr=3 * sf1.dt))
        sf1.coordinates.data[0, :] = (0.45, 0.45)
        sf1.data[:, 0] = np.arange(5)
        u.data[:] = 0.0
        op.apply(time_m=1, time_M=3, dt=1)
        d = np.asarray(u.data)
        # d/dt of arange = 1 -> 3*1*0.25 = 0.75 at the 4 corners
        assert np.allclose(d[1:4, 4:6, 4:6], 0.75, atol=1e-6)
        assert d.sum() == pytest.approx(12 * 0.75, rel=1e-5)


class TestStaggered:

    @pytest.mark.parametrize('ndim', [2, 3])
    def test_staggered(self, ndim):
        """Copy between staggered functions (reference:
        test_staggered:714)."""
        grid = Grid(shape=(11,) * ndim)
        for d in grid.dimensions:
            f = Function(name=f'f_{d.name}', grid=grid, staggered=(d,))
            g = Function(name=f'g_{d.name}', grid=grid, staggered=(d,))
            f.data[:] = np.random.RandomState(0).rand(
                *f.shape).astype(np.float32)
            Operator(Eq(g, f)).apply()
            assert np.allclose(np.asarray(g.data), np.asarray(f.data))

    @pytest.mark.parametrize('ndim', [2, 3])
    def test_staggered_time(self, ndim):
        """Staggered TimeFunction stepping (reference:
        test_staggered_time:734)."""
        grid = Grid(shape=(11,) * ndim)
        d = grid.dimensions[0]
        f = TimeFunction(name='fst', grid=grid, staggered=(d,))
        f.data[:] = 1.0
        Operator(Eq(f.forward, f + 1)).apply(time_M=3, dt=1.)
        assert np.all(np.asarray(f.data[0]) == 5.0)


class TestIndexedAPI:

    def test_indexed_stencil_eq(self):
        """Low-level fully-indexed stencil (reference:
        test_indexed_stencil:454 shape)."""
        grid = Grid(shape=(8, 8))
        x, y = grid.dimensions
        t = grid.stepping_dim
        u = TimeFunction(name='u', grid=grid, space_order=1)
        u.data[0][4, 4] = 1.0
        eq = Eq(u[t + 1, x, y],
                0.25 * (u[t, x - 1, y] + u[t, x + 1, y]
                        + u[t, x, y - 1] + u[t, x, y + 1]))
        Operator(eq).apply(time_m=0, time_M=0, dt=1.)
        d = np.asarray(u.data[1])  # one step: row 1 holds the stencil
        assert d[3, 4] == d[5, 4] == d[4, 3] == d[4, 5] == 0.25
        assert d[4, 4] == 0.0

    def test_indexed_increment(self):
        """Inc through explicit indices (reference:
        test_indexed_increment:436 shape)."""
        grid = Grid(shape=(6, 6))
        x, y = grid.dimensions
        f = Function(name='f', grid=grid)
        f.data[:] = 1.0
        Operator(Inc(f[x, y], 2.0)).apply()
        assert np.all(np.asarray(f.data) == 3.0)
