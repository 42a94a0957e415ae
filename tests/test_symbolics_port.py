"""Symbolic-layer behavior matrix (reference: tests/test_symbolics.py —
the execution-relevant subset; the extended-sympy C-construct tests
(IntDiv/Cast/CallFromPointer/...) are codegen-specific and N/A: the
translator traces sympy directly into XLA). VERDICT r3 item 6."""

import numpy as np
import pytest
import sympy

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator,
                        Constant, Dimension, SubDimension, solve)
from devito_tpu.types.basic import retrieve_functions, retrieve_dimensions


class TestIndices:

    def test_float_indices(self):
        """Indexified indices contain no floats (reference:
        test_float_indices:31)."""
        grid = Grid((10,))
        x = grid.dimensions[0]
        u = Function(name='u', grid=grid, space_order=2)
        shifted = u.subs({x: x + 1.0 * x.spacing})
        idx = sympy.sympify(shifted.indexify().indices[0])
        assert len(idx.atoms(sympy.Float)) == 0
        assert idx == x + 1

    def test_indexed_staggered(self):
        """Staggered functions index to integers (reference:
        test_indexed_staggered:217 — there the symbolic half-spacing
        survives until indexify; here subs already resolves to array
        indices, with the stagger offset kept as function metadata —
        both indexify to the same integers)."""
        grid = Grid(shape=(10, 10))
        x, y = grid.dimensions
        u = Function(name='u', grid=grid, staggered=(x, y))
        u0 = u.subs({x: 1, y: 2})
        assert tuple(u0.indexify().indices) == (1, 2)
        from sympy import Rational
        assert u.stagger_offset(x) == Rational(1, 2)

    def test_indexify_plain(self):
        grid = Grid(shape=(10, 10))
        x, y = grid.dimensions
        u = Function(name='u', grid=grid)
        # an unshifted access indexifies to its own dimensions
        assert tuple(u.indexify().indices) == (x, y)


class TestFreeSymbols:

    def test_constant(self):
        c = Constant(name='c')
        assert c.free_symbols == {c}

    def test_dimension(self):
        d = Dimension(name='d')
        assert d.free_symbols == {d}

    def test_function_free_symbols(self):
        grid = Grid(shape=(10, 10))
        x, y = grid.dimensions
        u = Function(name='u', grid=grid)
        assert set(u.free_symbols) >= {x, y} or \
            set(u.indexify().free_symbols) >= {x, y}

    def test_retrieve_functions(self):
        grid = Grid((10,))
        f = Function(name='f', grid=grid)
        g = Function(name='g', grid=grid)
        fns = {a.function for a in retrieve_functions(f + 2 * g)}
        assert fns == {f, g}

    def test_retrieve_dimensions(self):
        grid = Grid(shape=(10, 10))
        x, y = grid.dimensions
        f = Function(name='f', grid=grid)
        dims = set(retrieve_dimensions(f.indexify() + x))
        assert x in dims


class TestSolve:

    def test_solve_time(self):
        """solve() only evaluates the time derivative; spatial
        derivatives stay lazy (reference: test_solve_time:885)."""
        grid = Grid(shape=(11, 11))
        u = TimeFunction(name='u', grid=grid, time_order=2, space_order=4)
        m = Function(name='m', grid=grid, space_order=4)
        dt = grid.time_dim.spacing
        sol = solve(m * u.dt2 + u.dx, u.forward)
        from devito_tpu.finite_differences.derivative import Derivative
        derivs = [a for a in sympy.preorder_traversal(sympy.sympify(sol))
                  if isinstance(a, Derivative)]
        assert len(derivs) == 1
        # the solution is -dt^2 u.dx / m + 2 u - u.backward
        expanded = sympy.expand(
            sympy.sympify(sol) - (-dt**2 * u.dx / m + 2.0 * u - u.backward))
        assert sympy.simplify(expanded) == 0

    def test_solve_constant_pde(self):
        grid = Grid(shape=(5, 5))
        u = TimeFunction(name='u', grid=grid)
        sol = solve(Eq(u.dt, 1), u.forward)
        dt = grid.time_dim.spacing
        assert sympy.simplify(sympy.sympify(sol) - (u + dt)) == 0


class TestExecutionSemantics:

    def test_minmax(self):
        """Min/Max of mixed symbol/number args execute (reference:
        test_minmax:1056)."""
        grid = Grid(shape=(5, 5))
        x, y = grid.dimensions
        f = Function(name='f', grid=grid)
        c = Constant(name='c', value=2.0)
        Operator(Eq(f, sympy.Max(y, c, 4))).apply()
        assert np.all(np.asarray(f.data) == 4)

    @pytest.mark.parametrize('dtype', [np.float32, np.float64])
    def test_pow_precision(self, dtype):
        """Integer and fractional powers execute at the grid dtype
        (reference: test_pow_precision:1103 — execution analog)."""
        grid = Grid(shape=(5, 5), dtype=dtype)
        f = Function(name='f', grid=grid)
        g = Function(name='g', grid=grid)
        g.data[:] = 4.0
        Operator(Eq(f, g ** 0.5 + g ** -2 + g ** 3)).apply()
        d = np.asarray(f.data)
        assert d.dtype == dtype
        assert np.allclose(d, 2.0 + 1 / 16 + 64.0)

    @pytest.mark.parametrize('dtype', [np.float32, np.float64])
    def test_abs_precision(self, dtype):
        grid = Grid(shape=(5, 5), dtype=dtype)
        f = Function(name='f', grid=grid)
        g = Function(name='g', grid=grid)
        g.data[:] = -3.0
        Operator(Eq(f, abs(g))).apply()
        assert np.all(np.asarray(f.data) == 3.0)
        assert np.asarray(f.data).dtype == dtype

    def test_integer_abs(self):
        """Abs on an int expression stays integral (reference:
        test_integer_abs:337 — execution analog)."""
        grid = Grid(shape=(5, 5))
        f = Function(name='f', grid=grid, dtype=np.int32)
        g = Function(name='g', grid=grid, dtype=np.int32)
        g.data[:] = -7
        Operator(Eq(f, abs(g))).apply()
        assert np.all(np.asarray(f.data) == 7)
        assert np.asarray(f.data).dtype == np.int32

    def test_mod_execution(self):
        grid = Grid(shape=(8, 8))
        x, y = grid.dimensions
        f = Function(name='f', grid=grid, dtype=np.int32)
        Operator(Eq(f, sympy.Mod(x, 3))).apply()
        d = np.asarray(f.data)
        for i in range(8):
            assert np.all(d[i] == i % 3)

    def test_trig_functions(self):
        """Elementary-function zoo traces through (reference:
        elementary.py wrappers)."""
        from devito_tpu import sin, cos, sqrt, exp
        grid = Grid(shape=(4, 4))
        f = Function(name='f', grid=grid)
        g = Function(name='g', grid=grid)
        g.data[:] = 0.25
        Operator(Eq(f, sin(g) + cos(g) + sqrt(g) + exp(g))).apply()
        v = 0.25
        assert np.allclose(np.asarray(f.data),
                           np.sin(v) + np.cos(v) + np.sqrt(v) + np.exp(v),
                           rtol=1e-6)


class TestSubDimensionSymbols:

    def test_subdimension_sides(self):
        d = Dimension(name='d')
        dm = SubDimension.middle('dm', d, 4, 4)
        dl = SubDimension.left('dl', d, 4)
        dr = SubDimension.right('dr', d, 4)
        assert dm.side == 'middle' and dm.thickness == (4, 4)
        assert dl.side == 'left' and dl.local
        assert dr.side == 'right' and dr.local
        assert dm.bounds(16) == (4, 12)
        assert dl.bounds(16) == (0, 4)
        assert dr.bounds(16) == (12, 16)
        assert dm.root is d and dl.parent is d

    def test_subdimension_spacing_inherits(self):
        grid = Grid(shape=(10,))
        x, = grid.dimensions
        xi = SubDimension.middle('xi', x, 1, 1)
        assert xi.spacing == x.spacing
