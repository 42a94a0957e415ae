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


class TestGridInputs:
    """Grid construction matrix (reference: test_symbolics.py
    test_grid_inputs:144 — spacing= and extent= are alternative,
    consistent specifications)."""

    @pytest.mark.parametrize('spacing, extent, shape, expected', [
        ((0.5, 0.5), None, (11, 11), ((0.5, 0.5), (5.0, 5.0))),
        (None, (5.0, 5.0), (11, 11), ((0.5, 0.5), (5.0, 5.0))),
        ((0.5, 0.5), (5.0, 5.0), (11, 11), ((0.5, 0.5), (5.0, 5.0))),
        ((.002, .002), (.3, .3), (151, 146), ((0.002, 0.002), (.3, .3))),
        ((.002, .002), None, (151, 146), ((0.002, 0.002), (.3, .29))),
        (None, None, (11, 11), ((.1, .1), (1.0, 1.0))),
    ])
    def test_grid_inputs(self, spacing, extent, shape, expected):
        grid = Grid(shape=shape, spacing=spacing, extent=extent)
        esp, eex = expected
        assert np.allclose(grid.spacing, esp)
        assert np.allclose(grid.extent, eex)

    def test_spacing_map_consistent(self):
        grid = Grid(shape=(11, 21), spacing=(0.5, 0.25))
        vals = list(grid.spacing_map.values())
        assert np.allclose(vals, (0.5, 0.25))


class TestAssumptions:
    """Dtype-driven sympy assumptions (reference: test_symbolics.py
    test_real:122, test_sympy_assumptions:82)."""

    def test_real_constant(self):
        c = Constant(name='creal9', dtype=np.float32)
        assert c.is_real is True and c.is_imaginary is False
        cc = Constant(name='ccplx9', dtype=np.complex64)
        assert cc.is_real is not True
        assert cc.is_imaginary is True

    def test_dimension_assumptions(self):
        d = Dimension(name='dasm')
        assert d.is_integer is True
        assert d.is_real is True

    def test_constant_identity_by_name(self):
        # sympy symbol caching: same (name, dtype-assumptions) -> equal
        a = Constant(name='cid9', value=1.0)
        b = Constant(name='cid9', value=2.0)
        assert a == b  # sympy equality is by symbol identity


class TestStaggeredIndexing:

    def test_func_of_indices(self):
        """Origin processing composes with functions of indices
        (reference: test_func_of_indices:48 — the staggered half-spacing
        never leaks into the integer index)."""
        from devito_tpu import Abs
        grid = Grid((10,))
        x = grid.dimensions[0]
        u = Function(name='ufo9', grid=grid, space_order=2, staggered=x)
        us = u.subs({u.indices[0]: Abs(u.indices[0])})
        idx = us.indexify().indices[0]
        # no half-spacing artifacts inside the wrapped index
        assert idx.has(sympy.Abs)
        assert not idx.atoms(sympy.Float)
        assert x.spacing not in idx.free_symbols

    def test_timefunction_free_symbols(self):
        grid = Grid(shape=(4, 4))
        x, y = grid.dimensions
        t = grid.stepping_dim
        f = TimeFunction(name='ftf9', grid=grid)
        assert f.free_symbols == {t, x, y}
        assert f.forward.free_symbols == {t, x, y}

    def test_shifted_access_free_symbols(self):
        grid = Grid(shape=(4, 4))
        x, y = grid.dimensions
        f = Function(name='fsh9', grid=grid, space_order=2)
        s = f.subs({x: x + x.spacing})
        assert x in s.free_symbols and x.spacing in s.free_symbols


class TestNumericEdgeCases:

    @pytest.mark.parametrize('dtype', [np.float32, np.float64])
    def test_floatification(self, dtype):
        """Spacing-division chains execute exactly (reference MFE for
        issue #1627, test_symbolics.py:64 — there asserted on the C
        text; here on the executed value)."""
        grid = Grid(shape=(10, 10), extent=(9., 9.), dtype=dtype)
        x, y = grid.dimensions
        u = TimeFunction(name='ufl9', grid=grid)
        u.data[0][:] = 1.0
        op = Operator(Eq(u.forward, ((u / x.spacing) + 2.0) / x.spacing))
        op.apply(time_M=0, dt=1.0)
        # h_x = 1.0 here: ((1/1) + 2)/1 = 3
        assert np.allclose(np.asarray(u.data[1]), 3.0, rtol=1e-6)

    @pytest.mark.parametrize('dtype', [np.int32, np.float32, np.float64])
    def test_minmax_precision(self, dtype):
        """Min/Max execute in the operand dtype (reference:
        test_minmax_precision:1076)."""
        from devito_tpu import Min, Max
        grid = Grid(shape=(6, 6), dtype=dtype)
        f = Function(name='fmm9', grid=grid, dtype=dtype)
        g = Function(name='gmm9', grid=grid, dtype=dtype)
        f.data[:] = 3
        g.data[:] = 5
        out = Function(name='omm9', grid=grid, dtype=dtype)
        Operator([Eq(out, Min(f, 4) + Max(g, 7))]).apply()
        arr = np.asarray(out.data)
        assert arr.dtype == np.dtype(dtype)
        assert np.all(arr == 10)

    def test_nested_pow_rationals(self):
        """Rational/negative powers lower to the right numerics
        (reference: test_pow_precision / pow-to-mul rows)."""
        grid = Grid(shape=(6, 6))
        f = Function(name='fpw9', grid=grid)
        out = Function(name='opw9', grid=grid)
        f.data[:] = 4.0
        Operator(Eq(out, f ** (-sympy.Rational(1, 2)) + f ** 3
                 + f ** (-2))).apply()
        assert np.allclose(np.asarray(out.data),
                           0.5 + 64.0 + 1 / 16., rtol=1e-6)

    def test_mixed_dtype_expression_promotes(self):
        """An expression mixing fp32 and fp64 operands executes and the
        target keeps ITS dtype (reference dtype-lowering semantics,
        tests/test_dtypes.py)."""
        grid = Grid(shape=(6, 6), dtype=np.float32)
        f32 = Function(name='fmx9', grid=grid)
        f64 = Function(name='gmx9', grid=grid, dtype=np.float64)
        out = Function(name='omx9', grid=grid)  # float32 target
        f32.data[:] = 1.5
        f64.data[:] = 2.5
        Operator(Eq(out, f32 + f64)).apply()
        arr = np.asarray(out.data)
        assert arr.dtype == np.float32
        assert np.allclose(arr, 4.0)
