"""ConditionalDimension behavior matrix (reference:
tests/test_dimension.py TestConditionalDimension — the execution-level
subset; loop-structure/IET assertions are codegen-specific and N/A).
VERDICT r3 item 6."""

import numpy as np
import pytest
import sympy

from devito_tpu import (Grid, Function, TimeFunction, SparseTimeFunction,
                        Eq, Inc, Operator, Constant, Dimension,
                        ConditionalDimension, Le, Ge)
from devito_tpu.builtins import norm


class TestSubsampledSaves:

    def test_basic(self):
        """Subsampled snapshot save (reference: test_basic:835)."""
        nt = 19
        grid = Grid(shape=(11, 11))
        time = grid.time_dim
        u = TimeFunction(name='u', grid=grid)
        u2 = TimeFunction(name='u2', grid=grid, save=nt)
        factor = 4
        t_sub = ConditionalDimension('t_sub', parent=time, factor=factor)
        usave = TimeFunction(name='usave', grid=grid,
                             save=(nt + factor - 1) // factor,
                             time_dim=t_sub)
        op = Operator([Eq(u.forward, u + 1.), Eq(u2.forward, u2 + 1.),
                       Eq(usave, u)])
        op.apply(time_M=nt - 2, dt=1.)
        assert np.allclose(np.asarray(u.data)[(nt - 1) % 2], nt - 1)
        assert all(np.allclose(np.asarray(u2.data)[i], i)
                   for i in range(nt))
        assert all(np.allclose(np.asarray(usave.data)[i], i * factor)
                   for i in range((nt + factor - 1) // factor))

    def test_basic_shuffles(self):
        """Equation-order shuffles save the same values
        (reference: test_basic_shuffles:915)."""
        nt = 19
        factor = 4
        for order in ((0, 1, 2), (1, 0, 2)):
            grid = Grid(shape=(11, 11))
            time = grid.time_dim
            u = TimeFunction(name='u', grid=grid)
            u2 = TimeFunction(name='u2', grid=grid, save=nt)
            t_sub = ConditionalDimension('t_sub', parent=time,
                                         factor=factor)
            usave = TimeFunction(name='usave', grid=grid,
                                 save=(nt + factor - 1) // factor,
                                 time_dim=t_sub)
            eqs = [Eq(usave, u), Eq(u.forward, u + 1.),
                   Eq(u2.forward, u2 + 1.)]
            eqs = [eqs[i] for i in order]
            Operator(eqs).apply(time_M=nt - 2, dt=1.)
            assert all(np.allclose(np.asarray(u2.data)[i], i)
                       for i in range(nt))
            assert all(np.allclose(np.asarray(usave.data)[i], i * factor)
                       for i in range((nt + factor - 1) // factor))

    def test_laplace_snapshot(self):
        """Low-level indexed stencil + snapshot save
        (reference: test_laplace:1141)."""
        grid = Grid(shape=(20, 20, 20))
        x, y, z = grid.dimensions
        time = grid.time_dim
        t = grid.stepping_dim
        tsave = ConditionalDimension(name='tsave', parent=time, factor=2)
        u = TimeFunction(name='u', grid=grid, save=None, time_order=2)
        usave = TimeFunction(name='usave', grid=grid, time_dim=tsave,
                             time_order=0, space_order=0, save=2)
        steps = [Eq(usave, u),
                 Eq(u[t + 1, x, y, z],
                    u[t, x, y, z] - u[t - 1, x, y, z]
                    + u[t, x - 1, y, z] + u[t, x + 1, y, z]
                    + u[t, x, y - 1, z] + u[t, x, y + 1, z]
                    + u[t, x, y, z - 1] + u[t, x, y, z + 1])]
        op = Operator(steps)
        u.data[:] = 0.0
        u.data[0, 10, 10, 10] = 1.0
        op.apply(time_m=0, time_M=0, dt=1.)
        assert np.sum(np.asarray(u.data)[0]) == 1.0
        assert np.sum(np.asarray(u.data)[1]) == 7.0
        assert np.all(np.asarray(usave.data)[0] == np.asarray(u.data)[0])

    def test_as_expr(self):
        """The ConditionalDimension as a VALUE in the saved expression
        (reference: test_as_expr:1171)."""
        nt = 19
        grid = Grid(shape=(11, 11))
        time = grid.time_dim
        u = TimeFunction(name='u', grid=grid)
        factor = 4
        t_sub = ConditionalDimension('t_sub', parent=time, factor=factor)
        usave = TimeFunction(name='usave', grid=grid,
                             save=(nt + factor - 1) // factor,
                             time_dim=t_sub)
        op = Operator([Eq(u.forward, u + 1.), Eq(usave, t_sub * u)])
        op.apply(time_M=nt - 2, dt=1.)
        assert all(np.allclose(np.asarray(usave.data)[i], i * factor * i)
                   for i in range((nt + factor - 1) // factor))

    def test_no_index(self):
        """ConditionalDimension as a bare symbol in an increment
        (reference: test_no_index:1225)."""
        nt = 19
        grid = Grid(shape=(11, 11))
        time = grid.time_dim
        u = TimeFunction(name='u', grid=grid)
        v = Function(name='v', grid=grid)
        t_sub = ConditionalDimension('t_sub', parent=time, factor=4)
        op = Operator([Eq(u.forward, u + 1),
                       Eq(v, v + u * u * t_sub, implicit_dims=t_sub)])
        op.apply(time_M=nt - 2, dt=1.)
        # v = 16*1 + 64*2 + 144*3 + 256*4 = 1600
        assert np.allclose(np.asarray(v.data), 1600)

    def test_cond_notime(self):
        """Summing a subsampled save over its own time dim matches an
        Inc accumulation (reference: test_cond_notime:1933)."""
        grid = Grid(shape=(10, 10))
        time = grid.time_dim
        time_under = ConditionalDimension(name='timeu', parent=time,
                                          factor=5)
        nt = 10
        u = TimeFunction(name='u', grid=grid, space_order=2)
        u.data[:] = 1.0
        usaved = TimeFunction(name='usaved', grid=grid, space_order=2,
                              time_dim=time_under, save=nt // 5 + 1)
        g = Function(name='g', grid=grid)
        Operator([Eq(usaved, u)]).apply(time_m=1, time_M=nt - 1, dt=1)
        Operator([Inc(g, usaved)]).apply(time_m=1, time_M=nt - 1, dt=1)
        assert float(norm(g, order=1)) == pytest.approx(
            np.abs(np.asarray(usaved.data)).sum(), rel=1e-6)


class TestConditions:

    def test_implicit_dims(self):
        """Stop incrementing when a value condition trips
        (reference: test_implicit_dims:1389)."""
        shape = (50,)
        stop_value = 20
        time = Dimension(name='time')
        f = TimeFunction(name='f', shape=shape, dimensions=[time],
                         time_order=1, save=shape[0])
        cond = ConditionalDimension(name='cond', parent=time,
                                    condition=f[time] < stop_value)
        eqs = [Eq(f.forward, f),
               Eq(f.forward, f.forward + 1, implicit_dims=[cond])]
        Operator(eqs).apply(time_M=shape[0] - 2, dt=1)
        F = np.array([i if i < stop_value else stop_value
                      for i in range(shape[0])])
        assert np.all(np.asarray(f.data).ravel() == F)

    def test_implicit_dims_multiple(self):
        """Multiple ConditionalDimensions compose by conjunction
        (reference: test_implict_dims_multiple:1418)."""
        shape = (50,)
        start_value, stop_value = 5, 20
        time = Dimension(name='time')
        f = TimeFunction(name='f', shape=shape, dimensions=[time],
                         time_order=1, save=shape[0])
        cond0 = ConditionalDimension(name='cond0', parent=time,
                                     condition=time > start_value)
        cond1 = ConditionalDimension(name='cond1', parent=time,
                                     condition=time < stop_value)
        cond2 = ConditionalDimension(name='cond2', parent=time, factor=2)
        eqs = [Eq(f.forward, f),
               Eq(f.forward, f.forward + 1,
                  implicit_dims=[cond0, cond1, cond2])]
        Operator(eqs).apply(time_M=shape[0] - 2, dt=1)
        F = np.zeros(shape[0])
        val = 0
        for i in range(shape[0]):
            F[i] = val
            if start_value < i < stop_value and i % 2 == 0:
                val += 1
        assert np.all(np.asarray(f.data).ravel() == F)

    def test_relational_condition_classes(self):
        """devito-level relationals as conditions (reference:
        test_relational_classes:1568 — execution subset)."""
        grid = Grid(shape=(8, 8))
        x, y = grid.dimensions
        f = Function(name='f', grid=grid)
        cond = sympy.And(Ge(x, 2), Le(x, 5))
        ci = ConditionalDimension(name='ci', parent=y, condition=cond)
        Operator(Eq(f, 1, implicit_dims=ci)).apply()
        d = np.asarray(f.data)
        assert np.all(d[2:6] == 1)
        assert np.all(d[:2] == 0) and np.all(d[6:] == 0)

    def test_factor_and_condition(self):
        """factor= and condition= compose (reference:
        test_factor_and_condition:2036)."""
        grid = Grid(shape=(10, 10))
        time = grid.time_dim
        nt = 200
        bounds = (10, 100)
        factor = 5
        condition = sympy.And(Ge(time, bounds[0]), Le(time, bounds[1]))
        time_under = ConditionalDimension(name='timeu', parent=time,
                                          factor=factor,
                                          condition=condition)
        buffer_size = (bounds[1] - bounds[0] + factor) // factor
        u = TimeFunction(name='u', grid=grid, space_order=2)
        usaved = TimeFunction(name='usaved', grid=grid, space_order=2,
                              time_dim=time_under, save=buffer_size + 2)
        op = Operator([Eq(u.forward, u + 1), Eq(usaved, u)])
        op.apply(time_m=1, time_M=nt - 1, dt=1)
        saved = np.asarray(usaved.data)
        for t in range(2, buffer_size + 2):
            assert np.all(saved[t] == (t * factor) - 1), t


class TestSymbolicFactor:

    def test_symbolic_factor(self):
        """Constant-valued subsampling factor, overridable at apply
        (reference: test_symbolic_factor:1331)."""
        g = Grid(shape=(4, 4, 4))
        u = TimeFunction(name='u', grid=g, time_order=0)
        fact = Constant(name='fact', dtype=np.int32, value=4)
        tsub = ConditionalDimension(name='tsub', parent=g.time_dim,
                                    factor=fact)
        usave = TimeFunction(name='usave', grid=g, time_dim=tsub, save=4)
        op = Operator([Eq(u, u + 1), Eq(usave, u)])
        op.apply(time=7, dt=1)
        assert np.all(np.asarray(usave.data)[0] == 1)
        assert np.all(np.asarray(usave.data)[1] == 5)

        u.data[:] = 0.
        op.apply(time=7, fact=2, dt=1)
        got = np.asarray(usave.data)
        assert np.all(got[0] == 1)
        assert np.all(got[1] == 3)
        assert np.all(got[2] == 5)
        assert np.all(got[3] == 7)

    def test_const_factor_accessors(self):
        """Factor accessors (reference: test_const_factor:1970)."""
        grid = Grid(shape=(4, 4))
        time = grid.time_dim
        t1 = ConditionalDimension('t_subA', parent=time, factor=4)
        f2 = Constant(name='f2cf', dtype=np.int32, value=4)
        t2 = ConditionalDimension('t_subB', parent=time, factor=f2)
        assert int(t1.factor) == 4
        assert t2.factor is f2 or int(getattr(t2.factor, 'data', t2.factor)) == 4
