"""Builtin reductions and initializers (reference:
tests/test_builtins.py — norm/sumall/inner/mmin/mmax, assign,
gaussian_smooth, initialize_function), including mesh-sharded variants
(the reference's MPI-safe DistReduce contract)."""

import numpy as np
import pytest

from devito_tpu import Grid, Function, TimeFunction, Eq, Operator
from devito_tpu.builtins import (norm, inner, mmin, mmax, sumall, assign,
                                 initialize_function, gaussian_smooth)


class TestReductions:
    def _f(self, grid=None):
        g = grid or Grid(shape=(12, 12), extent=(11., 11.),
                         dtype=np.float64)
        f = Function(name='f', grid=g, dtype=np.float64)
        f.data[:] = np.arange(144.).reshape(12, 12) - 70.
        return f

    def test_norm(self):
        f = self._f()
        ref = np.linalg.norm(np.arange(144.) - 70.)
        assert np.isclose(norm(f), ref, rtol=1e-12)

    def test_norm_l1(self):
        f = self._f()
        ref = np.abs(np.arange(144.) - 70.).sum()
        assert np.isclose(norm(f, order=1), ref, rtol=1e-12)

    def test_inner(self):
        f = self._f()
        g2 = Grid(shape=(12, 12), extent=(11., 11.), dtype=np.float64)
        h = Function(name='h', grid=g2, dtype=np.float64)
        h.data[:] = 2.
        assert np.isclose(inner(f, f), norm(f) ** 2, rtol=1e-12)

    def test_mmin_mmax_sumall(self):
        f = self._f()
        assert mmin(f) == -70.
        assert mmax(f) == 73.
        assert np.isclose(sumall(f), (np.arange(144.) - 70.).sum())

    def test_norm_sharded_matches_serial(self):
        """Reductions over a sharded mesh equal the serial value
        (reference: DistReduce / MPI_Allreduce contract)."""
        g = Grid(shape=(16, 16), extent=(15., 15.), dtype=np.float64,
                 topology=('*', '*'))
        u = TimeFunction(name='u', grid=g, space_order=2)
        u.data[0, 8, 8] = 1.
        Operator(Eq(u.forward, u + 1), subs=g.spacing_map).apply(
            time_M=3, dt=1.)
        sharded = norm(u)
        serial = np.linalg.norm(np.asarray(u.data))
        assert np.isclose(sharded, serial, rtol=1e-12)


class TestInitializers:
    def test_assign(self):
        g = Grid(shape=(10, 10))
        f = Function(name='f', grid=g)
        h = Function(name='h', grid=g)
        assign([f, h], [3., 4.])
        assert np.allclose(f.data, 3.) and np.allclose(h.data, 4.)

    def test_initialize_function_modes(self):
        g = Grid(shape=(14, 14))
        data = np.arange(100.).reshape(10, 10)
        for mode in ('constant', 'reflect'):
            f = Function(name=f'f_{mode}', grid=g)
            initialize_function(f, data, nbl=2, mode=mode)
            d = np.asarray(f.data)
            assert np.array_equal(d[2:-2, 2:-2], data)
            if mode == 'constant':
                assert d[0, 5] == d[2, 5]   # edge replicate
            else:
                assert d[1, 5] == d[2, 5]   # mirror incl. edge (symmetric)

    def test_gaussian_smooth_preserves_mean(self):
        g = Grid(shape=(20, 20))
        f = Function(name='f', grid=g, dtype=np.float64)
        rng = np.random.default_rng(0)
        f.data[:] = rng.standard_normal((20, 20))
        raw_std = float(np.std(np.asarray(f.data)))
        sm = gaussian_smooth(f, sigma=2)
        d = np.asarray(sm.data)
        assert np.isfinite(d).all()
        assert float(np.std(d)) < raw_std  # smoothing reduces variance
