"""Builtins behavior matrix (reference: tests/test_builtins.py — assign
options, Gaussian smoothing vs scipy, initialize_function padding modes,
reductions). VERDICT r3 item 6."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, SubDomain,
                        ConditionalDimension)
from devito_tpu.builtins import (assign, initialize_function,
                                 gaussian_smooth, norm, inner, mmin, mmax)

scipy_ndimage = pytest.importorskip('scipy.ndimage')
gaussian_filter = scipy_ndimage.gaussian_filter


class TestAssign:

    def test_single_scalar(self):
        """(reference: test_single_scalar:25)."""
        grid = Grid(shape=(4, 4))
        f = Function(name='f', grid=grid)
        assign(f, 4)
        assert np.all(np.asarray(f.data) == 4)
        # the halo stays untouched
        assert not np.all(np.asarray(f.data_with_halo) == 4)

    def test_multiple_fns_single_scalar(self):
        grid = Grid(shape=(4, 4))
        fns = [Function(name=n, grid=grid) for n in 'fgh']
        assign(fns, 2)
        for fn in fns:
            assert np.all(np.asarray(fn.data) == 2)

    def test_multiple_fns_multiple_scalar(self):
        grid = Grid(shape=(4, 4))
        fns = [Function(name=n, grid=grid) for n in 'fgh']
        assign(fns, [1, 2, 3])
        for fn, v in zip(fns, (1, 2, 3)):
            assert np.all(np.asarray(fn.data) == v)

    def test_equations_with_options(self):
        """Per-function subdomain restriction (reference:
        test_equations_with_options:62)."""
        class CompDomain(SubDomain):
            name = 'comp_domain'

            def define(self, dimensions):
                return {d: ('middle', 1, 1) for d in dimensions}

        grid = Grid(shape=(4, 4))
        comp = CompDomain(grid=grid)
        f = Function(name='f', grid=grid)
        g = Function(name='g', grid=grid)
        assign([f, g], 2, options=[None, {'subdomain': comp}])
        assert np.all(np.asarray(f.data) == 2)
        assert np.array_equal(np.asarray(g.data),
                              np.array([[0, 0, 0, 0], [0, 2, 2, 0],
                                        [0, 2, 2, 0], [0, 0, 0, 0]],
                                       dtype=np.float32))

    def test_assign_subsampled_timefunction(self):
        """(reference: test_assign_subsampled_timefunction:87)."""
        grid = Grid(shape=(4, 4))
        time = grid.time_dim
        t_sub = ConditionalDimension('t_sub', parent=time, factor=4)
        f = TimeFunction(name='f', grid=grid, save=10, time_dim=t_sub)
        assign(f, 1)
        assert np.all(np.asarray(f.data) == 1)


class TestGaussianSmooth:

    @pytest.mark.parametrize('sigma', [1, 2])
    def test_gs_1d_int(self, sigma):
        a = np.arange(970, step=5)
        sp = gaussian_filter(a, sigma=sigma)
        dv = gaussian_smooth(a, sigma=sigma)
        assert np.amax(np.abs(sp - np.asarray(dv, dtype=sp.dtype))) <= 1

    @pytest.mark.parametrize('sigma', [1, 2])
    def test_gs_1d_float(self, sigma):
        a = np.array([1.2, 2.7, 3.9, 4.1, 5.2, 6.5, 7.1, 9.3, 11.0])
        sp = gaussian_filter(a, sigma=sigma)
        dv = np.asarray(gaussian_smooth(a, sigma=sigma))
        assert np.amax(np.abs(sp - dv)) <= 1e-5

    @pytest.mark.parametrize('sigma', [(1, 1), 2, (1, 3)])
    def test_gs_2d_float(self, sigma):
        rng = np.random.RandomState(0)
        a = rng.rand(48, 40) * 100 + 0.1
        sp = gaussian_filter(a, sigma=sigma)
        dv = np.asarray(gaussian_smooth(a, sigma=sigma))
        assert np.amax(np.abs(sp - dv)) <= 1e-5


class TestInitializeFunction:

    def test_if_serial_reflect(self):
        """(reference: test_if_serial:209)."""
        a = np.arange(16).reshape((4, 4))
        grid = Grid(shape=(12, 12))
        f = Function(name='f', grid=grid, dtype=np.int32)
        initialize_function(f, a, 4, mode='reflect')
        d = np.asarray(f.data)
        assert np.all(a[:, ::-1] - d[4:8, 0:4] == 0)
        assert np.all(a[:, ::-1] - d[4:8, 8:12] == 0)
        assert np.all(a[::-1, :] - d[0:4, 4:8] == 0)
        assert np.all(a[::-1, :] - d[8:12, 4:8] == 0)

    def test_if_serial_asymmetric(self):
        """(reference: test_if_serial_asymmetric:221)."""
        a = np.arange(35).reshape((7, 5))
        grid = Grid(shape=(12, 12))
        f = Function(name='f', grid=grid, dtype=np.int32)
        initialize_function(f, a, ((2, 3), (4, 3)), mode='reflect')
        d = np.asarray(f.data)
        assert np.all(a[:, -2::-1] - d[2:9, 0:4] == 0)
        assert np.all(a[:, :1:-1] - d[2:9, 9:12] == 0)
        assert np.all(a[1::-1, :] - d[0:2, 4:9] == 0)
        assert np.all(a[6:3:-1, :] - d[9:12, 4:9] == 0)

    def test_nbl_zero(self):
        """(reference: test_nbl_zero:233)."""
        a = np.arange(16).reshape((4, 4))
        grid = Grid(shape=(4, 4))
        f = Function(name='f', grid=grid, dtype=np.int32)
        initialize_function(f, a, 0)
        assert np.all(a - np.asarray(f.data) == 0)


class TestReductions:

    def test_inner_matches_numpy(self):
        grid = Grid(shape=(8, 8))
        f = Function(name='f', grid=grid)
        g = Function(name='g', grid=grid)
        rng = np.random.RandomState(0)
        f.data[:] = rng.rand(8, 8)
        g.data[:] = rng.rand(8, 8)
        want = float((np.asarray(f.data) * np.asarray(g.data)).sum())
        assert float(inner(f, g)) == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize('dtype', [np.float32, np.float64])
    def test_norm_dense_dtype(self, dtype):
        """(reference: test_norm_dense:383)."""
        grid = Grid(shape=(8, 8), dtype=dtype)
        f = Function(name='f', grid=grid)
        f.data[:] = 3.0
        assert float(norm(f)) == pytest.approx(np.sqrt(9.0 * 64), rel=1e-6)

    def test_min_max(self):
        grid = Grid(shape=(8, 8))
        f = Function(name='f', grid=grid)
        f.data[:] = 1.0
        f.data[2, 3] = -5.0
        f.data[5, 6] = 9.0
        assert float(mmin(f)) == -5.0
        assert float(mmax(f)) == 9.0
