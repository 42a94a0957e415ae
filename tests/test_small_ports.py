"""Ports of the reference's small test suites:

- tests/test_rebuild.py — Function reconstruction semantics
- tests/test_save.py — save=N vs rolling-buffer numerical identity, Buffer
- tests/test_grid.py — spacing dtype propagation
- tests/test_constant.py — runtime-updatable Constant as a time index
- tests/test_resample.py — source resampling by dt and by num
"""

import numpy as np
import pytest

from devito_tpu import (Buffer, Constant, Dimension, Eq, Function, Grid,
                        Operator, TimeFunction, solve)
from devito_tpu.models.seismic import demo_model
from devito_tpu.models.seismic.source import RickerSource, TimeAxis


class TestRebuild:
    """Reference tests/test_rebuild.py TestFunction."""

    def test_w_new_dims(self):
        x, y = Dimension('x'), Dimension('y')
        x0, y0 = Dimension('x0'), Dimension('y0')

        f = Function(name='f', dimensions=(x, y), shape=(11, 11))
        f.data[:] = 1

        f0 = f._rebuild(dimensions=(x0, y0))
        f1 = f._rebuild(dimensions=(x, y0))
        f2 = f._rebuild(dimensions=f.dimensions)

        assert f0.function is f0.function
        assert f0.dimensions == (x0, y0)
        assert np.all(np.array(f0.data) == 0)

        assert f1.dimensions == (x, y0)
        assert np.all(np.array(f1.data) == 0)

        # unchanged kwargs: same function, data preserved
        assert f2.function is f.function
        assert np.all(np.array(f2.data) == 1)

    def test_w_more_dims(self):
        grid = Grid(shape=(4, 4))
        d = Dimension('d')
        f = Function(name='f', grid=grid, space_order=2)

        with pytest.raises(ValueError):
            f._rebuild(dimensions=(d, *f.dimensions))

        f0 = f._rebuild(dimensions=(d, *f.dimensions), shape=(1, 4, 4))
        assert f0.dimensions == (d, *f.dimensions)
        assert f0.shape == (1, 4, 4)

    def test_rebuild_name_only(self):
        grid = Grid(shape=(5, 5))
        f = Function(name='f', grid=grid, space_order=4)
        g = f._rebuild(name='g')
        assert g.name == 'g'
        assert g.function.grid is grid
        assert g.space_order == 4

    def test_rebuild_timefunction(self):
        grid = Grid(shape=(5, 5))
        u = TimeFunction(name='u', grid=grid, time_order=2, save=7)
        v = u._rebuild(name='v')
        assert v.name == 'v'
        assert v.shape[0] == 7
        assert v.time_order == 2


class TestSave:
    """Reference tests/test_save.py — heat diffusion with full save vs
    rolling buffers produces identical final states."""

    @staticmethod
    def _initial(nt, nx, ny):
        xx, yy = np.meshgrid(np.linspace(0., 1., nx, dtype=np.float32),
                             np.linspace(0., 1., ny, dtype=np.float32))
        ui = np.zeros((nt, nx, ny), dtype=np.float32)
        r = (xx - .5) ** 2. + (yy - .5) ** 2.
        ui[0, np.logical_and(r >= .05, r <= .1)] = 1.
        return ui

    def _run(self, save, dx=0.02, dy=0.02, a=0.5, timesteps=50):
        nx, ny = int(1 / dx), int(1 / dy)
        dx2, dy2 = dx ** 2, dy ** 2
        dt = dx2 * dy2 / (2 * a * (dx2 + dy2))
        grid = Grid(shape=(nx, ny))
        u = TimeFunction(name='u', grid=grid,
                         save=timesteps if save else None,
                         time_order=1, space_order=2)
        init = self._initial(timesteps, nx, ny)
        u.data[:] = init[:u.shape[0]] if save else init[:u.shape[0]]
        eqn = Eq(u.dt, a * (u.dx2 + u.dy2))
        op = Operator(Eq(u.forward, solve(eqn, u.forward)))
        op.apply(time=timesteps - 2, dt=dt)
        return np.array(u.data[(timesteps - 1) % u.shape[0]])

    def test_save(self):
        assert np.array_equal(self._run(True), self._run(False))

    def test_buffer_api(self):
        grid = Grid(shape=(3, 3))
        u0 = TimeFunction(name='u', grid=grid, time_order=2)
        u1 = TimeFunction(name='u', grid=grid, save=20, time_order=2)
        u2 = TimeFunction(name='u', grid=grid, save=Buffer(2), time_order=2)
        assert u0.shape[TimeFunction._time_position] == 3
        assert u1.shape[TimeFunction._time_position] == 20
        assert u2.shape[TimeFunction._time_position] == 2
        assert u0._time_buffering
        assert not u1._time_buffering
        assert u2._time_buffering


class TestGridDtypes:
    """Reference tests/test_grid.py test_extent_dtypes."""

    @pytest.mark.parametrize('dtype', [
        np.float16, np.float32, np.float64, np.longdouble,
        np.complex64, np.complex128, np.int8, np.int16, np.int32,
        np.int64, np.uint8, np.uint16, np.uint32, np.uint64])
    def test_extent_dtypes(self, dtype):
        extent = (1, 1j) if np.issubdtype(dtype, np.complexfloating) \
            else (2, 4)
        grid = Grid(shape=(5, 5), extent=extent, dtype=dtype)
        dx, dy = grid.spacing_map.values()
        assert dx.dtype == dy.dtype == dtype
        assert dx == np.dtype(dtype).type(extent[0] / 4)
        assert dy == np.dtype(dtype).type(extent[1] / 4)


class TestConst:
    """Reference tests/test_constant.py — runtime-updated Constant
    indexing a saved wavefield."""

    def test_const_change(self):
        n = 5
        t = Constant(name='t', dtype=np.int32)
        grid = Grid(shape=(2, 2))
        x, y = grid.dimensions
        f = TimeFunction(name='f', grid=grid, save=n + 1)
        f.data[:] = 0
        stencil = Eq(f.forward, solve(Eq(f.dt - 1), f.forward))
        Operator([stencil]).apply(time_m=0, time_M=n - 1, dt=1)

        check = Function(name='check', grid=grid)
        op_test = Operator([Eq(check, f[t, x, y])])
        for j in range(0, n + 1):
            t.data = j
            op_test.apply(t=t)
            arr = np.array(check.data)
            assert np.amax(arr) == j
            assert np.amin(arr) == j


class TestResample:
    """Reference tests/test_resample.py."""

    def test_resample(self):
        shape = (21, 21, 21)
        spacing = (10., 10., 10.)
        f0, t0, tn = 0.01, 0.0, 500

        model = demo_model(preset='layers-isotropic', vp_top=1.,
                           vp_bottom=2., spacing=spacing, shape=shape,
                           nbl=10)
        time_range = TimeAxis(start=t0, stop=tn, step=model.critical_dt)
        src_a = RickerSource(name='src_a', grid=model.grid, f0=f0,
                             time_range=time_range)
        time_range_f = TimeAxis(start=t0,
                                step=time_range.step / (10 * np.sqrt(2)),
                                stop=time_range.stop)
        src_b = RickerSource(name='src_b', grid=model.grid, f0=f0,
                             time_range=time_range_f)

        # resample by dt
        src_c = src_b.resample(dt=src_a.time_range.step)
        end = min(src_a.data.shape[0], src_c.data.shape[0])
        assert np.allclose(np.array(src_a.data[:end]),
                           np.array(src_c.data[:end]), atol=1e-4)

        # resample by num
        src_d = RickerSource(name='src_d', grid=model.grid, f0=f0,
                             time_range=TimeAxis(
                                 start=time_range_f.start,
                                 stop=time_range_f.stop,
                                 num=src_a.time_range.num))
        src_e = src_b.resample(num=src_d.time_range.num)
        assert np.isclose(src_d.time_range.step, src_e.time_range.step)
        assert np.isclose(src_d.time_range.stop, src_e.time_range.stop)
        assert src_d.time_range.num == src_e.time_range.num
        assert np.allclose(np.array(src_d.data), np.array(src_e.data),
                           atol=1e-4)
