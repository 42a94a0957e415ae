"""Reduced-precision wavefield storage (opt 'storage-dtype').

The device buffer of written TimeFunctions stores bfloat16 while the
stencil arithmetic stays in the function's compute dtype — the TPU
redesign of the reference's dtype knob (reference:
devito/operator/operator.py dtype handling): HBM traffic halves, VPU
widens in-register.  Accuracy gates per VERDICT item 2b: forward error
vs the fp32 oracle bounded by the bf16 storage-rounding random walk
(~eps_bf16 * sqrt(nt)); the fp32/fp64 suites run without the option and
are untouched.
"""

import numpy as np
import pytest

from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve


def _diffusion(opt, nt=100, shape=(64, 64)):
    grid = Grid(shape=shape, extent=(1., 1.))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    xx, yy = np.meshgrid(np.linspace(0, 1, shape[0]),
                         np.linspace(0, 1, shape[1]), indexing='ij')
    u0 = np.exp(-((xx - .5) ** 2 + (yy - .5) ** 2) / 0.01)
    u.data[0] = u0
    u.data[1] = u0
    eq = Eq(u.forward, solve(Eq(u.dt, 0.1 * u.laplace), u.forward))
    op = Operator([eq], opt=opt)
    op.apply(time_M=nt, dt=1e-5)
    return np.asarray(u.data[0], dtype=np.float64), u, op


class TestStorageDtype:

    def test_error_bounded_vs_fp32(self):
        a, _, _ = _diffusion('advanced')
        b, _, _ = _diffusion(('advanced', {'storage-dtype': 'bfloat16'}))
        rel = np.abs(a - b).max() / np.abs(a).max()
        # eps_bf16 ~ 2^-8; random-walk over 100 steps ~ 4e-2
        assert 0 < rel < 0.08

    def test_device_buffer_is_narrow_compute_is_wide(self):
        import jax.numpy as jnp
        grid = Grid(shape=(32, 32), extent=(1., 1.))
        u = TimeFunction(name='u', grid=grid, space_order=2)
        u.data[0] = 1.0
        eq = Eq(u.forward, solve(Eq(u.dt, 0.1 * u.laplace), u.forward))
        op = Operator([eq], opt=('advanced',
                                 {'storage-dtype': 'bfloat16'}))
        op.apply(time_M=2, dt=1e-5)
        # device-authoritative output buffer is narrow...
        assert type(u)._dev_buf.dtype == jnp.bfloat16
        # ...but user-facing data comes back in the compute dtype
        assert np.asarray(u.data).dtype == np.float32
        # the jitted step upcasts rows: the update arithmetic runs f32
        hlo = op.hlo(time_M=2, dt=1e-5)
        assert 'bf16' in hlo and 'f32' in hlo

    def test_scope_all_narrows_coefficients(self):
        import jax.numpy as jnp
        grid = Grid(shape=(32, 32), extent=(1., 1.))
        u = TimeFunction(name='u', grid=grid, space_order=2)
        c = Function(name='c', grid=grid)
        c.data[:] = 0.1
        eq = Eq(u.forward, solve(Eq(u.dt, c * u.laplace), u.forward))
        op = Operator([eq], opt=('advanced',
                                 {'storage-dtype': 'bfloat16',
                                  'storage-dtype-scope': 'all'}))
        op.apply(time_M=3, dt=1e-5)
        assert type(c)._dev_buf.dtype == jnp.bfloat16
        assert np.asarray(c.data).dtype == np.float32

    def test_mode_is_per_operator_and_reversible(self):
        # running the same function through a plain operator afterwards
        # restores fp32 device storage, preserving (rounded) values
        _, u, _ = _diffusion(('advanced', {'storage-dtype': 'bfloat16'}),
                             nt=4)
        val = np.asarray(u.data[0]).copy()
        grid = u.grid
        eq = Eq(u.forward, u)  # identity step
        op2 = Operator([eq])
        op2.apply(time_m=0, time_M=0)
        assert type(u)._dev_buf is None or \
            np.asarray(type(u)._dev_buf).dtype != np.dtype('bfloat16')
        assert np.allclose(np.asarray(u.data[0]), val, atol=0)

    def test_source_injection_and_receivers(self):
        # full seismic path: bf16-stored wavefield with sparse inject +
        # interp stays close to the fp32 run
        from devito_tpu.models.seismic import (demo_model,
                                               AcquisitionGeometry,
                                               AcousticWaveSolver)

        def run(opt):
            model = demo_model('layers-isotropic', shape=(61, 61),
                               spacing=(10., 10.), nbl=10, space_order=4)
            geometry = AcquisitionGeometry(
                model, np.stack([np.linspace(0, 600, 31),
                                 np.full(31, 20.)], 1),
                np.array([[300., 20.]]), 0., 400., f0=0.010,
                src_type='Ricker')
            solver = AcousticWaveSolver(model, geometry, space_order=4,
                                        opt=opt)
            rec, u, _ = solver.forward()
            return np.asarray(rec.data, dtype=np.float64)

        r32 = run('advanced')
        r16 = run(('advanced', {'storage-dtype': 'bfloat16'}))
        num = np.linalg.norm(r32 - r16)
        den = np.linalg.norm(r32)
        assert den > 1
        assert num / den < 0.05

    def test_sharded_matches_serial_bf16(self):
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 virtual devices")
        from devito_tpu.parallel.distributor import Distributor

        opt = ('advanced', {'storage-dtype': 'bfloat16'})

        def run(topology):
            grid = Grid(shape=(64, 64), extent=(1., 1.),
                        topology=topology)
            u = TimeFunction(name='u', grid=grid, space_order=2)
            xx, yy = np.meshgrid(np.linspace(0, 1, 64),
                                 np.linspace(0, 1, 64), indexing='ij')
            u0 = np.exp(-((xx - .5) ** 2 + (yy - .5) ** 2) / 0.01)
            u.data[0] = u0
            u.data[1] = u0
            eq = Eq(u.forward, solve(Eq(u.dt, 0.1 * u.laplace),
                                     u.forward))
            op = Operator([eq], opt=opt)
            op.apply(time_M=20, dt=1e-5)
            return np.asarray(u.data[0], dtype=np.float64)

        a = run(None)
        b = run(('*', '*'))
        # identical arithmetic order per point: bitwise-equal rounding
        assert np.allclose(a, b, atol=5e-7)
