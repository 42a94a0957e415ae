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


class TestInverseProblemBf16:
    """Gate the headline bf16-storage mode on the inverse problem
    (reference tolerances: tests/test_gradient.py:239-240 orders ~1/~2
    rtol 0.1; tests/test_adjoint.py:121 dot-product).

    Measured caveats (r3, documented in PERF_NOTES 'bf16 and the
    inverse problem'):
    - adjoint dot-product residual under bf16 storage: ~2.2e-3 relative
      (storage rounding breaks exact adjointness; fp64-compute baseline
      is ~2e-16). Asserted bound: 1e-2.
    - FWI gradient from bf16-stored wavefields carries ~1% error along
      the model-perturbation direction: the first-order Taylor slope
      stays ~1.0, but the second-order slope floors at ~1.5 over
      H in [0.5, 0.0078] (the H^2 term meets the H*dG noise floor).
      bf16 is an early-iteration mode; switch storage to fp32 for
      final FWI convergence.
    - checkpointed gradient replays identical bf16 rounding: bit-equal
      to the full-save gradient.
    """

    opt = ('advanced', {'storage-dtype': 'bfloat16'})

    def _setup(self, **kw):
        from devito_tpu.models.seismic import acoustic_setup
        base = dict(shape=(50, 60), spacing=(10., 10.), dtype=np.float64,
                    kernel='OT2', tn=400.0, space_order=4, nbl=40,
                    preset='layers-isotropic')
        base.update(kw)
        return acoustic_setup(**base)

    def test_adjoint_dot_product_bf16(self):
        from devito_tpu.builtins import inner, norm
        solver = self._setup(shape=(60, 70), spacing=[15., 15.], nbl=10,
                             tn=250., space_order=8, opt=self.opt)
        srca = solver.geometry.new_src(name='srca', src_type=None)
        rec = solver.forward(save=False)[0]
        solver.adjoint(rec=rec, srca=srca)
        term1 = inner(srca, solver.geometry.src)
        term2 = norm(rec) ** 2
        resid = abs((term1 - term2) / term1)
        assert resid < 1e-2, (term1, term2, resid)

    def test_gradientFWI_taylor_bf16(self):
        """bf16-stored gradient vs compute-precision objective: order-1
        slope ~1.0 (rtol 0.1); order-2 slope >= 1.4 (the documented
        bf16 floor; fp64 reaches ~2.0 — test_gradient.py)."""
        from devito_tpu import Function
        from devito_tpu.builtins import smooth
        from devito_tpu.models.seismic import Receiver
        from devito_tpu.models.seismic.acoustic import AcousticWaveSolver

        wave = self._setup(opt=self.opt)
        clean = AcousticWaveSolver(wave.model, wave.geometry,
                                   kernel='OT2', space_order=4)
        vel0 = Function(name='vel0', grid=wave.model.grid, space_order=4)
        smooth(vel0, wave.model.vp)
        v = wave.model.vp.data
        dm = (wave.model.vp.data ** (-2)
              - vel0.data ** (-2)).astype(np.float64)
        rec_true = np.array(clean.forward()[0].data)
        rec = wave.forward()[0]
        rec0, u0 = wave.forward(vp=vel0, save=True)[0:2]
        rec0c = clean.forward(vp=vel0)[0]
        F0 = .5 * np.linalg.norm(np.asarray(rec0c.data) - rec_true) ** 2
        residual = Receiver(name='rec_res', grid=wave.model.grid,
                            data=(np.asarray(rec0.data)
                                  - np.asarray(rec.data)),
                            time_range=wave.geometry.time_axis,
                            coordinates=wave.geometry.rec_positions)
        gradient, _ = wave.jacobian_adjoint(residual, u0, vp=vel0)
        G = np.dot(np.asarray(gradient.data).reshape(-1), dm.reshape(-1))
        H = [0.5, 0.25, .125, 0.0625, 0.0312, 0.015625, 0.0078125]
        error1, error2 = np.zeros(7), np.zeros(7)
        vel0d = np.asarray(vel0.data)
        for i in range(7):
            def initializer(data):
                data[:] = np.sqrt(vel0d ** 2 * v ** 2 /
                                  ((1 - H[i]) * v ** 2
                                   + H[i] * vel0d ** 2))
            vloc = Function(name=f'vlocb{i}', grid=wave.model.grid,
                            space_order=4, initializer=initializer)
            d = clean.forward(vp=vloc)[0]
            F_i = .5 * np.linalg.norm(
                (np.asarray(d.data) - rec_true).reshape(-1)) ** 2
            error1[i] = np.absolute(F_i - F0)
            error2[i] = np.absolute(F_i - F0 - H[i] * G)
        p1 = np.polyfit(np.log10(H), np.log10(error1), 1)
        p2 = np.polyfit(np.log10(H), np.log10(error2), 1)
        assert np.isclose(p1[0], 1.0, rtol=0.1), p1
        assert p2[0] >= 1.4, p2  # documented bf16 floor (~1.5)

    def test_checkpointed_gradient_bf16_bit_equal(self):
        """Checkpointed recompute replays identical bf16 rounding:
        gradient bit-equal to full-save (reference gate:
        test_gradient.py:60 atol=0 rtol=0)."""
        from devito_tpu import Function
        from devito_tpu.builtins import smooth
        from devito_tpu.models.seismic import Receiver

        wave = self._setup(shape=(40, 45), tn=250.0, nbl=20, opt=self.opt)
        vel0 = Function(name='vel0', grid=wave.model.grid, space_order=4)
        smooth(vel0, wave.model.vp)
        rec = wave.forward()[0]
        rec0, u0 = wave.forward(vp=vel0, save=True)[0:2]
        residual = Receiver(name='rec_res', grid=wave.model.grid,
                            data=(np.asarray(rec0.data)
                                  - np.asarray(rec.data)),
                            time_range=wave.geometry.time_axis,
                            coordinates=wave.geometry.rec_positions)
        g_full, _ = wave.jacobian_adjoint(residual, u0, vp=vel0)
        gf = np.array(g_full.data)
        g_ck, _ = wave.jacobian_adjoint(residual, u0, vp=vel0,
                                        checkpointing=True)
        assert np.array_equal(gf, np.array(g_ck.data))
