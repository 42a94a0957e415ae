"""FWI gradient Taylor-convergence test.

Reference parity: tests/test_gradient.py test_gradientFWI:163-240 — the
first- and second-order Taylor error slopes of the FWI objective must be
~1.0 and ~2.0 (rtol 0.1).
"""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import Function
from devito_tpu.builtins import smooth
from devito_tpu.models.seismic import acoustic_setup, Receiver


class TestGradient:

    @pytest.mark.parametrize('dtype', [np.float64])
    @pytest.mark.parametrize('space_order', [4])
    def test_gradientFWI(self, dtype, space_order):
        wave = acoustic_setup(shape=(50, 60), spacing=(10., 10.),
                              dtype=dtype, kernel='OT2', tn=400.0,
                              space_order=space_order, nbl=40,
                              preset='layers-isotropic')

        vel0 = Function(name='vel0', grid=wave.model.grid,
                        space_order=space_order)
        smooth(vel0, wave.model.vp)
        v = wave.model.vp.data
        dm = (wave.model.vp.data ** (-2) - vel0.data ** (-2)).astype(dtype)

        # Receiver data for the true velocity
        rec = wave.forward()[0]
        # Receiver data + full wavefield for the smooth velocity
        rec0, u0 = wave.forward(vp=vel0, save=True)[0:2]

        F0 = .5 * np.linalg.norm(rec0.data - rec.data) ** 2

        residual = Receiver(name='rec_res', grid=wave.model.grid,
                            data=np.asarray(rec0.data) - np.asarray(rec.data),
                            time_range=wave.geometry.time_axis,
                            coordinates=wave.geometry.rec_positions)
        gradient, _ = wave.jacobian_adjoint(residual, u0, vp=vel0)
        G = np.dot(np.asarray(gradient.data).reshape(-1), dm.reshape(-1))

        H = [0.5, 0.25, .125, 0.0625, 0.0312, 0.015625, 0.0078125]
        error1 = np.zeros(7)
        error2 = np.zeros(7)
        vel0d = np.asarray(vel0.data)
        for i in range(7):
            def initializer(data):
                data[:] = np.sqrt(vel0d ** 2 * v ** 2 /
                                  ((1 - H[i]) * v ** 2 + H[i] * vel0d ** 2))
            vloc = Function(name=f'vloc{i}', grid=wave.model.grid,
                            space_order=space_order,
                            initializer=initializer)
            d = wave.forward(vp=vloc)[0]
            F_i = .5 * np.linalg.norm(
                (np.asarray(d.data) - np.asarray(rec.data)).reshape(-1)) ** 2
            error1[i] = np.absolute(F_i - F0)
            error2[i] = np.absolute(F_i - F0 - H[i] * G)

        p1 = np.polyfit(np.log10(H), np.log10(error1), 1)
        p2 = np.polyfit(np.log10(H), np.log10(error2), 1)
        assert np.isclose(p1[0], 1.0, rtol=0.1), p1
        assert np.isclose(p2[0], 2.0, rtol=0.1), p2
