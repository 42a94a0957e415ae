"""Checkpoint/recompute gradient equivalence.

Reference parity: tests/test_checkpointing.py + test_gradient.py:60 — the
checkpointed FWI gradient must equal the full-save gradient bit-for-bit
(atol=0, rtol=0).
"""

import numpy as np

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import Function
from devito_tpu.builtins import smooth
from devito_tpu.models.seismic import acoustic_setup, Receiver


def test_checkpointed_gradient_equals_full():
    wave = acoustic_setup(shape=(40, 45), spacing=(10., 10.),
                          dtype=np.float64, kernel='OT2', tn=250.0,
                          space_order=4, nbl=20)
    vel0 = Function(name='vel0', grid=wave.model.grid, space_order=4)
    smooth(vel0, wave.model.vp)
    rec = wave.forward()[0]
    rec0, u0 = wave.forward(vp=vel0, save=True)[0:2]
    residual = Receiver(name='resid', grid=wave.model.grid,
                        data=np.asarray(rec0.data) - np.asarray(rec.data),
                        time_range=wave.geometry.time_axis,
                        coordinates=wave.geometry.rec_positions)
    g_full, _ = wave.jacobian_adjoint(residual, u0, vp=vel0)
    g_ck, _ = wave.jacobian_adjoint(residual, None, vp=vel0,
                                    checkpointing=True)
    assert np.allclose(np.asarray(g_full.data), np.asarray(g_ck.data),
                       rtol=0, atol=0)
