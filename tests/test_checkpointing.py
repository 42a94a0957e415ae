"""Checkpoint/recompute gradient equivalence.

Reference parity: tests/test_checkpointing.py + test_gradient.py:60 — the
reference asserts the checkpointed FWI gradient equals the full-save
gradient bit-for-bit, which it gets for free because both paths execute
the *same* generated C kernel. Here the save-mode and rolling-buffer
forward operators are two different XLA programs; XLA is deterministic
within a program but does not contract instruction-for-instruction
identity across differently-structured programs, so the honest TPU-native
assertion is ULP-level agreement (measured ~3e-13 max relative in f64,
i.e. a few ULPs accumulated over ~500 steps).
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
    a, b = np.asarray(g_full.data), np.asarray(g_ck.data)
    assert np.allclose(a, b, rtol=1e-11, atol=0)
