"""Self-adjoint iso propagator tests.

Reference parity: examples/seismic/self_adjoint/test_wavesolver_iso.py —
adjoint dot test (the operator pair is self-adjoint up to src/rec scaling)
and forward linearity.
"""

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu.builtins import norm, inner
from devito_tpu.models.seismic.self_adjoint import sa_setup


def test_sa_adjoint_dot():
    s = sa_setup(shape=(41, 41), spacing=(10., 10.), tn=250.,
                 space_order=8, dtype=np.float64)
    rec, u, _ = s.forward()
    assert np.isfinite(rec.data).all() and norm(rec) > 1
    srca, v, _ = s.adjoint(rec)
    t1 = inner(srca, s.geometry.src)
    t2 = norm(rec) ** 2
    assert np.isclose((t1 - t2) / t1, 0., atol=1e-11)


def test_sa_linearity_forward():
    s = sa_setup(shape=(41, 41), spacing=(10., 10.), tn=150.,
                 space_order=8, dtype=np.float64)
    src = s.geometry.src
    a = 2.5
    rec1 = np.asarray(s.forward(src=src)[0].data).copy()
    src2 = s.geometry.new_src(name='src2', src_type=None)
    src2.data[:] = a * np.asarray(src.data)
    rec2 = np.asarray(s.forward(src=src2)[0].data).copy()
    assert np.allclose(rec2, a * rec1, rtol=1e-10)
