"""Viscoelastic forward parity vs reference norms.

Reference: examples/seismic/viscoelastic/viscoelastic_example.py asserts
norm(rec1)=12.62339, norm(rec2)=0.330103 at atol 1e-3 for the default run
config (layers preset, dt_scale=.9 per wavesolver.py:33-35). Verified
against the executed reference oracle: 12.623463 / 0.33010334.
"""

import numpy as np
import pytest

from devito_tpu.builtins import norm
from devito_tpu.models.seismic.viscoelastic import viscoelastic_setup


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_viscoelastic_forward_norms(dtype):
    s = viscoelastic_setup(shape=(50, 50), spacing=(20., 20.), tn=1000.,
                           space_order=4, nbl=40, dtype=dtype)
    rec1, rec2, v, tau, _ = s.forward()
    assert np.isfinite(rec1.data).all() and np.isfinite(rec2.data).all()
    assert np.isclose(norm(rec1), 12.62339, atol=1e-3, rtol=0)
    assert np.isclose(norm(rec2), 0.330103, atol=1e-3, rtol=0)


def test_viscoelastic_stability():
    """Long-run stability (reference test_viscoelastic_stability)."""
    s = viscoelastic_setup(shape=(51, 51), spacing=(20., 20.), tn=4000.,
                           space_order=4, nbl=0)
    rec1, rec2, v, tau, _ = s.forward()
    assert np.isfinite(norm(rec1))
