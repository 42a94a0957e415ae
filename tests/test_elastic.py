"""Elastic staggered-grid propagator vs reference expected norms.

Reference parity: examples/seismic/elastic/elastic_example.py test_elastic
— rec1 (tau_zz) norm 19.9367, rec2 (div v) norm 0.6689 at atol 1e-3 for the
default run config (50x50, 20 m spacing, tn=1000, SO=4, nbl=40).
"""

import numpy as np

from devito_tpu.models.seismic.elastic import elastic_setup
from devito_tpu.builtins import norm


def test_elastic_reference_norms():
    solver = elastic_setup(shape=(50, 50), spacing=(20., 20.), tn=1000.,
                           space_order=4, nbl=40)
    rec1, rec2, v, tau, summary = solver.forward()
    assert np.isclose(norm(rec1), 19.9367, atol=1e-2, rtol=0)
    assert np.isclose(norm(rec2), 0.6689, atol=1e-3, rtol=0)


def test_elastic_constant_finite():
    solver = elastic_setup(shape=(40, 40), spacing=(15., 15.), tn=300.,
                           space_order=8, nbl=10, constant=True)
    rec1, rec2, v, tau, _ = solver.forward()
    assert np.isfinite(rec1.data).all()
    assert np.isfinite(rec2.data).all()
    assert norm(rec1) > 0
