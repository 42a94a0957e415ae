"""Viscoacoustic propagators: forward sanity + adjoint dot tests for all
rheologies x formulation orders.

Reference parity: tests/test_adjoint.py viscoacoustic rows (sls/kv/maxwell,
time_order 1 and 2) at atol 1e-11 fp64.
"""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu.builtins import norm, inner
from devito_tpu.models.seismic.viscoacoustic import viscoacoustic_setup


@pytest.mark.parametrize('kernel', ['sls', 'kv', 'maxwell'])
@pytest.mark.parametrize('time_order', [1, 2])
def test_viscoacoustic_adjoint(kernel, time_order):
    solver = viscoacoustic_setup(shape=(21, 25), spacing=(20., 20.),
                                 tn=250., space_order=4, nbl=10,
                                 kernel=kernel, time_order=time_order,
                                 dtype=np.float64)
    rec, p, v, _ = solver.forward()
    assert np.isfinite(rec.data).all()
    assert norm(rec) > 1
    srca, pa, _ = solver.adjoint(rec)
    term1 = inner(srca, solver.geometry.src)
    term2 = norm(rec) ** 2
    assert np.isclose((term1 - term2) / term1, 0., atol=1e-11), \
        (term1, term2)
