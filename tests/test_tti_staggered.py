"""Staggered (first-order velocity/pressure) TTI kernel tests.

Reference parity: tests/test_adjoint.py layers-tti 'staggered' rows (2-D and
3-D, space orders 4/8, atol 1e-11 fp64) and the kernel construction in
examples/seismic/tti/operators.py:263-413 (kernel_staggered_2d/3d).
"""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu.builtins import inner, norm
from devito_tpu.models.seismic.tti import tti_setup


@pytest.mark.parametrize('shape, space_order', [
    ((30, 35), 8),
    ((30, 35), 4),
    ((24, 26, 22), 4),
])
def test_tti_staggered_adjoint(shape, space_order):
    """<F src, rec> == <src, F^T rec> at the reference tolerance (the
    explicit transpose-form kernel measures ~1e-16)."""
    solver = tti_setup(shape=shape, spacing=[15.] * len(shape), tn=500.,
                       space_order=space_order, nbl=10, kernel='staggered',
                       dtype=np.float64)
    rec, u, v, _ = solver.forward()
    assert np.isfinite(rec.data).all()
    srca, p, r, _ = solver.adjoint(rec=rec)
    term1 = inner(srca, solver.geometry.src)
    term2 = norm(rec) ** 2
    assert np.isclose((term1 - term2) / term1, 0., atol=1.e-11), \
        (term1, term2)


def test_tti_staggered_forward_propagates():
    """The wave reaches the receivers and stays finite."""
    solver = tti_setup(shape=(30, 35), spacing=(15., 15.), tn=500.,
                       space_order=8, kernel='staggered', nbl=10,
                       dtype=np.float64)
    rec, u, v, _ = solver.forward()
    assert np.isfinite(rec.data).all()
    assert norm(rec) > 1


def test_tti_staggered_vs_centered_kinematics():
    """Staggered and centered kernels must agree on arrival kinematics:
    the two receiver traces peak within a few samples of each other."""
    recs = {}
    for kernel in ('staggered', 'centered'):
        solver = tti_setup(shape=(30, 35), spacing=(15., 15.), tn=400.,
                           space_order=8, kernel=kernel, nbl=10,
                           dtype=np.float64)
        rec, _, _, _ = solver.forward()
        recs[kernel] = np.array(rec.data)
    mid = recs['staggered'].shape[1] // 2
    pk_s = np.argmax(np.abs(recs['staggered'][:, mid]))
    pk_c = np.argmax(np.abs(recs['centered'][:, mid]))
    assert abs(int(pk_s) - int(pk_c)) <= 12, (pk_s, pk_c)
