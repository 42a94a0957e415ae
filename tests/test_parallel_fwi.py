"""Multi-chip FWI gradient end-to-end (BASELINE config #5 analog).

Reference parity: tests/test_mpi.py TestIsotropicAcoustic (full distributed
acoustic forward + gradient runs vs serial). Here the mesh is the virtual
8-device host-CPU mesh (conftest), sharding via the Grid's Distributor;
results must match the single-device run at fp64 accuracy, including the
sharded `save=nt` wavefield.
"""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import Function, TimeFunction
from devito_tpu.models.seismic import acoustic_setup
from devito_tpu.parallel.distributor import Distributor


def _grad_run(shape, topology=None, checkpointing=False, spacing=12.5,
              tn=150., so=4):
    solver = acoustic_setup(shape=shape, spacing=[spacing] * len(shape),
                            kernel='OT2', nbl=6, tn=tn, space_order=so,
                            preset='layers-isotropic', dtype=np.float64)
    if topology is not None:
        ndev = int(np.prod(topology))
        if len(jax.devices()) < ndev:
            pytest.skip("not enough devices")
        solver.model.grid._distributor = Distributor(
            solver.model.grid, topology=topology,
            devices=jax.devices()[:ndev])
    rec, u, _ = solver.forward(save=not checkpointing)
    grad, _ = solver.jacobian_adjoint(rec, u, src=solver.geometry.src,
                                      checkpointing=checkpointing)
    usave = np.array(u.data) if not checkpointing else None
    return np.array(grad.data), np.array(rec.data), usave


@pytest.mark.parametrize('topology', [(4, 2), (2, 2)])
def test_sharded_fwi_gradient_2d(topology):
    g0, r0, u0 = _grad_run((36, 36))
    g1, r1, u1 = _grad_run((36, 36), topology=topology)
    assert np.allclose(r1, r0, rtol=1e-11, atol=1e-13)
    # sharded save=nt wavefield matches serial
    assert np.allclose(u1, u0, rtol=1e-11, atol=1e-13)
    assert np.allclose(g1, g0, rtol=1e-10, atol=1e-11)


def test_sharded_fwi_gradient_3d():
    g0, r0, u0 = _grad_run((20, 20, 12), tn=100.)
    g1, r1, u1 = _grad_run((20, 20, 12), topology=(4, 2, 1), tn=100.)
    assert np.allclose(r1, r0, rtol=1e-11, atol=1e-13)
    assert np.allclose(u1, u0, rtol=1e-11, atol=1e-13)
    assert np.allclose(g1, g0, rtol=1e-10, atol=1e-11)


def test_sharded_checkpointed_gradient_2d():
    """Checkpointed (store/recompute) gradient on a sharded mesh matches
    the serial checkpointed run."""
    g0, r0, _ = _grad_run((36, 36), checkpointing=True)
    g1, r1, _ = _grad_run((36, 36), topology=(2, 2), checkpointing=True)
    assert np.allclose(r1, r0, rtol=1e-11, atol=1e-13)
    assert np.allclose(g1, g0, rtol=1e-10, atol=1e-11)
