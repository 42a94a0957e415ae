"""Save-wavefield host streaming (reference: buffering + tasking +
Orchestrator, devito/passes/clusters/buffering.py:27, asynchrony.py —
here a chunked time loop with host<->device window transfers,
Operator._apply_streamed)."""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import switchconfig
from devito_tpu.models.seismic import acoustic_setup


def _forward(shape, stream_budget=None, tn=120.):
    solver = acoustic_setup(shape=shape, spacing=[12.5] * len(shape),
                            kernel='OT2', nbl=6, tn=tn, space_order=4,
                            preset='layers-isotropic', dtype=np.float64)
    if stream_budget is None:
        rec, u, _ = solver.forward(save=True)
    else:
        with switchconfig(**{'save-streaming': 'on',
                             'save-budget': stream_budget}):
            op = solver.op_fwd(True)
            rec, u, _ = solver.forward(save=True)
            assert op._stream_plan is not None, \
                "streaming did not engage"
    return solver, np.array(rec.data), np.array(u.data)


def test_streamed_forward_matches_resident():
    """Chunked host-streamed save wavefield is bit-identical to the
    device-resident run."""
    _, rec0, u0 = _forward((36, 36))
    _, rec1, u1 = _forward((36, 36), stream_budget=u0.nbytes // 6)
    assert np.array_equal(rec1, rec0)
    assert np.array_equal(u1, u0)


def test_streamed_gradient_matches_resident():
    """FWI gradient consuming a host-streamed saved wavefield equals the
    fully-resident gradient."""
    solver, rec0, _ = _forward((36, 36))
    rec_arr = rec0

    def grad_run(budget):
        solver = acoustic_setup(shape=(36, 36), spacing=[12.5, 12.5],
                                kernel='OT2', nbl=6, tn=120., space_order=4,
                                preset='layers-isotropic', dtype=np.float64)
        if budget is None:
            rec, u, _ = solver.forward(save=True)
            g, _ = solver.jacobian_adjoint(rec, u, src=solver.geometry.src)
        else:
            with switchconfig(**{'save-streaming': 'on',
                                 'save-budget': budget}):
                rec, u, _ = solver.forward(save=True)
                g, _ = solver.jacobian_adjoint(rec, u,
                                               src=solver.geometry.src)
                assert solver.op_grad()._stream_plan is not None
        return np.array(g.data)

    g0 = grad_run(None)
    g1 = grad_run(400_000)
    assert np.allclose(g1, g0, rtol=1e-12, atol=1e-13)


def test_memory_estimate_layers():
    """estimate_memory(layers=True) reports the windowed device footprint
    and the host-resident history."""
    solver = acoustic_setup(shape=(36, 36), spacing=[12.5, 12.5],
                            kernel='OT2', nbl=6, tn=120., space_order=4,
                            preset='layers-isotropic', dtype=np.float64)
    op = solver.op_fwd(True)
    full = op.estimate_memory()
    with switchconfig(**{'save-streaming': 'on', 'save-budget': 300_000}):
        layered = op.estimate_memory(layers=True)
    assert layered['host'] > 0
    assert layered['device'] < full
    assert layered['device'] + layered['host'] > full  # history kept on host


def test_streamed_sharded_forward():
    """Streaming composes with a sharded mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from devito_tpu.parallel.distributor import Distributor
    _, rec0, u0 = _forward((36, 36))

    solver = acoustic_setup(shape=(36, 36), spacing=[12.5, 12.5],
                            kernel='OT2', nbl=6, tn=120., space_order=4,
                            preset='layers-isotropic', dtype=np.float64)
    solver.model.grid._distributor = Distributor(
        solver.model.grid, topology=(2, 2), devices=jax.devices()[:4])
    with switchconfig(**{'save-streaming': 'on',
                         'save-budget': u0.nbytes // 6}):
        rec1, u1, _ = solver.forward(save=True)
    assert np.allclose(np.array(rec1.data), rec0, rtol=1e-12, atol=1e-14)
    assert np.allclose(np.array(u1.data), u0, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize('topology', [(2, 2), (4, 1)])
def test_streamed_sharded_explicit_matches_serial(topology):
    """Save-streaming on the EXPLICIT halo path: per-chunk save-row
    windows are pushed/pulled through ShardedRunner.convert/restore
    around the shard_map'd chunk executable — the reference's MPI +
    Orchestrator composition (devito/passes/iet/orchestration.py:29 +
    mpi/routines.py), which round 2 excluded (streamed saves silently
    fell back to GSPMD)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from devito_tpu.parallel.distributor import Distributor
    _, rec0, u0 = _forward((36, 36))

    solver = acoustic_setup(shape=(36, 36), spacing=[12.5, 12.5],
                            kernel='OT2', nbl=6, tn=120., space_order=4,
                            preset='layers-isotropic', dtype=np.float64)
    solver.model.grid._distributor = Distributor(
        solver.model.grid, topology=topology, devices=jax.devices()[:4])
    with switchconfig(halo='explicit', **{'save-streaming': 'on',
                                          'save-budget': u0.nbytes // 6}):
        op = solver.op_fwd(True)
        rec1, u1, _ = solver.forward(save=True)
        assert op._stream_plan is not None, "streaming did not engage"
        assert op._halo_runner is not None, "explicit path did not engage"
    assert np.array_equal(np.array(rec1.data), rec0)
    assert np.array_equal(np.array(u1.data), u0)


def test_streamed_sharded_explicit_gradient():
    """FWI gradient consuming a host-streamed saved wavefield on the
    explicit sharded path equals the serial fully-resident gradient."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from devito_tpu.parallel.distributor import Distributor

    def grad_run(budget, topology):
        solver = acoustic_setup(shape=(36, 36), spacing=[12.5, 12.5],
                                kernel='OT2', nbl=6, tn=120., space_order=4,
                                preset='layers-isotropic', dtype=np.float64)
        if topology is not None:
            solver.model.grid._distributor = Distributor(
                solver.model.grid, topology=topology,
                devices=jax.devices()[:4])
        if budget is None:
            rec, u, _ = solver.forward(save=True)
            g, _ = solver.jacobian_adjoint(rec, u, src=solver.geometry.src)
        else:
            with switchconfig(halo='explicit',
                              **{'save-streaming': 'on',
                                 'save-budget': budget}):
                rec, u, _ = solver.forward(save=True)
                g, _ = solver.jacobian_adjoint(rec, u,
                                               src=solver.geometry.src)
                assert solver.op_grad()._stream_plan is not None
                assert solver.op_grad()._halo_runner is not None
        return np.array(g.data)

    g0 = grad_run(None, None)
    g1 = grad_run(400_000, (2, 2))
    assert np.allclose(g1, g0, rtol=1e-12, atol=1e-13)
