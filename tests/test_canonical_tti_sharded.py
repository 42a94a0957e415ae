"""The canonical TTI benchmark shape, SHARDED (VERDICT r4 item 5).

512 x 402 x 890 SO=12 (/root/reference/benchmarks/user/README.md:169-190)
needs ~36 GB — a multi-chip-memory config by the r4 diagnosis
(PERF_NOTES) — and had never run sharded. Here it runs end-to-end on the
8-device virtual mesh for a short time window, plus estimate_memory
confirms per-shard fit for a v5p-16 (8-chip) slice.

The execution test runs a 2-step window and asserts finiteness + the
explicit halo path, not numerics (the TTI distributed-numerics parity
matrix runs at small shapes in test_distributed_matrix.py). Measured
cost on this host's single CPU core: ~30 min for compile + 2 steps
(experiments/tti_canonical_sharded.py, 2026-08-20: "2 steps (compile +
run + fetch) 1789.1s; halo runner: True", wavefield finite) — far past a
unit-test budget, so it is gated behind DTPU_SLOW=1; the estimate_memory
test (model build only, ~150 s) always runs.
"""

import os

import numpy as np
import pytest

import jax


CANON = (512, 402, 890)


def test_canonical_tti_estimate_memory_fits_v5p16():
    """estimate_memory at the canonical shape: total ~36 GB, per-shard
    on an 8-chip v5p-16 slice well under the 95 GB HBM/chip."""
    from devito_tpu.models.seismic.tti import tti_setup
    from devito_tpu.parallel.distributor import Distributor
    from devito_tpu.arch import platform_registry

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    solver = tti_setup(shape=CANON, spacing=(10.,) * 3, tn=100.,
                       space_order=12, nbl=8, nlayers=2)
    grid = solver.model.grid
    grid._distributor = Distributor(grid, topology=(4, 2, 1),
                                    devices=jax.devices()[:8])
    op = solver.op_fwd(save=None)
    est = op.estimate_memory()
    per_shard = est / 8
    v5p = platform_registry['tpu-v5p'].hbm_bytes
    # the r4 single-chip diagnosis: ~36 GB total at this config
    assert est > 16 * 2 ** 30, est
    assert per_shard < 0.5 * v5p, (per_shard, v5p)


@pytest.mark.skipif(not os.environ.get('DTPU_SLOW'),
                    reason="~30 min on one CPU core (measured; see module "
                           "docstring) — run with DTPU_SLOW=1")
def test_canonical_tti_sharded_executes():
    """One short sharded window of the canonical config on the virtual
    mesh: compiles, executes on the explicit halo path, stays finite."""
    from devito_tpu.models.seismic.tti import tti_setup
    from devito_tpu.parallel.distributor import Distributor

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    solver = tti_setup(shape=CANON, spacing=(10.,) * 3, tn=100.,
                       space_order=12, nbl=8, nlayers=2)
    grid = solver.model.grid
    grid._distributor = Distributor(grid, topology=(4, 2, 1),
                                    devices=jax.devices()[:8])
    rec, u, v, _ = solver.forward(time_M=1)
    op = solver.op_fwd(save=None)
    assert op._halo_runner_for() is not None, \
        "canonical TTI fell back to GSPMD"
    # slots 1/2 hold the two computed steps (slot 0 is the untouched
    # initial buffer)
    ud = np.asarray(u.data)
    assert np.isfinite(ud).all()
    assert np.abs(ud[1:]).max() > 0
