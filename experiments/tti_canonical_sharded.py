#!/usr/bin/env python
"""Sharded canonical TTI probe: 512 x 402 x 890 SO=12 on an 8-device
virtual mesh (VERDICT r4 item 5: the canonical config is multi-chip-
memory by the r4 diagnosis — 35.68 GB single-chip — yet never ran
sharded).  Measures wall time of build / compile / 2 steps so the test
and dryrun_multichip budgets can be set honestly.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python experiments/tti_canonical_sharded.py [nx ny nz] [so] [steps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    # the image's sitecustomize pins JAX_PLATFORMS=axon; honor an explicit
    # cpu request (same dance as tests/conftest.py)
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    shape = (512, 402, 890)
    if len(sys.argv) >= 4:
        shape = tuple(int(v) for v in sys.argv[1:4])
    so = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    nsteps = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from devito_tpu.models.seismic.tti import tti_setup
    from devito_tpu.parallel.distributor import Distributor
    devs = jax.devices()
    print(f'devices: {len(devs)} x {devs[0].device_kind}; shape {shape} '
          f'so={so}', flush=True)
    t0 = time.perf_counter()
    solver = tti_setup(shape=shape, spacing=(10.,) * 3, tn=100.,
                       space_order=so, nbl=8, nlayers=2)
    grid = solver.model.grid
    topo = (4, 2, 1)
    grid._distributor = Distributor(grid, topology=topo,
                                    devices=devs[:8])
    op = solver.op_fwd(save=None)
    print(f'build {time.perf_counter() - t0:.1f}s', flush=True)

    est = op.estimate_memory()
    per_shard = est / 8
    print(f'estimate_memory: {est / 2**30:.2f} GiB total, '
          f'{per_shard / 2**30:.2f} GiB/shard on {topo}', flush=True)

    t0 = time.perf_counter()
    rec, u, v, _ = solver.forward(time_M=nsteps - 1)
    val = float(np.abs(np.asarray(u.data[0])).max())
    print(f'{nsteps} steps (compile + run + fetch) '
          f'{time.perf_counter() - t0:.1f}s; |u| max {val:.3e}; '
          f'halo runner: {op._halo_runner_for() is not None}', flush=True)
    assert np.isfinite(val)


if __name__ == '__main__':
    main()
