#!/usr/bin/env python
"""Multi-chip weak-scaling benchmark: fixed per-device tile, growing mesh.

Measures the halo-exchange overhead of the sharded acoustic step on an
N-device mesh (virtual host-CPU mesh by default — the TPU analog of the
reference's oversubscribed localhost mpiexec runs, conftest.py:180-218):

    overhead(N) = t_step(N devices, N tiles) / t_step(1 device, 1 tile) - 1

Prints one JSON line per mesh size:
    {"ndev": N, "topology": [...], "ms_per_step": ..., "halo_overhead": ...}

Caveat: on the VIRTUAL host-CPU mesh the absolute overhead is dominated by
XLA's thread-based device emulation (every per-step collective is a host
thread barrier), so the numbers are only meaningful RELATIVELY — e.g.
explicit shard_map+ppermute vs GSPMD at the same mesh size (measured: the
explicit path roughly halves the 8-device overhead). On real ICI the same
per-step halo slab ppermute is microseconds; use this harness on real
multi-chip hardware for absolute numbers.

Run: python benchmarks/weak_scaling.py [--mode explicit|gspmd|auto]
     [--tile 256] [--steps 30] [--ndev 1,2,4,8]
"""

import argparse
import json
import os
import subprocess
import sys
import time


def child_main(args):
    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from devito_tpu import (Grid, TimeFunction, Function, Eq, Operator,
                            solve, configuration)
    from devito_tpu.parallel.distributor import Distributor, compute_dims

    configuration['halo'] = args.mode
    tile = args.tile
    steps = args.steps
    results = []
    for ndev in [int(v) for v in args.ndev.split(',')]:
        if len(jax.devices()) < ndev:
            continue
        topo = compute_dims(ndev, 2)
        shape = (tile * topo[0], tile * topo[1])
        grid = Grid(shape=shape,
                    extent=tuple(float(s - 1) * 10 for s in shape),
                    dtype=np.float32)
        if ndev > 1:
            grid._distributor = Distributor(grid, topology=topo,
                                            devices=jax.devices()[:ndev])
        u = TimeFunction(name='u', grid=grid, time_order=2, space_order=8)
        vp = Function(name='vp', grid=grid, space_order=8)
        vp.data[:] = 1.5
        u.data[0, shape[0] // 2, shape[1] // 2] = 1.0
        st = solve((1 / (vp * vp)) * u.dt2 - u.laplace, u.forward)
        op = Operator(Eq(u.forward, st), subs=grid.spacing_map,
                      name=f'WeakScale{ndev}')
        dt = 0.5
        op.apply(time_m=0, time_M=1, dt=dt)  # warmup/jit
        t0 = time.perf_counter()
        op.apply(time_m=0, time_M=steps - 1, dt=dt)
        float(np.asarray(u._device_array()).ravel()[0])
        ms = (time.perf_counter() - t0) / steps * 1e3
        results.append((ndev, topo, ms))

    base = results[0][2] if results else None
    for ndev, topo, ms in results:
        print(json.dumps({
            "ndev": ndev, "topology": list(topo), "mode": args.mode,
            "tile": tile, "ms_per_step": round(ms, 3),
            "halo_overhead": round(ms / base - 1, 4) if base else None,
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', default='auto',
                    choices=['auto', 'explicit', 'gspmd'])
    ap.add_argument('--tile', type=int, default=256)
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--ndev', default='1,2,4,8')
    ap.add_argument('--child', action='store_true')
    args = ap.parse_args()

    if args.child or os.environ.get('_WEAK_SCALE_CHILD') == '1':
        child_main(args)
        return

    n = max(int(v) for v in args.ndev.split(','))
    env = dict(os.environ)
    env['_WEAK_SCALE_CHILD'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'host_platform_device_count' not in f]
    flags.append(f'--xla_force_host_platform_device_count={n}')
    env['XLA_FLAGS'] = ' '.join(flags)
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        '--child'] + sys.argv[1:], env=env)
    sys.exit(r.returncode)


if __name__ == '__main__':
    main()
