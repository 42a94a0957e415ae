#!/usr/bin/env python
"""Canonical TTI benchmark shape: 512 x 402 x 890, SO=12 (the reference's
blessed config, /root/reference/benchmarks/user/README.md:169-190 —
VERDICT r3 item 4 / r4: never previously run).

Exercises CIRE, unaligned extents (402 % 8 != 0 sublanes, 890 % 128 != 0
lanes) and x-chunking at once. Device-trace timed (the tunnel lies to
wall clocks — bench.py docstring).

Usage: python experiments/tti_canonical.py [nx ny nz] [so] [steps]
"""
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import parse_trace_period  # noqa: E402


def main():
    import jax
    shape = (512, 402, 890)
    if len(sys.argv) >= 4:
        shape = tuple(int(v) for v in sys.argv[1:4])
    so = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    nsteps = int(sys.argv[5]) if len(sys.argv) > 5 else 16

    from devito_tpu.models.seismic.tti import tti_setup
    print(f'device: {jax.devices()[0].device_kind}; shape {shape} '
          f'so={so}', flush=True)
    t0 = time.perf_counter()
    solver = tti_setup(shape=shape, spacing=(10.,) * 3, tn=100.,
                       space_order=so, nbl=8, nlayers=2,
                       opt=('advanced', {'storage-dtype': 'bfloat16'}))
    op = solver.op_fwd(save=None)
    print(f'build {time.perf_counter() - t0:.1f}s', flush=True)

    # ONE cold apply inside the trace: this shape runs at ~95% HBM
    # (temp_size ~10 GiB, memory_analysis) and a second apply OOMs —
    # per-step gaps in the timeline are unaffected by the in-trace
    # compile (round-5 PERF_NOTES, 'z-quarter memory margin')
    tdir = tempfile.mkdtemp(prefix='tti_canon_')
    try:
        import jax.profiler
        with jax.profiler.trace(tdir):
            t0 = time.perf_counter()
            rec, u, v, _ = solver.forward(time_M=nsteps - 1)
            print(f'apply (incl compile) {time.perf_counter() - t0:.1f}s',
                  flush=True)
            t0 = time.perf_counter()
            val = float(np.asarray(u.data[1])[tuple(
                s // 2 for s in shape)])
            print(f'fetch {time.perf_counter() - t0:.1f}s '
                  f'(u center {val:.3e})', flush=True)
        period = parse_trace_period(tdir, nsteps)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    if period:
        pts = float(np.prod(shape))
        print(f'TTI {shape} SO={so}: {period*1e3:.2f} ms/step = '
              f'{pts/period/1e9:.2f} GPts/s (device trace, {nsteps} steps)',
              flush=True)
    else:
        print('trace parse failed', flush=True)


if __name__ == '__main__':
    main()
