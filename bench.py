#!/usr/bin/env python
"""Headline benchmark: 3-D acoustic SO=8 forward modeling, GPts/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference (FAQ.md:826): GPts/s = grid points x
timesteps / wall seconds, steady-state (post-jit) timing. ``vs_baseline``
is the achieved fraction of the BASELINE.md target (80% of the per-chip
HBM-bandwidth roofline for this stencil).
"""

import json
import os
import sys
import time

import numpy as np


def roofline_gpts(device_kind, bytes_per_point):
    """HBM-bandwidth roofline in GPts/s for a memory-bound stencil."""
    kind = device_kind.lower()
    if 'v5p' in kind or 'v5 p' in kind:
        bw = 2765e9
    elif 'v5' in kind:  # v5e / v5 lite
        bw = 819e9
    elif 'v4' in kind:
        bw = 1228e9
    elif 'v6' in kind:
        bw = 1640e9
    else:  # CPU or unknown: report vs an arbitrary 100 GB/s
        bw = 100e9
    return bw / bytes_per_point / 1e9


def _watchdog(seconds):
    """Emit a zero-value line and hard-exit if the device wedges (the
    remote TPU tunnel can hang mid-RPC); keeps the driver's bench step
    from timing out without output."""
    import threading

    def _fire():
        print(json.dumps({
            "metric": "acoustic3d_so8_forward_gpts_per_chip",
            "value": 0.0, "unit": "GPts/s", "vs_baseline": 0.0,
            "note": f"device unresponsive after {seconds}s",
        }), flush=True)
        import os as _os
        _os._exit(3)

    t = threading.Timer(seconds, _fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax
    from devito_tpu import configuration
    # the Pallas backend is opt-in for benchmarking until its pipelined v2
    # beats the XLA slice path
    configuration['backend'] = os.environ.get('BENCH_BACKEND', 'xla')
    from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve
    from devito_tpu.models.seismic import demo_model, AcquisitionGeometry
    from devito_tpu.models.seismic.acoustic import ForwardOperator

    timer = _watchdog(int(os.environ.get('BENCH_TIMEOUT', 480)))

    n = int(os.environ.get('BENCH_SIZE', 256))
    so = int(os.environ.get('BENCH_SO', 8))
    steps = int(os.environ.get('BENCH_STEPS', 512))
    shape = (n, n, n)

    dev = jax.devices()[0]
    kind = getattr(dev, 'device_kind', str(dev))

    # Plain damped acoustic stencil on an n^3 grid (reference benchmark
    # config family: benchmarks/user/benchmark.py -P acoustic)
    grid = Grid(shape=shape, extent=tuple(float(s - 1) * 10 for s in shape),
                dtype=np.float32)
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=so)
    vp = Function(name='vp', grid=grid, space_order=so)
    damp = Function(name='damp', grid=grid, space_order=so)
    vp.data[:] = 1.5
    damp.data[:] = 0.0
    m = 1 / (vp * vp)
    stencil = solve(m * u.dt2 - u.laplace + damp * u.dt, u.forward)
    op = Operator(Eq(u.forward, stencil), subs=grid.spacing_map,
                  name='BenchForward')

    dt = 0.6 * 10.0 / 1.5 / (3 ** 0.5) / 4  # safely below CFL

    def sync():
        # force a real device->host fetch: through the remote tunnel,
        # block_until_ready alone does not guarantee execution completed
        return float(np.asarray(u._device_array()[0, n // 2, n // 2, n // 2]))

    tiles = os.environ.get('BENCH_TILES')
    if tiles:
        from devito_tpu.compiler import pallas_backend as pb
        pb.set_tile_override(tuple(int(v) for v in tiles.split(',')))

    # steady-state methodology (reference FAQ.md:826): enough steps that
    # the per-apply dispatch/fetch overhead through the remote-TPU tunnel
    # (~90 ms) is amortized out of the throughput number
    # warmup (jit compile + 2 steps); optional tile autotuning
    at = os.environ.get('BENCH_AUTOTUNE')
    op.apply(time_m=0, time_M=1, dt=dt, autotune=at if at else None)
    sync()
    # timed run
    t0 = time.perf_counter()
    op.apply(time_m=0, time_M=steps - 1, dt=dt)
    sync()
    elapsed = time.perf_counter() - t0

    gpts = np.prod(shape) * steps / elapsed / 1e9

    # bytes/pt for this stencil (u[t] read once amortized, u[t-1], vp, damp
    # reads + u[t+1] write = 5 f32 streams)
    target = 0.8 * roofline_gpts(kind, bytes_per_point=5 * 4)
    timer.cancel()
    print(json.dumps({
        "metric": f"acoustic3d_so{so}_forward_gpts_per_chip",
        "value": round(float(gpts), 3),
        "unit": "GPts/s",
        "vs_baseline": round(float(gpts / target), 3),
    }))


if __name__ == '__main__':
    main()
