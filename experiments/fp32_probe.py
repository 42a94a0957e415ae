"""Per-op device profile of the REAL executor path on the bench operator.

Usage: fp32_probe.py [n] [so] [mode fp32|bf16] [K] [env knobs apply]

Maps where fp32 time goes vs bf16 at the same size (VERDICT r3 item 2:
fp32 is at 0.70/0.61 of target at 256^3/512^3; the staged-copy overhead
and chunked-window materialization are the suspects).
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    so = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mode = sys.argv[3] if len(sys.argv) > 3 else 'fp32'
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import jax
    from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve

    shape = (n, n, n)
    grid = Grid(shape=shape, extent=tuple(float(s - 1) * 10 for s in shape),
                dtype=np.float32)
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=so)
    vp = Function(name='vp', grid=grid, space_order=so)
    damp = Function(name='damp', grid=grid, space_order=so)
    vp.data[:] = 1.5
    damp.data[:] = 0.0
    m = 1 / (vp * vp)
    stencil = solve(m * u.dt2 - u.laplace + damp * u.dt, u.forward)
    opt = 'advanced'
    if mode == 'bf16':
        opt = ('advanced', {'storage-dtype': 'bfloat16'})
    op = Operator(Eq(u.forward, stencil), subs=grid.spacing_map,
                  name='Probe', opt=opt)
    dt = 0.6 * 10.0 / 1.5 / (3 ** 0.5) / 4

    t0 = time.perf_counter()
    op.apply(time_m=0, time_M=1, dt=dt)
    cen = float(np.asarray(
        u._device_array()[0, n // 2, n // 2, n // 2].astype(np.float32)))
    print(f"warmup {time.perf_counter()-t0:.1f}s center={cen}", flush=True)

    import jax.profiler
    tdir = tempfile.mkdtemp(prefix='fp32probe_')
    with jax.profiler.trace(tdir):
        op.apply(time_m=2, time_M=1 + K, dt=dt)
        cen = float(np.asarray(
            u._device_array()[0, n // 2, n // 2, n // 2].astype(np.float32)))

    sys.path.insert(0, '/root/repo')
    from devito_tpu.operator.trace_profile import device_events
    evs = device_events(tdir)
    tot, cnt = {}, {}
    for name, secs, args in evs:
        tot[name] = tot.get(name, 0.0) + secs
        cnt[name] = cnt.get(name, 0) + 1
    tsum = sum(tot.values())
    best = tsum / K
    gpts = n ** 3 / best / 1e9
    print(f"n={n} so={so} {mode}: {best*1e3:.3f} ms/step (device busy), "
          f"{gpts:.2f} GPts/s", flush=True)
    for name, s in sorted(tot.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {s/K*1e3:9.4f} ms/step x{cnt[name]/K:>5.1f}  {name[:110]}")


if __name__ == '__main__':
    main()
