"""Per-op device profile of the bench stencil at a given n/so."""
import os, sys, tempfile, time
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
so = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cfg = sys.argv[3] if len(sys.argv) > 3 else 'bf16'
K = int(os.environ.get('K', 16))

import jax
from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve

shape = (n, n, n)
grid = Grid(shape=shape, extent=tuple(float(s - 1) * 10 for s in shape), dtype=np.float32)
u = TimeFunction(name='u', grid=grid, time_order=2, space_order=so)
vp = Function(name='vp', grid=grid, space_order=so)
damp = Function(name='damp', grid=grid, space_order=so)
vp.data[:] = 1.5
damp.data[:] = 0.0
m = 1 / (vp * vp)
stencil = solve(m * u.dt2 - u.laplace + damp * u.dt, u.forward)
opt = ('advanced', {'storage-dtype': 'bfloat16'}) if cfg == 'bf16' else 'advanced'
op = Operator(Eq(u.forward, stencil), subs=grid.spacing_map, name='BenchForward', opt=opt)
dt = 0.6 * 10.0 / 1.5 / (3 ** 0.5) / 4

t0 = time.perf_counter()
op.apply(time_m=0, time_M=1, dt=dt)
print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

import jax.profiler
tdir = tempfile.mkdtemp(prefix='prof512_')
with jax.profiler.trace(tdir):
    op.apply(time_m=0, time_M=K - 1, dt=dt)
    _ = float(np.asarray(u._device_array()[0, n // 2, n // 2, n // 2]))

from devito_tpu.operator.trace_profile import device_events
evs = device_events(tdir)
tot = {}
cnt = {}
for name, secs, args in evs:
    tot[name] = tot.get(name, 0.0) + secs
    cnt[name] = cnt.get(name, 0) + 1
tsum = sum(tot.values())
print(f"K={K} total device busy {tsum*1e3:.1f} ms -> {tsum/K*1e3:.3f} ms/step")
for name, s in sorted(tot.items(), key=lambda kv: -kv[1])[:18]:
    print(f"  {s/K*1e3:9.4f} ms/step x{cnt[name]//K:>3}  {name[:110]}")
