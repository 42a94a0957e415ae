"""Dump the optimized TPU HLO of the bench stencil at a given n/so."""
import os, sys
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
so = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cfg = sys.argv[3] if len(sys.argv) > 3 else 'bf16'

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

# warm up so the compiled executable exists in the op's jit cache
op.apply(time_m=0, time_M=1, dt=dt)

# pull the optimized HLO off the cached compiled executable
texts = []
for key, comp in getattr(op, '_jit_cache', {}).items():
    try:
        texts.append(comp.as_text())
    except Exception as e:
        print('as_text failed:', e)

out = f"/tmp/hlo_{n}_{so}_{cfg}.txt"
with open(out, 'w') as f:
    f.write("\n\n==== MODULE ====\n\n".join(texts))
print(f"wrote {out} ({len(texts)} modules, {sum(len(t) for t in texts)} chars)")
