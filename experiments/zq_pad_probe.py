#!/usr/bin/env python
"""Sublane-padding (y) waste measurement at the canonical TTI z-quarter
(VERDICT r4 item 4): 512 x Y x 222 SO=12 bf16 for Y in {402, 378, 384}.

The z-quarter runs at ~95% HBM (10 GiB executable temps), so each
config runs as ONE cold apply per subprocess; the steady-state step
time comes from wall-clock differencing of a short and a long run
((t_long - t_short) / (n_long - n_short)), which cancels compile and
fetch — the device-trace method needs a warmup apply this shape cannot
afford, and in-trace compiles capture no device timeline through the
axon tunnel.

Usage: python experiments/zq_pad_probe.py [ys...]
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import json, sys, time
import numpy as np
sys.path.insert(0, {here!r})
import jax
from devito_tpu.models.seismic.tti import tti_setup
y, nsteps = int(sys.argv[1]), int(sys.argv[2])
solver = tti_setup(shape=(512, y, 222), spacing=(10.,)*3, tn=100.,
                   space_order=12, nbl=8, nlayers=2,
                   opt=('advanced', {{'storage-dtype': 'bfloat16'}}))
op = solver.op_fwd(save=None)
wbufs, rbufs, params, tm, tM, bound = op._prepare(
    dict(src=solver.geometry.src, rec=solver.geometry.rec,
         dt=solver.dt, time_M=nsteps - 1))
runner = op._runner
local = getattr(runner, 'local_names', frozenset())
wbufs, rbufs = dict(wbufs), dict(rbufs)
for k in list(wbufs):
    if k in local:
        rbufs[k] = wbufs.pop(k)
# compile WITHOUT executing (lower/compile), so the timed window is
# pure execute + one completion fetch — wall-clock differencing across
# step counts then cancels only the fetch, not a 30-45 s +/- 8 s
# remote compile
jitted = jax.jit(lambda wb, rb, ps, a, b: runner(wb, rb, ps, a, b),
                 donate_argnums=(0,))
compiled = jitted.lower(wbufs, rbufs, params, np.int32(tm),
                        np.int32(tM)).compile()
t0 = time.perf_counter()
out = compiled(wbufs, rbufs, params, np.int32(tm), np.int32(tM))
leaf = out['u']
while isinstance(leaf, (tuple, list)):
    leaf = leaf[0]
val = float(np.asarray(leaf[(0,) * leaf.ndim]).real)
dt = time.perf_counter() - t0
print(json.dumps({{'y': y, 'nsteps': nsteps, 'wall': dt,
                   'finite': bool(np.isfinite(val))}}))
'''


def run_child(y, nsteps):
    code = CHILD.format(here=HERE)
    r = subprocess.run([sys.executable, '-c', code, str(y), str(nsteps)],
                       capture_output=True, text=True, timeout=1200)
    for line in r.stdout.splitlines():
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError(f"child y={y} n={nsteps} failed: "
                       f"{r.stderr[-500:]}")


def main():
    ys = [int(a) for a in sys.argv[1:]] or [402, 384, 378]
    n1, n2 = 8, 88
    for y in ys:
        a = run_child(y, n1)
        b = run_child(y, n2)
        ms = (b['wall'] - a['wall']) / (n2 - n1) * 1e3
        pts = 512 * y * 222
        print(f"y={y}: {ms:.2f} ms/step, {pts/ms/1e6:.3f} GPts/s, "
              f"{ms/pts*1e9:.3f} ns/pt  (walls {a['wall']:.1f}/"
              f"{b['wall']:.1f}s, finite={a['finite'] and b['finite']})",
              flush=True)


if __name__ == '__main__':
    main()
