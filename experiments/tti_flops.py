"""Measure whether XLA recovers the TTI cross-equation redundancy that the
reference removes symbolically with CIRE (VERDICT item 8).

The TTI centered kernel computes rotated second derivatives (Gzz and
H = lap - Gzz) of BOTH wavefields p and m, and both updates consume both
rotated operators — the reference's CIRE extracts these into temporaries
(devito/passes/clusters/aliases.py:34). Under XLA the question is whether
the compiler's CSE/fusion already dedupes the repeated trig-weighted
stencil sums inside one fused time step.

Usage:  python experiments/tti_flops.py [n] [steps]
Prints optimized-HLO opcode counts and steady-state ms/step on the
attached device.
"""

import os
import sys
sys.path.insert(0, os.getcwd())
import time
from collections import Counter

import numpy as np


def main(n=128, steps=64):
    import jax
    from devito_tpu.models.seismic.tti import tti_setup

    shape = (n, n)
    solver = tti_setup(shape=shape, spacing=(10.,) * len(shape), tn=250.,
                       space_order=8, nbl=10)
    op = solver.op_fwd()
    print("estimate_flops per step:", op._flops_per_step)

    # one apply to build + jit
    rec, p, m, summary = solver.forward()
    print("norm(rec):", float(np.linalg.norm(np.asarray(rec.data))))

    # optimized HLO of the jitted runner
    wbufs, rbufs, params, tm, tM, bound = op._prepare(
        {'dt': solver.dt, 'time_M': 8})
    import jax.numpy as jnp
    lowered = jax.jit(
        lambda w, r, p_, a, b: op._runner(w, r, p_, a, b)).lower(
        wbufs, rbufs, params, np.int32(0), np.int32(8))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    nsteps_traced = 8
    xla_flops = ca.get('flops', float('nan')) / nsteps_traced
    xla_bytes = ca.get('bytes accessed', float('nan')) / nsteps_traced
    print(f"XLA cost analysis per step: {xla_flops/1e6:.2f} MFLOP, "
          f"{xla_bytes/1e6:.2f} MB accessed")
    print(f"symbolic/XLA flop ratio: "
          f"{op._flops_per_step/xla_flops:.3f} "
          f"(>1 means XLA deduplicated redundant stencil work)")

    # steady-state timing
    t0 = time.perf_counter()
    solver.forward(time_M=steps)
    jax.block_until_ready(0)
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec2, *_ = solver.forward(time_M=steps)
    np.asarray(rec2.data)
    dt_ss = time.perf_counter() - t0
    pts = np.prod(shape) * steps
    print(f"steady-state: {dt_ss*1e3/steps:.3f} ms/step, "
          f"{pts/dt_ss/1e9:.3f} GPts/s  (first {dt_first:.2f}s)")


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(n, steps)
