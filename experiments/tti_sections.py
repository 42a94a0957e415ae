"""Where does the TTI step actually spend time on the chip?

Round-1 VERDICT item 3: TTI 192^3 so8 runs ~20.8 ms/step against a ~3 ms
traffic bound — find the dominant cost with the measured profiler
(profiling='measured': per-section device busy time from the trace
timeline + op-category breakdown) instead of guessing from the cost
model.

Usage (on the TPU chip):
    python experiments/tti_sections.py [n] [so] [steps] [bf16]
"""

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    so = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import tempfile
    from devito_tpu import configuration
    configuration['profiling'] = 'measured'
    configuration['profile-dir'] = tempfile.mkdtemp(prefix='tti_sections_')
    from devito_tpu.models.seismic.tti import tti_setup

    shape = (n,) * 3
    opt = 'advanced'
    if len(sys.argv) > 4 and sys.argv[4] == 'bf16':
        opt = ('advanced', {'storage-dtype': 'bfloat16'})
    solver = tti_setup(shape=shape, spacing=(10.,) * 3, tn=100.,
                       space_order=so, nbl=8, nlayers=2, opt=opt)
    op = solver.op_fwd(save=None)
    t0 = time.perf_counter()
    solver.forward(time_M=1)
    print(f"warmup {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    _, _, _, summary = solver.forward(time_M=nsteps - 1)
    wall = time.perf_counter() - t0
    print(f"{nsteps} steps wall {wall:.3f}s", flush=True)
    labels = getattr(summary, 'labels', {})
    for k, e in sorted(summary.items(), key=lambda kv: -kv[1].time):
        print(f"  {k:12s} {labels.get(k, ''):34s} {e.time * 1e3:9.2f} ms "
              f"({e.time / nsteps * 1e3:7.3f} ms/step)")
    cats = getattr(op, '_measured_cats', None)
    if cats:
        print("op categories (device busy):")
        for c, v in sorted(cats.items(), key=lambda kv: -kv[1]):
            if v > 0:
                print(f"  {c:28s} {v * 1e3:9.2f} ms "
                      f"({v / nsteps * 1e3:7.3f} ms/step)")
    tdir = configuration['profile-dir']
    if tdir:
        from devito_tpu.operator.trace_profile import device_events
        evs = device_events(tdir)
        if evs:
            agg = {}
            for name, secs, args in evs:
                key = (name.split('.')[0],
                       str(args.get('tf_op', ''))[:48])
                n, tot = agg.get(key, (0, 0.0))
                agg[key] = (n + 1, tot + secs)
            print("top device ops:")
            for (base, tf), (n, tot) in sorted(
                    agg.items(), key=lambda kv: -kv[1][1])[:24]:
                print(f"  {tot * 1e3:9.2f} ms  x{n:5d}  {base:28s} {tf}")


if __name__ == '__main__':
    main()
