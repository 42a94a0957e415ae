"""Measured per-section profile of any seismic solver on the chip.

Usage: python experiments/solver_sections.py [problem] [n] [so] [steps] [bf16]
Problems: acoustic | tti | elastic | viscoacoustic | viscoelastic
"""

import sys
import tempfile
import time


def main():
    problem = sys.argv[1] if len(sys.argv) > 1 else 'elastic'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    so = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    nsteps = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from devito_tpu import configuration
    configuration['profiling'] = 'measured'
    configuration['profile-dir'] = tempfile.mkdtemp(prefix='solver_sec_')

    opt = 'advanced'
    if len(sys.argv) > 5 and sys.argv[5] == 'bf16':
        opt = ('advanced', {'storage-dtype': 'bfloat16'})
    elif len(sys.argv) > 5 and sys.argv[5] == 'bf16all':
        opt = ('advanced', {'storage-dtype': 'bfloat16',
                            'storage-dtype-scope': 'all'})

    from devito_tpu.models.seismic import (acoustic_setup, tti_setup,
                                           elastic_setup,
                                           viscoacoustic_setup)
    from devito_tpu.models.seismic.viscoelastic import viscoelastic_setup
    setups = {'acoustic': acoustic_setup, 'tti': tti_setup,
              'elastic': elastic_setup, 'viscoacoustic': viscoacoustic_setup,
              'viscoelastic': viscoelastic_setup}
    kw = dict(shape=(n,) * 3, spacing=(10.,) * 3, tn=500., space_order=so,
              nbl=8, opt=opt)
    if problem != 'acoustic':
        kw['nlayers'] = 2
    solver = setups[problem](**kw)

    t0 = time.perf_counter()
    solver.forward(time_M=1)
    print(f"warmup {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    out = solver.forward(time_M=nsteps - 1)
    summary = out[-1]
    wall = time.perf_counter() - t0
    print(f"{nsteps} steps wall {wall:.3f}s "
          f"({wall / nsteps * 1e3:.2f} ms/step)", flush=True)
    labels = getattr(summary, 'labels', {})
    for k, e in sorted(summary.items(), key=lambda kv: -kv[1].time):
        print(f"  {k:12s} {labels.get(k, ''):34s} {e.time * 1e3:9.2f} ms "
              f"({e.time / nsteps * 1e3:7.3f} ms/step)")

    tdir = configuration['profile-dir']
    from devito_tpu.operator.trace_profile import device_events
    evs = device_events(tdir)
    if evs:
        agg = {}
        for name, secs, args in evs:
            key = (name.split('.')[0], str(args.get('tf_op', ''))[:48])
            c, tot = agg.get(key, (0, 0.0))
            agg[key] = (c + 1, tot + secs)
        print("top device ops:")
        for (base, tf), (c, tot) in sorted(
                agg.items(), key=lambda kv: -kv[1][1])[:24]:
            print(f"  {tot * 1e3:9.2f} ms  x{c:5d}  {base:28s} {tf}")


if __name__ == '__main__':
    main()
