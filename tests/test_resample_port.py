"""Source-wavelet resampling (port of the reference's
tests/test_resample.py; implementation devito_tpu/models/seismic/
source.py PointSource.resample)."""

import numpy as np

from devito_tpu.models.seismic import RickerSource, TimeAxis, demo_model


def test_resample():
    shape = (50, 50)
    spacing = (10., 10.)

    f0 = 0.01
    t0 = 0.0
    tn = 500

    model = demo_model(preset='layers-isotropic', vp_top=1., vp_bottom=2.,
                       spacing=spacing, shape=shape, nbl=10)

    time_range = TimeAxis(start=t0, stop=tn, step=model.critical_dt)
    src_a = RickerSource(name='src_a', grid=model.grid, f0=f0,
                         time_range=time_range)

    time_range_f = TimeAxis(start=t0, step=time_range.step / (10 * np.sqrt(2)),
                            stop=time_range.stop)
    src_b = RickerSource(name='src_b', grid=model.grid, f0=f0,
                         time_range=time_range_f)

    # resample specifying dt
    src_c = src_b.resample(dt=src_a.time_range.step)
    end = min(np.asarray(src_a.data).shape[0], np.asarray(src_c.data).shape[0])
    # atol: fp32 spline evaluation wiggles ~1e-7 where the wavelet is
    # exactly zero; amplitudes are O(1)
    assert np.allclose(np.asarray(src_a.data)[:end],
                       np.asarray(src_c.data)[:end], atol=1e-6)

    # resample based on num
    src_d = RickerSource(name='src_d', grid=model.grid, f0=f0,
                         time_range=TimeAxis(start=time_range_f.start,
                                             stop=time_range_f.stop,
                                             num=src_a.time_range.num))
    src_e = src_b.resample(num=src_d.time_range.num)

    assert np.isclose(src_d.time_range.step, src_e.time_range.step)
    assert np.isclose(src_d.time_range.stop, src_e.time_range.stop)
    assert src_d.time_range.num == src_e.time_range.num
    assert np.allclose(np.asarray(src_d.data), np.asarray(src_e.data),
                       atol=1e-6)
