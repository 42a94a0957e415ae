"""Seismic acquisition primitives: TimeAxis, sources, receivers.

Reference parity: examples/seismic/source.py (TimeAxis:25, PointSource:90,
RickerSource:260, GaborSource:292) — same wavelet formulas and TimeAxis
resolution rules.
"""

import numpy as np

from ...types.sparse import SparseTimeFunction

__all__ = ['TimeAxis', 'PointSource', 'Receiver', 'WaveletSource',
           'RickerSource', 'GaborSource', 'DGaussSource']


class TimeAxis:
    """Time axis from any three of (start, step, num, stop); see reference
    docstring for the remainder rules."""

    def __init__(self, start=None, step=None, num=None, stop=None):
        if start is None:
            start = step * (1 - num) + stop
        elif step is None:
            step = (stop - start) / (num - 1)
        elif num is None:
            num = int(np.ceil((stop - start + step) / step))
            stop = step * (num - 1) + start
        elif stop is None:
            stop = step * (num - 1) + start
        else:
            raise ValueError(
                "Only three of start, step, num and stop may be set")
        self.start = float(start)
        self.stop = float(stop)
        self.step = float(step)
        self.num = int(num)

    @property
    def time_values(self):
        return np.linspace(self.start, self.stop, self.num)

    @property
    def dt(self):
        return self.step

    def __str__(self):
        return (f"TimeAxis: start={self.start:g}, stop={self.stop:g}, "
                f"step={self.step:g}, num={self.num:g}")

    __repr__ = __str__


class PointSource(SparseTimeFunction):
    """A set of sparse points carrying a time series (source or receiver)."""

    @classmethod
    def __init_metadata__(cls, time_range=None, data=None, f0=None, a=None,
                          t0=None, t0w=None, **kwargs):
        cls._time_range = time_range
        cls._f0 = f0
        cls._a = a
        cls._t0w = t0w if t0w is not None else t0
        cls._init_data = data
        kwargs.setdefault('nt', time_range.num if time_range else None)
        if kwargs.get('npoint') is None and \
                kwargs.get('coordinates') is None:
            # reference default: a wavelet source is a single point until
            # given coordinates (examples/seismic/source.py npoint=1)
            kwargs['npoint'] = 1
        super().__init_metadata__(**kwargs)
        # keep acquisition metadata reconstructible (pickling)
        cls._constructor_kwargs.update(time_range=time_range, f0=f0, a=a,
                                       t0=cls._t0w)

    def __init_finalize__(self):
        cls = type(self)
        if cls._init_data is not None:
            self.data[:] = np.asarray(cls._init_data)
        else:
            w = self.wavelet
            if w is not None:
                self.data[:] = w[:, None]

    @property
    def time_range(self):
        return type(self)._time_range

    @property
    def time_values(self):
        return type(self)._time_range.time_values

    @property
    def f0(self):
        return type(self)._f0

    @property
    def a(self):
        return type(self)._a

    @property
    def t0(self):
        return type(self)._t0w

    @property
    def wavelet(self):
        return None

    def resample(self, dt=None, num=None):
        """Return a copy of this source resampled to a new dt or to a
        fixed number of samples (cubic-spline interpolation like the
        reference — examples/seismic/source.py resample order=3 — with
        a linear fallback when scipy is unavailable)."""
        old = self.time_values
        if num is not None:
            new_axis = TimeAxis(start=old[0], stop=old[-1], num=num)
        else:
            new_axis = TimeAxis(start=old[0], stop=old[-1], step=dt)
        try:
            from scipy.interpolate import InterpolatedUnivariateSpline
            def interp(col):
                return InterpolatedUnivariateSpline(
                    old, col, k=3)(new_axis.time_values)
        except ImportError:
            def interp(col):
                return np.interp(new_axis.time_values, old, col)
        newdata = np.stack([interp(np.asarray(self.data)[:, i])
                            for i in range(self.npoint)], axis=1)
        return type(self).__bases__[0](
            name=f"{self.name}r", grid=self.grid,
            time_range=new_axis, npoint=self.npoint,
            coordinates=self.coordinates.data.copy(), data=newdata)


Receiver = PointSource


class WaveletSource(PointSource):
    pass


class RickerSource(WaveletSource):
    """Ricker wavelet: a*(1-2 r^2) exp(-r^2), r = pi f0 (t - t0)."""

    @property
    def wavelet(self):
        f0 = self.f0
        t0 = self.t0 or 1 / f0
        a = self.a or 1
        r = np.pi * f0 * (self.time_values - t0)
        return a * (1 - 2. * r ** 2) * np.exp(-r ** 2)


class GaborSource(WaveletSource):
    """Gabor wavelet (reference formula)."""

    @property
    def wavelet(self):
        agauss = 0.5 * self.f0
        tcut = self.t0 or 1.5 / agauss
        s = (self.time_values - tcut) * agauss
        a = self.a or 1
        return a * np.exp(-2 * s ** 2) * np.cos(2 * np.pi * s)


class DGaussSource(WaveletSource):
    """First derivative of a Gaussian."""

    @property
    def wavelet(self):
        # reference formula (source.py DGaussSource.wavelet): width set by
        # ``a`` directly, not by f0
        t0 = self.t0 or 1 / self.f0
        a = self.a or 1
        time = self.time_values - t0
        return -2 * a * time * np.exp(-a * time ** 2)
