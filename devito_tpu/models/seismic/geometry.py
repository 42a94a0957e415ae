"""AcquisitionGeometry.

Reference parity: examples/seismic/utils.py:56 (AcquisitionGeometry —
source/receiver positions, time axis from model.critical_dt, src/rec
factories).
"""

import numpy as np

from .source import TimeAxis, PointSource, Receiver, RickerSource, GaborSource

__all__ = ['AcquisitionGeometry', 'sources']

sources = {'Ricker': RickerSource, 'Gabor': GaborSource}


class AcquisitionGeometry:

    def __init__(self, model, rec_positions, src_positions, t0, tn,
                 f0=None, src_type=None, a=None, t0w=None,
                 interpolation='linear', r=2, **kwargs):
        self.rec_positions = np.reshape(rec_positions, (-1, model.dim))
        self._nrec = self.rec_positions.shape[0]
        self.src_positions = np.reshape(src_positions, (-1, model.dim))
        self._nsrc = self.src_positions.shape[0]
        self._src_type = src_type
        self._f0 = f0
        self._a = a
        self._t0w = t0w
        self._grid = model.grid
        self._model = model
        self._dt = model.critical_dt
        self._t0 = float(t0)
        self._tn = float(tn)
        self._interpolation = interpolation
        self._r = r

    @property
    def grid(self):
        return self._grid

    @property
    def f0(self):
        return self._f0

    @property
    def t0(self):
        return self._t0

    @property
    def tn(self):
        return self._tn

    @property
    def dt(self):
        return self._dt

    def resample(self, dt):
        self._dt = dt
        return self

    @property
    def time_axis(self):
        return TimeAxis(start=self._t0, stop=self._tn, step=self._dt)

    @property
    def nt(self):
        return self.time_axis.num

    @property
    def nrec(self):
        return self._nrec

    @property
    def nsrc(self):
        return self._nsrc

    @property
    def interpolation(self):
        return self._interpolation

    @property
    def r(self):
        return self._r

    @property
    def src_type(self):
        return self._src_type

    def new_rec(self, name='rec', coordinates=None):
        coords = coordinates if coordinates is not None else \
            self.rec_positions
        return Receiver(name=name, grid=self.grid,
                        time_range=self.time_axis, npoint=len(coords),
                        coordinates=coords,
                        interpolation=self._interpolation, r=self._r)

    @property
    def rec(self):
        return self.new_rec()

    def new_src(self, name='src', src_type='self', coordinates=None):
        coords = coordinates if coordinates is not None else \
            self.src_positions
        if self._src_type is None or src_type is None:
            return PointSource(name=name, grid=self.grid,
                               time_range=self.time_axis,
                               npoint=len(coords), coordinates=coords,
                               interpolation=self._interpolation, r=self._r)
        cls = sources[self._src_type]
        return cls(name=name, grid=self.grid, f0=self._f0, a=self._a,
                   t0=self._t0w, time_range=self.time_axis,
                   npoint=len(coords), coordinates=coords,
                   interpolation=self._interpolation, r=self._r)

    @property
    def src(self):
        return self.new_src()
