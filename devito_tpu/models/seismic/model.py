"""SeismicModel: physical model container with absorbing boundaries.

Reference parity: examples/seismic/model.py (GenericModel:99,
SeismicModel:240 — padded grid (+2*nbl), damp field via initialize_damp:25,
PhysicalDomain/FSDomain subdomains:66-97, critical_dt CFL:370, m = 1/vp^2).
Damping profile and CFL coefficients match the reference formulas.
"""

import numpy as np
import sympy

from ...types import Grid, Function, SubDomain, Constant
from ...builtins import initialize_function, gaussian_smooth, mmax, mmin
from ...finite_differences.tools import fd_weights
from ...utils import as_tuple

__all__ = ['SeismicModel', 'Model', 'PhysicalDomain', 'FSDomain',
           'initialize_damp', 'demo_model']


def initialize_damp(damp, padsizes, spacing, abc_type="damp", fs=False):
    """Fill the damping field: Sochacki-style smooth ramp in the absorbing
    layer (reference formula: dampcoeff*(pos - sin(2 pi pos)/(2 pi)) / h).

    abc_type 'damp': 0 in the interior, growing outward.
    abc_type 'mask': 1 in the interior, decaying outward (multiplicative).
    """
    data = damp.data
    data[:] = 1.0 if abc_type == "mask" else 0.0
    ndim = data.ndim
    for j, ((nbl, nbr), h) in enumerate(zip(padsizes, spacing)):
        n = data.shape[j]
        if nbl > 0 and (not fs or j != ndim - 1):
            dampcoeff = 1.5 * np.log(1.0 / 0.001) / nbl
            i = np.arange(nbl)
            pos = np.abs((nbl - i + 1) / float(nbl))
            val = dampcoeff * (pos - np.sin(2 * np.pi * pos) / (2 * np.pi))
            if abc_type == "mask":
                val = -val
            shape = [1] * ndim
            shape[j] = nbl
            sl = [slice(None)] * ndim
            sl[j] = slice(0, nbl)
            data[tuple(sl)] += (val / h).reshape(shape)
        if nbr > 0:
            dampcoeff = 1.5 * np.log(1.0 / 0.001) / nbr
            i = np.arange(nbr)
            pos = np.abs((nbr - i + 1) / float(nbr))
            val = dampcoeff * (pos - np.sin(2 * np.pi * pos) / (2 * np.pi))
            if abc_type == "mask":
                val = -val
            shape = [1] * ndim
            shape[j] = nbr
            sl = [slice(None)] * ndim
            sl[j] = slice(n - nbr, n)
            data[tuple(sl)] += (val[::-1] / h).reshape(shape)


class PhysicalDomain(SubDomain):
    name = 'physdomain'

    def __init__(self, so, fs=False):
        self.so = so
        self.fs = fs
        super().__init__()

    def define(self, dimensions):
        map_d = {d: d for d in dimensions}
        if self.fs:
            map_d[dimensions[-1]] = ('middle', self.so, 0)
        return map_d


class FSDomain(SubDomain):
    name = 'fsdomain'

    def __init__(self, so):
        self.size = so
        super().__init__()

    def define(self, dimensions):
        return {d: (d if d is not dimensions[-1] else ('left', self.size))
                for d in dimensions}


class SeismicModel:
    """Velocity/physical-parameter container.

    ``SeismicModel(origin, spacing, shape, space_order, vp, nbl=20, ...)`` —
    the inner grid is padded by ``nbl`` absorbing-boundary points per side
    (reference: shape_pml = shape + 2*nbl).
    """

    _known_parameters = ('vp', 'vs', 'b', 'qp', 'qs', 'lam', 'mu',
                         'epsilon', 'delta', 'theta', 'phi')

    def __init__(self, origin, spacing, shape, space_order, vp=None, nbl=20,
                 fs=False, dtype=np.float32, subdomains=(), bcs="damp",
                 grid=None, topology=None, dt=None, **kwargs):
        self.nbl = int(nbl)
        self.fs = fs
        self.space_order = space_order
        self.origin = tuple(dtype(o) for o in origin)
        self.shape = tuple(shape)
        self.spacing = tuple(dtype(s) for s in spacing)
        self._dt = dt
        self._dt_scale = 1

        origin_pml = tuple(dtype(o - s * nbl)
                           for o, s in zip(origin, spacing))
        shape_pml = tuple(int(s) + 2 * self.nbl for s in shape)
        if fs:
            shape_pml = shape_pml[:-1] + (shape_pml[-1] - self.nbl,)
            origin_pml = origin_pml[:-1] + (dtype(origin[-1]),)
        extent = tuple(dtype(s * (d - 1)) for s, d in zip(spacing, shape_pml))

        subdomains = tuple(subdomains) + (PhysicalDomain(space_order, fs=fs),)
        if fs:
            subdomains += (FSDomain(space_order),)
        if grid is None:
            grid = Grid(shape=shape_pml, extent=extent, origin=origin_pml,
                        dtype=dtype, subdomains=subdomains,
                        topology=topology)
        self.grid = grid

        self._physical_parameters = []
        self._initialize_bcs(bcs=bcs)
        self._initialize_physics(vp, space_order, **kwargs)

    # -- boundary conditions ----------------------------------------------

    def _initialize_bcs(self, bcs="damp"):
        if self.nbl == 0:
            self.damp = 1 if bcs == "mask" else 0
            return
        init = getattr(self, '_bcs_type', None)
        if init == bcs:
            return
        if not hasattr(self, 'damp') or not isinstance(self.damp, Function):
            self.damp = Function(name="damp", grid=self.grid,
                                 space_order=self.space_order)
        padsizes = [(self.nbl, self.nbl) for _ in range(self.dim - 1)]
        padsizes.append((0 if self.fs else self.nbl, self.nbl))
        initialize_damp(self.damp, padsizes, self.spacing, abc_type=bcs,
                        fs=self.fs)
        self._bcs_type = bcs

    # -- physics -----------------------------------------------------------

    def _initialize_physics(self, vp, space_order, **kwargs):
        b = kwargs.get('b', 1)
        if 'vs' in kwargs:
            vs = kwargs.pop('vs')
            self.lam = self._gen_phys_param(
                (np.asarray(vp) ** 2 - 2. * np.asarray(vs) ** 2) / b,
                'lam', space_order)
            # mu is harmonically averaged at staggered locations
            # (reference: model.py _initialize_physics avg_mode='safe_harmonic')
            self.mu = self._gen_phys_param(np.asarray(vs) ** 2 / b, 'mu',
                                           space_order,
                                           avg_mode='safe_harmonic')
            self._physical_parameters += ['lam', 'mu']
        elif vp is not None:
            self.vp = self._gen_phys_param(vp, 'vp', space_order)
            self._physical_parameters.append('vp')
        for name in self._known_parameters:
            if kwargs.get(name) is not None:
                setattr(self, name,
                        self._gen_phys_param(kwargs[name], name, space_order))
                self._physical_parameters.append(name)

    def _gen_phys_param(self, field, name, space_order, **kwargs):
        if field is None:
            return None
        if np.isscalar(field):
            return Constant(name=name, value=field, dtype=self.grid.dtype)
        fn = Function(name=name, grid=self.grid, space_order=space_order,
                      parameter=True, **kwargs)
        pad = [(self.nbl, self.nbl)] * self.dim
        if self.fs:
            pad[-1] = (0, self.nbl)
        initialize_function(fn, np.asarray(field), tuple(pad))
        return fn

    def physical_params(self, **kwargs):
        """{name: Function/Constant} for all physical parameters (reference:
        physical_params — merged into op.apply kwargs)."""
        params = {p: kwargs.get(p, getattr(self, p))
                  for p in self._physical_parameters}
        return {k: v for k, v in params.items() if v is not None}

    def update(self, name, value):
        try:
            param = getattr(self, name)
        except AttributeError:
            setattr(self, name,
                    self._gen_phys_param(value, name, self.space_order))
            return
        if isinstance(value, np.ndarray):
            if value.shape == param.data.shape:
                param.data[:] = value
            elif value.shape == self.shape:
                pad = [(self.nbl, self.nbl)] * self.dim
                if self.fs:
                    pad[-1] = (0, self.nbl)
                initialize_function(param, value, tuple(pad))
            else:
                raise ValueError(f"Incorrect input size {value.shape}")
        else:
            param.data = value

    def smooth(self, physical_parameters, sigma=5.0):
        for name in as_tuple(physical_parameters):
            gaussian_smooth(getattr(self, name), sigma=sigma)

    # -- derived quantities -------------------------------------------------

    @property
    def dim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return self.grid.dtype

    @property
    def domain_size(self):
        return tuple((d - 1) * s for d, s in zip(self.shape, self.spacing))

    @property
    def space_dimensions(self):
        return self.grid.dimensions

    @property
    def spacing_map(self):
        return self.grid.spacing_map

    @property
    def m(self):
        """Squared slowness 1/vp^2 (expression)."""
        return 1 / (self.vp * self.vp)

    @property
    def _max_vp(self):
        if 'vp' in self._physical_parameters:
            return mmax(self.vp) if isinstance(self.vp, Function) \
                else float(self.vp.value)
        return np.sqrt(mmin(self.b) * (mmax(self.lam) + 2 * mmax(self.mu)))

    @property
    def _thomsen_scale(self):
        if 'epsilon' in self._physical_parameters:
            eps = self.epsilon
            m = mmax(eps) if isinstance(eps, Function) else float(eps.value)
            return np.sqrt(1 + 2 * m)
        return 1

    @property
    def dt_scale(self):
        return self._dt_scale

    @dt_scale.setter
    def dt_scale(self, val):
        self._dt_scale = val

    @property
    def _cfl_coeff(self):
        """CFL coefficient (reference formulas: elastic per Virieux, acoustic
        per the 2nd-order-in-time bound with the full-width stencil)."""
        if 'lam' in self._physical_parameters or \
                'mu' in self._physical_parameters:
            so = self.space_order
            coeffs = fd_weights(1, [sympy.Rational(i)
                                    for i in range(-so // 2 + 1,
                                                   so // 2 + 1)],
                                sympy.Rational(1, 2))
            c_fd = sum(abs(float(w)) for w in coeffs) / 2
            return .95 * np.sqrt(self.dim) / self.dim / c_fd
        a1 = 4
        so = self.space_order
        coeffs = fd_weights(2, list(range(-so, so + 1)), 0)
        return np.sqrt(a1 / (self.dim * sum(abs(float(w)) for w in coeffs)))

    @property
    def critical_dt(self):
        dt = self._cfl_coeff * np.min(self.spacing) / (
            self._thomsen_scale * self._max_vp)
        dt = self.dtype.type(f"{self._dt_scale * dt:.3e}")
        if self._dt:
            return self._dt
        return dt


Model = SeismicModel


def demo_model(preset, shape=(51, 51), spacing=(10., 10.), origin=None,
               nbl=10, space_order=2, vp=1.5, vp_top=1.5, vp_bottom=3.5,
               nlayers=3, dtype=np.float32, **kwargs):
    """Preset models (reference: preset_models.py — constant, n-layer
    isotropic, and camembert subset)."""
    origin = origin or tuple(0. for _ in shape)
    if preset in ('constant-isotropic', 'constant'):
        v = np.full(shape, vp, dtype=dtype)
    elif preset in ('layers-isotropic', 'layers'):
        # n evenly-split layers, velocities linspace(vp_top, vp_bottom)
        # (reference preset_models.py:120-134)
        v = np.full(shape, vp_top, dtype=dtype)
        vp_i = np.linspace(vp_top, vp_bottom, nlayers)
        for i in range(1, nlayers):
            v[..., i * int(shape[-1] / nlayers):] = vp_i[i]
    elif preset in ('circle-isotropic',):
        # camembert model (reference: preset_models.py circle-isotropic)
        vp_circle = kwargs.pop('vp_circle', 3.0)
        vp_background = kwargs.pop('vp_background', 2.5)
        r = kwargs.pop('r', 15)
        v = np.full(shape, vp_background, dtype=dtype)
        a, b = shape[0] / 2, shape[1] / 2
        y, x = np.ogrid[-a:shape[0] - a, -b:shape[1] - b]
        v[x * x + y * y <= r * r] = vp_circle
    else:
        raise ValueError(f"Unknown preset {preset}")
    return SeismicModel(origin=origin, spacing=spacing, shape=shape,
                        space_order=space_order, vp=v, nbl=nbl,
                        dtype=dtype, bcs="damp", **kwargs)
