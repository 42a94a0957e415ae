"""TTI (tilted transverse isotropy) anisotropic propagator, centered kernel.

Reference parity: examples/seismic/tti/operators.py (trig_func:42,
Gzz_centered:65, Gzz_centered_2d, Gh_centered, kernel_centered:170,
Forward/Adjoint operators:415-515) and wavesolver.py AnisotropicWaveSolver.
Same rotated-Laplacian construction (Zhang et al. 2011 self-adjoint form):
first derivatives at +h/2, composed back at -h/2.
"""

import numpy as np
import sympy
from sympy import Rational

from ...finite_differences.elementary import cos, sin, sqrt

from ...types import Eq, TimeFunction
from ...operator import Operator
from ...operations.solve import solve
from ...finite_differences.derivative import Derivative
from ...utils import memoized_meth

__all__ = ['kernel_centered', 'TTIForwardOperator', 'TTIAdjointOperator',
           'AnisotropicWaveSolver', 'tti_setup']


def trig_func(model):
    theta = getattr(model, 'theta', 0)
    costheta, sintheta = cos(theta), sin(theta)
    if model.dim == 3:
        phi = getattr(model, 'phi', 0)
        return costheta, sintheta, cos(phi), sin(phi)
    return costheta, sintheta


def _half(b, d, sign=+1):
    """Sample a (node) parameter at d +/- h/2 via 2-point interpolation
    (reference: `_subs(b, x, x+dx)` + off-grid evaluation)."""
    if not hasattr(b, 'is_DiscreteFunction') or not b.is_DiscreteFunction:
        return b
    return Derivative(b, (d, 0), fd_order=2,
                      x0={d: Rational(sign, 2)})


def Gzz_centered_2d(model, field):
    b = getattr(model, 'b', 1)
    costheta, sintheta = trig_func(model)
    order1 = field.space_order // 2
    x, y = field.grid.dimensions
    dx, dy = x.spacing / 2, y.spacing / 2

    Gz = (_half(b, x) * sintheta * field.dx(fd_order=order1, x0=x + dx) +
          _half(b, y) * costheta * field.dy(fd_order=order1, x0=y + dy))
    Gzz = (Gz * costheta).dy(fd_order=order1, x0=y - dy)
    if sintheta != 0:
        Gzz += (Gz * sintheta).dx(fd_order=order1, x0=x - dx)
    return Gzz


def Gzz_centered(model, field):
    b = getattr(model, 'b', 1)
    costheta, sintheta, cosphi, sinphi = trig_func(model)
    order1 = field.space_order // 2
    x, y, z = field.grid.dimensions
    dx, dy, dz = x.spacing / 2, y.spacing / 2, z.spacing / 2

    Gz = (_half(b, x) * sintheta * cosphi *
          field.dx(fd_order=order1, x0=x + dx) +
          _half(b, y) * sintheta * sinphi *
          field.dy(fd_order=order1, x0=y + dy) +
          _half(b, z) * costheta * field.dz(fd_order=order1, x0=z + dz))
    Gzz = (Gz * costheta).dz(fd_order=order1, x0=z - dz)
    if sintheta != 0:
        Gzz += (Gz * sintheta * cosphi).dx(fd_order=order1, x0=x - dx)
    if sinphi != 0:
        Gzz += (Gz * sintheta * sinphi).dy(fd_order=order1, x0=y - dy)
    return Gzz


def Gh_centered(model, field):
    """Gxx+Gyy = (rotation-invariant) laplacian - Gzz."""
    Gzz = Gzz_centered(model, field) if model.dim == 3 else \
        Gzz_centered_2d(model, field)
    b = getattr(model, 'b', None)
    if b is not None and getattr(b, 'is_DiscreteFunction', False):
        # density-weighted rotation-invariant laplacian:
        # sum_d D_{-h/2}( b(+h/2) * D_{+h/2} field )
        so = field.space_order // 2
        lap = 0
        for d in model.space_dimensions:
            inner = _half(b, d) * Derivative(field, d, fd_order=so,
                                             x0={d: Rational(1, 2)})
            lap += Derivative(inner, d, fd_order=so,
                              x0={d: Rational(-1, 2)})
    else:
        lap = field.laplace
    return lap - Gzz


def second_order_stencil(model, u, v, H0, Hz, qu=0, qv=0, forward=True):
    """m u.dt2 = H0 - damp u.dt ; m v.dt2 = Hz - damp v.dt (reference:
    tti/operators.py:12)."""
    m, damp = model.m, model.damp
    unext = u.forward if forward else u.backward
    vnext = v.forward if forward else v.backward
    udt = u.dt if forward else u.dt.T
    vdt = v.dt if forward else v.dt.T

    stencilp = solve(m * u.dt2 - H0 - qu + damp * udt, unext)
    stencilr = solve(m * v.dt2 - Hz - qv + damp * vdt, vnext)
    phys = model.grid.subdomains['physdomain']
    return [Eq(unext, stencilp, subdomain=phys),
            Eq(vnext, stencilr, subdomain=phys)]


def kernel_centered(model, u, v, forward=True, qu=0, qv=0):
    """Reference: kernel_centered (tti/operators.py:170)."""
    delta, epsilon = model.delta, model.epsilon
    epsilon = 1 + 2 * epsilon
    delta = sqrt(1 + 2 * delta)
    Gzz = Gzz_centered_2d if model.dim == 2 else Gzz_centered

    if forward:
        Gxx = Gh_centered(model, u)
        Gz = Gzz(model, v)
        H0 = epsilon * Gxx + delta * Gz
        Hz = delta * Gxx + Gz
        return second_order_stencil(model, u, v, H0, Hz, qu, qv)
    else:
        H0 = Gh_centered(model, (epsilon * u + delta * v))
        Hz = Gzz(model, (delta * u + v))
        return second_order_stencil(model, u, v, H0, Hz, qu, qv,
                                    forward=forward)


def TTIForwardOperator(model, geometry, space_order=4, save=False,
                       kernel='centered', **kwargs):
    """Reference: tti ForwardOperator (operators.py:415)."""
    if kernel != 'centered':
        raise NotImplementedError("staggered TTI kernel: later round")
    dt = model.grid.time_dim.spacing
    m = model.m
    u = TimeFunction(name='u', grid=model.grid,
                     save=geometry.nt if save else None,
                     time_order=2, space_order=space_order)
    v = TimeFunction(name='v', grid=model.grid,
                     save=geometry.nt if save else None,
                     time_order=2, space_order=space_order)
    src = geometry.src
    rec = geometry.rec

    stencils = kernel_centered(model, u, v)
    expr = src * dt ** 2 / m
    stencils += [src.inject(field=(u.forward, v.forward), expr=expr)]
    stencils += [rec.interpolate(expr=u + v)]
    op = Operator(stencils, subs=model.spacing_map, name='ForwardTTI',
                  **kwargs)
    op._tti_fields = (u, v)
    return op


def TTIAdjointOperator(model, geometry, space_order=4, kernel='centered',
                       **kwargs):
    """Reference: tti AdjointOperator (operators.py:467)."""
    dt = model.grid.time_dim.spacing
    m = model.m
    p = TimeFunction(name='p', grid=model.grid, time_order=2,
                     space_order=space_order)
    r = TimeFunction(name='r', grid=model.grid, time_order=2,
                     space_order=space_order)
    srca = geometry.new_src(name='srca', src_type=None)
    rec = geometry.rec

    stencils = kernel_centered(model, p, r, forward=False)
    expr = rec * dt ** 2 / m
    stencils += [rec.inject(field=(p.backward, r.backward), expr=expr)]
    stencils += [srca.interpolate(expr=p + r)]
    op = Operator(stencils, subs=model.spacing_map, name='AdjointTTI',
                  **kwargs)
    op._tti_fields = (p, r, srca)
    return op


def TTIJacobianOperator(model, geometry, space_order=4, **kwargs):
    """Linearized Born in TTI media (reference: JacobianOperator,
    tti/operators.py:517)."""
    from ...types import Function
    dt = model.grid.stepping_dim.spacing
    m = model.m
    src, rec = geometry.src, geometry.rec
    u0 = TimeFunction(name='u0', grid=model.grid, time_order=2,
                      space_order=space_order)
    v0 = TimeFunction(name='v0', grid=model.grid, time_order=2,
                      space_order=space_order)
    du = TimeFunction(name='du', grid=model.grid, time_order=2,
                      space_order=space_order)
    dv = TimeFunction(name='dv', grid=model.grid, time_order=2,
                      space_order=space_order)
    dm = Function(name='dm', grid=model.grid, space_order=0)

    eqn1 = kernel_centered(model, u0, v0)
    eqn2 = kernel_centered(model, du, dv, qu=-dm * u0.dt2, qv=-dm * v0.dt2)
    src_term = src.inject(field=(u0.forward, v0.forward),
                          expr=src * dt ** 2 / m)
    rec_term = rec.interpolate(expr=du + dv)
    op = Operator(eqn1 + [src_term] + eqn2 + [rec_term],
                  subs=model.spacing_map, name='BornTTI', **kwargs)
    op._fields = (u0, v0, du, dv, dm)
    return op


def TTIJacobianAdjOperator(model, geometry, space_order=4, save=True,
                           **kwargs):
    """FWI gradient in TTI media (reference: JacobianAdjOperator,
    tti/operators.py:573)."""
    from ...types import Function, Inc
    dt = model.grid.stepping_dim.spacing
    m = model.m
    save_t = geometry.nt if save else None
    u0 = TimeFunction(name='u0', grid=model.grid, save=save_t,
                      time_order=2, space_order=space_order)
    v0 = TimeFunction(name='v0', grid=model.grid, save=save_t,
                      time_order=2, space_order=space_order)
    du = TimeFunction(name='du', grid=model.grid, time_order=2,
                      space_order=space_order)
    dv = TimeFunction(name='dv', grid=model.grid, time_order=2,
                      space_order=space_order)
    dm = Function(name='dm', grid=model.grid)
    rec = geometry.rec

    eqn = kernel_centered(model, du, dv, forward=False)
    dm_update = Inc(dm, -(u0 * du.dt2 + v0 * dv.dt2))
    rec_term = rec.inject(field=(du.backward, dv.backward),
                          expr=rec * dt ** 2 / m)
    op = Operator(eqn + [rec_term, dm_update], subs=model.spacing_map,
                  name='GradientTTI', **kwargs)
    op._fields = (u0, v0, du, dv, dm)
    return op


class AnisotropicWaveSolver:
    """Reference: tti/wavesolver.py AnisotropicWaveSolver."""

    def __init__(self, model, geometry, space_order=4, kernel='centered',
                 **kwargs):
        self.model = model
        self.model._initialize_bcs(bcs="damp")
        self.geometry = geometry
        self.space_order = space_order
        self.kernel = kernel
        self._kwargs = kwargs

    @property
    def dt(self):
        return self.model.critical_dt

    @memoized_meth
    def op_fwd(self, save=None):
        return TTIForwardOperator(self.model, save=save,
                                  geometry=self.geometry,
                                  space_order=self.space_order,
                                  kernel=self.kernel, **self._kwargs)

    @memoized_meth
    def op_adj(self):
        return TTIAdjointOperator(self.model, geometry=self.geometry,
                                  space_order=self.space_order,
                                  kernel=self.kernel, **self._kwargs)

    def forward(self, src=None, rec=None, u=None, v=None, model=None,
                save=None, **kwargs):
        src = src if src is not None else self.geometry.src
        rec = rec if rec is not None else self.geometry.rec
        op = self.op_fwd(save)
        save_t = self.geometry.nt if save else None
        u = u or TimeFunction(name='u', grid=self.model.grid, save=save_t,
                              time_order=2, space_order=self.space_order)
        v = v or TimeFunction(name='v', grid=self.model.grid, save=save_t,
                              time_order=2, space_order=self.space_order)
        model = model or self.model
        kwargs.update(model.physical_params(**kwargs))
        summary = op.apply(src=src, rec=rec, u=u, v=v,
                           dt=kwargs.pop('dt', self.dt), **kwargs)
        return rec, u, v, summary

    @memoized_meth
    def op_jac(self):
        return TTIJacobianOperator(self.model, geometry=self.geometry,
                                   space_order=self.space_order,
                                   **self._kwargs)

    @memoized_meth
    def op_jacadj(self, save=True):
        return TTIJacobianAdjOperator(self.model, geometry=self.geometry,
                                      space_order=self.space_order,
                                      save=save, **self._kwargs)

    def jacobian(self, dmin, src=None, rec=None, model=None, **kwargs):
        """Born modeling (reference: tti wavesolver.jacobian)."""
        src = src if src is not None else self.geometry.src
        rec = rec if rec is not None else self.geometry.rec
        op = self.op_jac()
        u0, v0, du, dv, dm0 = op._fields
        from ...types import Function
        dm = Function(name='dm', grid=self.model.grid, space_order=0)
        dm.data[:] = np.asarray(dmin if not hasattr(dmin, 'data')
                                else dmin.data)
        model = model or self.model
        kwargs.update(model.physical_params(**kwargs))
        for f in (u0, v0, du, dv):
            f.data[:] = 0
        op.apply(src=src, rec=rec, dm=dm, dt=kwargs.pop('dt', self.dt),
                 **kwargs)
        return rec, u0, v0, du, dv

    def jacobian_adjoint(self, rec, u0, v0, dm=None, model=None, **kwargs):
        """TTI FWI gradient (reference: tti wavesolver.jacobian_adjoint)."""
        from ...types import Function
        op = self.op_jacadj(True)
        dm = dm or Function(name='dm', grid=self.model.grid)
        du = TimeFunction(name='du', grid=self.model.grid, time_order=2,
                          space_order=self.space_order)
        dv = TimeFunction(name='dv', grid=self.model.grid, time_order=2,
                          space_order=self.space_order)
        model = model or self.model
        kwargs.update(model.physical_params(**kwargs))
        op.apply(rec=rec, u0=u0, v0=v0, du=du, dv=dv, dm=dm,
                 dt=kwargs.pop('dt', self.dt), **kwargs)
        return dm, None

    def adjoint(self, rec, srca=None, p=None, r=None, model=None, **kwargs):
        op = self.op_adj()
        srca = srca if srca is not None else self.geometry.new_src(
            name='srca', src_type=None)
        p = p or TimeFunction(name='p', grid=self.model.grid, time_order=2,
                              space_order=self.space_order)
        r = r or TimeFunction(name='r', grid=self.model.grid, time_order=2,
                              space_order=self.space_order)
        model = model or self.model
        kwargs.update(model.physical_params(**kwargs))
        summary = op.apply(rec=rec, srca=srca, p=p, r=r,
                           dt=kwargs.pop('dt', self.dt), **kwargs)
        return srca, p, r, summary


def tti_setup(shape=(50, 50), spacing=(15., 15.), tn=500., space_order=4,
              nbl=10, nlayers=3, dtype=None, kernel='centered', **kwargs):
    """Reference parity: the 'layers-tti' preset (preset_models.py:210) +
    tti wavesolver setup."""
    from .model import SeismicModel
    from .utils import setup_geometry
    dtype = dtype or np.float32
    vp_top, vp_bottom = 1.5, 3.5
    v = np.empty(shape, dtype=dtype)
    v[:] = vp_top
    vp_i = np.linspace(vp_top, vp_bottom, nlayers)
    for i in range(1, nlayers):
        v[..., i * int(shape[-1] / nlayers):] = vp_i[i]
    epsilon = .1 * (v - vp_top)
    delta = .05 * (v - vp_top)
    theta = .5 * (v - vp_top)
    phi = .25 * (v - vp_top) if len(shape) > 2 else None

    origin = tuple(0. for _ in shape)
    model = SeismicModel(origin=origin, spacing=spacing, shape=shape,
                         space_order=space_order, vp=v, nbl=nbl,
                         dtype=dtype, epsilon=epsilon, delta=delta,
                         theta=theta, phi=phi, bcs="damp")
    geometry = setup_geometry(model, tn)
    return AnisotropicWaveSolver(model, geometry, space_order=space_order,
                                 kernel=kernel)
