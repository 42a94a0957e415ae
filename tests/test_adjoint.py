"""Adjoint dot-product tests.

Reference parity: tests/test_adjoint.py — <F x, y> == <x, F^T y> at
atol 1e-11 (forward/adjoint pair, fp64) and the inject/interpolate pair at
atol 1e-6. Sizes shrunk vs the reference (CPU-simulated runs), tolerances
kept identical.
"""

import numpy as np
import pytest

# fp64 path (reference runs these tests in double precision)
import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import Grid, Function, SparseFunction, Operator
from devito_tpu.builtins import inner, norm
from devito_tpu.models.seismic import acoustic_setup


class TestAdjoint:

    @pytest.mark.parametrize('shape, kernel, space_order', [
        ((60,), 'OT2', 12),
        ((60,), 'OT2', 8),
        ((60, 70), 'OT2', 12),
        ((60, 70), 'OT2', 8),
        ((60, 70), 'OT2', 4),
        ((30, 35, 30), 'OT2', 8),
        ((30, 35, 30), 'OT2', 4),
    ])
    def test_adjoint_F(self, shape, kernel, space_order):
        """<F x, y> == <x, F^T y> for the acoustic propagator."""
        tn = 250.
        solver = acoustic_setup(shape=shape, spacing=[15.] * len(shape),
                                kernel=kernel, nbl=10, tn=tn,
                                space_order=space_order,
                                preset='layers-isotropic',
                                dtype=np.float64)
        srca = solver.geometry.new_src(name='srca', src_type=None)
        rec = solver.forward(save=False)[0]
        solver.adjoint(rec=rec, srca=srca)
        term1 = inner(srca, solver.geometry.src)
        term2 = norm(rec) ** 2
        assert np.isclose((term1 - term2) / term1, 0., atol=1.e-11), \
            (term1, term2, (term1 - term2) / term1)

    @pytest.mark.parametrize('shape, coords', [
        ((11, 11), [(.05, .9), (.01, .8)]),
        ((11, 11, 11), [(.05, .9), (.01, .8), (0.07, 0.84)]),
    ])
    def test_adjoint_inject_interpolate(self, shape, coords, npoints=19):
        """p.inject is the adjoint of p.interpolate."""
        grid = Grid(shape, dtype=np.float64)
        a = Function(name='a', grid=grid, space_order=1)
        c = Function(name='c', grid=grid, space_order=1)
        c.data[:] = 27.

        pcoords = np.zeros((npoints, len(shape)))
        for i, r in enumerate(coords):
            pcoords[:, i] = np.linspace(r[0], r[1], npoints)
        p = SparseFunction(name='p', grid=grid, npoint=npoints,
                           coordinates=pcoords)
        p.data[:] = 1.2
        p2 = SparseFunction(name='p2', grid=grid, npoint=npoints,
                            coordinates=pcoords.copy())

        expr = p.inject(field=a, expr=p)
        expr2 = p2.interpolate(expr=c)
        Operator([expr, expr2])()
        term1 = inner(p2, p)
        term2 = inner(c, a)
        assert np.isclose((term1 - term2) / term1, 0., atol=1.e-6), \
            (term1, term2)


class TestAdjointTTI:
    """TTI forward/adjoint dot test (reference: test_adjoint.py TTI rows,
    same atol 1e-11)."""

    @pytest.mark.parametrize('shape, space_order', [
        ((30, 35), 8),
        ((30, 35), 4),
        ((24, 26, 28), 4),
        ((24, 26, 28), 8),
    ])
    def test_adjoint_F_tti(self, shape, space_order):
        from devito_tpu.models.seismic.tti import tti_setup
        solver = tti_setup(shape=shape, spacing=[15.] * len(shape),
                           nbl=10, tn=250., space_order=space_order,
                           dtype=np.float64)
        rec, u, v, _ = solver.forward(save=False)
        srca, p, r, _ = solver.adjoint(rec)
        term1 = inner(srca, solver.geometry.src)
        term2 = norm(rec) ** 2
        assert np.isclose((term1 - term2) / term1, 0., atol=1.e-11), \
            (term1, term2, (term1 - term2) / term1)


    @pytest.mark.parametrize('shape, space_order', [((40, 45), 4)])
    def test_adjoint_F_fs(self, shape, space_order):
        """Free-surface variant (reference: layers-fs row)."""
        solver = acoustic_setup(shape=shape, spacing=[15.] * len(shape),
                                nbl=10, tn=250., space_order=space_order,
                                preset='layers-isotropic', fs=True,
                                dtype=np.float64)
        srca = solver.geometry.new_src(name='srca', src_type=None)
        rec = solver.forward(save=False)[0]
        solver.adjoint(rec=rec, srca=srca)
        term1 = inner(srca, solver.geometry.src)
        term2 = norm(rec) ** 2
        assert np.isclose((term1 - term2) / term1, 0., atol=1.e-11)
        # the wavefield vanishes on the free surface
        u = solver.forward(save=False)[1]
        assert np.abs(np.asarray(u.data)[:, :, 0]).max() == 0.0


class TestAdjointJ:
    """<J dm, y> == <dm, J' y> (reference: test_adjoint_J, atol 1e-12)."""

    def test_adjoint_J_acoustic(self):
        from devito_tpu.models.seismic import demo_model
        shape, so = (40, 45), 4
        solver = acoustic_setup(shape=shape, spacing=[10.] * 2,
                                nbl=12, tn=250., space_order=so,
                                preset='layers-isotropic',
                                dtype=np.float64, vp_bottom=2)
        model0 = demo_model('layers-isotropic', vp_top=1.5, vp_bottom=1.5,
                            spacing=(10., 10.), space_order=so, shape=shape,
                            nbl=12, dtype=np.float64,
                            grid=solver.model.grid)
        dm = (np.asarray(solver.model.vp.data) ** -2
              - np.asarray(model0.vp.data) ** -2)
        from devito_tpu import Function
        dmf = Function(name='dmf', grid=solver.model.grid, space_order=0)
        dmf.data[:] = dm
        du = solver.jacobian(dmf, model=model0)[0]
        u0 = solver.forward(save=True, model=model0)[1]
        im, _ = solver.jacobian_adjoint(du, u0, model=model0)
        term1 = float(np.dot(np.asarray(im.data).ravel(), dm.ravel()))
        term2 = norm(du) ** 2
        assert np.isclose((term1 - term2) / term1, 0., atol=1e-12), \
            (term1, term2)

    def test_adjoint_J_tti(self):
        from devito_tpu.models.seismic.tti import tti_setup
        solver = tti_setup(shape=(25, 30), spacing=(10., 10.), tn=250.,
                           space_order=4, nbl=12, dtype=np.float64)
        vp = np.asarray(solver.model.vp.data)
        dm = (vp ** -2) - (np.full_like(vp, 1.5) ** -2)
        rec_lin = solver.jacobian(dm)[0]
        term2 = norm(rec_lin) ** 2
        rec, u0, v0, _ = solver.forward(save=True)
        im, _ = solver.jacobian_adjoint(rec_lin, u0, v0)
        term1 = float(np.dot(np.asarray(im.data).ravel(), dm.ravel()))
        assert np.isclose((term1 - term2) / term1, 0., atol=1e-12), \
            (term1, term2)
