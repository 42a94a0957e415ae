"""Cross-validation against the executed reference implementation.

The oracle harness (tests/oracle/) imports the reference Devito checkout
with clean-room stand-ins for its absent codegen deps (cgen/codepy/
anytree/cpuinfo), JIT-compiles its generated C with the system gcc, and
runs it — so these tests compare our TPU-native results against the
reference's *own execution*, not against hard-coded numbers.

Skipped automatically when no reference checkout is available.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit('/', 1)[0])

from oracle import harness  # noqa: E402


pytestmark = pytest.mark.skipif(not harness.available(),
                                reason="reference oracle unavailable")


def test_acoustic_forward_vs_oracle():
    """2-D acoustic forward: receiver traces match the reference run."""
    ref = harness.reference()
    with ref.use():
        acoustic_setup = ref.import_examples(
            'seismic.acoustic.acoustic_example').acoustic_setup
        s = acoustic_setup(shape=(41, 41), spacing=(15., 15.), tn=400.,
                           space_order=4, nbl=10, preset='layers-isotropic',
                           dtype=np.float64)
        rec, u, _ = s.forward()
        ref_rec = np.asarray(rec.data).copy()
        ref_dt = s.model.critical_dt

    from devito_tpu.models.seismic import acoustic_setup as our_setup
    s2 = our_setup(shape=(41, 41), spacing=[15., 15.], tn=400.,
                   space_order=4, nbl=10, preset='layers-isotropic',
                   dtype=np.float64)
    rec2, u2, _ = s2.forward()
    assert np.isclose(s2.dt, ref_dt, rtol=0, atol=1e-12)
    assert ref_rec.shape == np.asarray(rec2.data).shape
    den = np.linalg.norm(ref_rec) or 1.0
    rel = np.linalg.norm(np.asarray(rec2.data) - ref_rec) / den
    # fp64 rounding differences (XLA fusion vs gcc op ordering) amplify
    # through the neutrally-stable wave recursion: machine-eps at t=2
    # grows to ~1e-9 over the 170-step run. 1e-7 still rejects any
    # semantic difference (a wrong stencil shows up at 1e-2..1e-3).
    assert rel < 1e-7, f"receiver mismatch vs oracle: rel={rel:.3e}"


def test_viscoelastic_forward_vs_oracle():
    """Viscoelastic layers model: receiver norms match the reference."""
    ref = harness.reference()
    with ref.use():
        viscoelastic_setup = ref.import_examples(
            'seismic.viscoelastic.viscoelastic_example').viscoelastic_setup
        from devito import norm as ref_norm
        s = viscoelastic_setup(shape=(40, 40), spacing=(20., 20.), tn=400.,
                               space_order=4, nbl=10, constant=False,
                               dtype=np.float64)
        r1, r2, _, _, _ = s.forward()
        ref1, ref2 = float(ref_norm(r1)), float(ref_norm(r2))

    from devito_tpu.builtins import norm
    from devito_tpu.models.seismic.viscoelastic import (
        viscoelastic_setup as our_setup)
    s2 = our_setup(shape=(40, 40), spacing=(20., 20.), tn=400.,
                   space_order=4, nbl=10, dtype=np.float64)
    o1, o2, _, _, _ = s2.forward()
    assert np.isclose(float(norm(o1)), ref1, rtol=1e-8)
    assert np.isclose(float(norm(o2)), ref2, rtol=1e-8)


def test_elastic_forward_vs_oracle():
    """Elastic layers model: receiver norms match the reference."""
    ref = harness.reference()
    with ref.use():
        elastic_setup = ref.import_examples(
            'seismic.elastic.elastic_example').elastic_setup
        from devito import norm as ref_norm
        s = elastic_setup(shape=(40, 40), spacing=(15., 15.), tn=400.,
                          space_order=4, nbl=10, constant=False,
                          dtype=np.float64)
        r1, r2, _, _, _ = s.forward()
        ref1, ref2 = float(ref_norm(r1)), float(ref_norm(r2))

    from devito_tpu.builtins import norm
    from devito_tpu.models.seismic.elastic import elastic_setup as our_setup
    s2 = our_setup(shape=(40, 40), spacing=(15., 15.), tn=400.,
                   space_order=4, nbl=10, dtype=np.float64)
    o1, o2, _, _, _ = s2.forward()
    assert np.isclose(float(norm(o1)), ref1, rtol=1e-8)
    assert np.isclose(float(norm(o2)), ref2, rtol=1e-8)


def test_diffusion_operator_vs_oracle():
    """Raw-DSL diffusion loop: fields match the reference elementwise."""
    ref = harness.reference()
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(32, 32), extent=(1., 1.), dtype=np.float64)
        u = dv.TimeFunction(name='u', grid=g, space_order=2)
        u.data[0] = np.outer(np.sin(np.linspace(0, np.pi, 32)),
                             np.sin(np.linspace(0, np.pi, 32)))
        eq = dv.Eq(u.dt, 0.25 * u.laplace)
        op = dv.Operator(dv.Eq(u.forward, dv.solve(eq, u.forward)))
        op.apply(time_M=50, dt=1e-5)
        ref_u = np.asarray(u.data).copy()

    from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
    g2 = Grid(shape=(32, 32), extent=(1., 1.), dtype=np.float64)
    u2 = TimeFunction(name='u', grid=g2, space_order=2)
    u2.data[0] = np.outer(np.sin(np.linspace(0, np.pi, 32)),
                          np.sin(np.linspace(0, np.pi, 32)))
    op2 = Operator(Eq(u2.forward, solve(Eq(u2.dt, 0.25 * u2.laplace),
                                        u2.forward)))
    op2.apply(time_M=50, dt=1e-5)
    assert np.allclose(np.asarray(u2.data), ref_u, rtol=1e-12, atol=1e-14)


def test_tti_forward_vs_oracle():
    """TTI centered-kernel layers model: receiver norm matches."""
    ref = harness.reference()
    with ref.use():
        tti_setup = ref.import_examples(
            'seismic.tti.tti_example').tti_setup
        from devito import norm as ref_norm
        s = tti_setup(shape=(40, 40), spacing=(20., 20.), tn=250.,
                      space_order=4, nbl=10, dtype=np.float64)
        rec, *_ = s.forward()
        ref_n = float(ref_norm(rec))

    from devito_tpu.builtins import norm
    from devito_tpu.models.seismic.tti import tti_setup as our_setup
    s2 = our_setup(shape=(40, 40), spacing=(20., 20.), tn=250.,
                   space_order=4, nbl=10, dtype=np.float64)
    rec2, *_ = s2.forward()
    assert np.isclose(float(norm(rec2)), ref_n, rtol=1e-7)


def test_viscoacoustic_forward_vs_oracle():
    """Viscoacoustic SLS 2nd-order layers model: receiver norm matches."""
    ref = harness.reference()
    with ref.use():
        va = ref.import_examples(
            'seismic.viscoacoustic.viscoacoustic_example')
        from devito import norm as ref_norm
        s = va.viscoacoustic_setup(shape=(40, 40), spacing=(20., 20.),
                                   tn=400., space_order=4, nbl=10,
                                   kernel='sls', time_order=2,
                                   dtype=np.float64)
        rec, *_ = s.forward()
        ref_n = float(ref_norm(rec))

    from devito_tpu.builtins import norm
    from devito_tpu.models.seismic.viscoacoustic import (
        viscoacoustic_setup as our_setup)
    s2 = our_setup(shape=(40, 40), spacing=(20., 20.), tn=400.,
                   space_order=4, nbl=10, kernel='sls', time_order=2,
                   dtype=np.float64)
    rec2, *_ = s2.forward()
    assert np.isclose(float(norm(rec2)), ref_n, rtol=1e-7)


def test_fwi_gradient_vs_oracle():
    """Full FWI gradient (forward + saved wavefield + adjoint-gradient):
    the gradient field matches the reference's own execution."""
    ref = harness.reference()
    with ref.use():
        acoustic_setup = ref.import_examples(
            'seismic.acoustic.acoustic_example').acoustic_setup
        s = acoustic_setup(shape=(33, 33), spacing=(15., 15.), tn=300.,
                           space_order=4, nbl=10, preset='layers-isotropic',
                           dtype=np.float64)
        rec, u, _ = s.forward(save=True)
        grad, _ = s.jacobian_adjoint(rec, u)
        ref_grad = np.asarray(grad.data).copy()

    from devito_tpu.models.seismic import acoustic_setup as our_setup
    s2 = our_setup(shape=(33, 33), spacing=[15., 15.], tn=300.,
                   space_order=4, nbl=10, preset='layers-isotropic',
                   dtype=np.float64)
    rec2, u2, _ = s2.forward(save=True)
    grad2, _ = s2.jacobian_adjoint(rec2, u2)
    our_grad = np.asarray(grad2.data)
    assert our_grad.shape == ref_grad.shape
    den = np.linalg.norm(ref_grad) or 1.0
    rel = np.linalg.norm(our_grad - ref_grad) / den
    assert rel < 1e-6, f"gradient mismatch vs oracle: rel={rel:.3e}"


def test_born_vs_oracle():
    """Linearized Born modelling: scattered receiver data matches the
    reference for a velocity perturbation."""
    ref = harness.reference()
    with ref.use():
        acoustic_setup = ref.import_examples(
            'seismic.acoustic.acoustic_example').acoustic_setup
        import devito as dv
        s = acoustic_setup(shape=(33, 33), spacing=(15., 15.), tn=300.,
                           space_order=4, nbl=10, preset='layers-isotropic',
                           dtype=np.float64)
        dm = dv.Function(name='dm', grid=s.model.grid)
        dm.data[12:20, 12:20] = 0.05
        rec, _, _, _ = s.jacobian(dm)
        ref_rec = np.asarray(rec.data).copy()

    from devito_tpu.models.seismic import acoustic_setup as our_setup
    from devito_tpu import Function
    s2 = our_setup(shape=(33, 33), spacing=[15., 15.], tn=300.,
                   space_order=4, nbl=10, preset='layers-isotropic',
                   dtype=np.float64)
    dm2 = Function(name='dm', grid=s2.model.grid)
    dm2.data[12:20, 12:20] = 0.05
    rec2, *_ = s2.jacobian(dm2)
    den = np.linalg.norm(ref_rec) or 1.0
    rel = np.linalg.norm(np.asarray(rec2.data) - ref_rec) / den
    assert rel < 1e-6, f"born mismatch vs oracle: rel={rel:.3e}"


def test_free_surface_vs_oracle():
    """Free-surface acoustic forward matches the reference."""
    ref = harness.reference()
    with ref.use():
        acoustic_setup = ref.import_examples(
            'seismic.acoustic.acoustic_example').acoustic_setup
        s = acoustic_setup(shape=(33, 33), spacing=(15., 15.), tn=300.,
                           space_order=4, nbl=10, preset='layers-isotropic',
                           fs=True, dtype=np.float64)
        rec, u, _ = s.forward()
        ref_rec = np.asarray(rec.data).copy()

    from devito_tpu.models.seismic import acoustic_setup as our_setup
    s2 = our_setup(shape=(33, 33), spacing=[15., 15.], tn=300.,
                   space_order=4, nbl=10, preset='layers-isotropic',
                   fs=True, dtype=np.float64)
    rec2, u2, _ = s2.forward()
    den = np.linalg.norm(ref_rec) or 1.0
    rel = np.linalg.norm(np.asarray(rec2.data) - ref_rec) / den
    assert rel < 1e-6, f"free-surface mismatch vs oracle: rel={rel:.3e}"


def test_acoustic_ot4_vs_oracle():
    """OT4 (4th-order-in-time) acoustic kernel matches the reference."""
    ref = harness.reference()
    with ref.use():
        acoustic_setup = ref.import_examples(
            'seismic.acoustic.acoustic_example').acoustic_setup
        s = acoustic_setup(shape=(33, 33), spacing=(15., 15.), tn=300.,
                           space_order=4, nbl=10, kernel='OT4',
                           preset='layers-isotropic', dtype=np.float64)
        rec, u, _ = s.forward()
        ref_rec = np.asarray(rec.data).copy()

    from devito_tpu.models.seismic import acoustic_setup as our_setup
    s2 = our_setup(shape=(33, 33), spacing=[15., 15.], tn=300.,
                   space_order=4, nbl=10, kernel='OT4',
                   preset='layers-isotropic', dtype=np.float64)
    rec2, u2, _ = s2.forward()
    den = np.linalg.norm(ref_rec) or 1.0
    rel = np.linalg.norm(np.asarray(rec2.data) - ref_rec) / den
    assert rel < 1e-6, f"OT4 mismatch vs oracle: rel={rel:.3e}"


def test_offgrid_receivers_vs_oracle():
    """Receivers at non-grid coordinates: bilinear interpolation matches
    the reference's generated interpolation loops."""
    ref = harness.reference()
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(31, 31), extent=(30., 30.), dtype=np.float64)
        u = dv.TimeFunction(name='u', grid=g, space_order=2, save=8)
        for t in range(8):
            u.data[t] = np.fromfunction(
                lambda i, j: np.sin(0.3 * i) * np.cos(0.2 * j) + t,
                (31, 31))
        rec = dv.SparseTimeFunction(name='rec', grid=g, npoint=5, nt=8)
        coords = np.array([[3.3, 4.7], [15.01, 15.99], [0.2, 29.8],
                           [29.9, 0.1], [10.5, 20.5]])
        rec.coordinates.data[:] = coords
        dv.Operator(rec.interpolate(expr=u))(time_m=0, time_M=7)
        ref_vals = np.asarray(rec.data).copy()

    from devito_tpu import (Grid, TimeFunction, SparseTimeFunction,
                            Operator)
    g2 = Grid(shape=(31, 31), extent=(30., 30.), dtype=np.float64)
    u2 = TimeFunction(name='u', grid=g2, space_order=2, save=8)
    for t in range(8):
        u2.data[t] = np.fromfunction(
            lambda i, j: np.sin(0.3 * i) * np.cos(0.2 * j) + t, (31, 31))
    rec2 = SparseTimeFunction(name='rec', grid=g2, npoint=5, nt=8)
    rec2.coordinates.data[:] = coords
    Operator([rec2.interpolate(expr=u2)]).apply(time_m=0, time_M=7)
    assert np.allclose(np.asarray(rec2.data), ref_vals, rtol=1e-12,
                       atol=1e-13)


def test_wavelets_vs_oracle():
    """Ricker/Gabor/DGauss wavelet formulas match the reference."""
    ref = harness.reference()
    with ref.use():
        import devito as dv
        from examples.seismic import (RickerSource, GaborSource,
                                      DGaussSource, TimeAxis)
        g = dv.Grid(shape=(11, 11), extent=(100., 100.))
        tr = TimeAxis(start=0., step=1.0, num=200)
        vals = {}
        for cls, nm in ((RickerSource, 'r'), (GaborSource, 'g'),
                        (DGaussSource, 'd')):
            s = cls(name=f'src_{nm}', grid=g, f0=0.02, npoint=1,
                    time_range=tr)
            vals[nm] = np.asarray(s.data).copy()

    from devito_tpu import Grid
    from devito_tpu.models.seismic.source import (
        RickerSource as OR, GaborSource as OG, DGaussSource as OD,
        TimeAxis as OT)
    g2 = Grid(shape=(11, 11), extent=(100., 100.))
    tr2 = OT(start=0., step=1.0, num=200)
    for cls, nm in ((OR, 'r'), (OG, 'g'), (OD, 'd')):
        s = cls(name=f'o_{nm}', grid=g2, f0=0.02, npoint=1, time_range=tr2)
        ours = np.asarray(s.data)
        assert np.allclose(ours, vals[nm], rtol=1e-6, atol=1e-8), nm


def test_initializers_vs_oracle():
    """initialize_function pad modes and gaussian_smooth match."""
    ref = harness.reference()
    rng = np.random.default_rng(0)
    data = rng.standard_normal((12, 12))
    with ref.use():
        import devito as dv
        from devito.builtins import (initialize_function as ref_init,
                                     gaussian_smooth as ref_smooth)
        outs = {}
        for mode in ('constant', 'reflect'):
            g = dv.Grid(shape=(20, 20), dtype=np.float64)
            f = dv.Function(name=f'f{mode}', grid=g)
            ref_init(f, data, 4, mode=mode)
            outs[mode] = np.asarray(f.data).copy()
        gs = dv.Grid(shape=(12, 12), dtype=np.float64)
        h = dv.Function(name='h', grid=gs)
        h.data[:] = data
        ref_smooth(h, sigma=2)
        outs['smooth'] = np.asarray(h.data).copy()

    from devito_tpu import Grid, Function
    from devito_tpu.builtins import initialize_function, gaussian_smooth
    for mode in ('constant', 'reflect'):
        g = Grid(shape=(20, 20), dtype=np.float64)
        f = Function(name=f'of{mode}', grid=g)
        initialize_function(f, data, 4, mode=mode)
        assert np.allclose(np.asarray(f.data), outs[mode], atol=1e-12), mode
    gs = Grid(shape=(12, 12), dtype=np.float64)
    h = Function(name='oh', grid=gs, dtype=np.float64)
    h.data[:] = data
    sm = gaussian_smooth(h, sigma=2)
    assert np.allclose(np.asarray(sm.data), outs['smooth'], rtol=1e-5,
                       atol=1e-7)


def test_subdomain_thickness_vs_oracle():
    """SubDomain left/middle/right thickness semantics match."""
    ref = harness.reference()
    with ref.use():
        import devito as dv

        class Mid(dv.SubDomain):
            name = 'mid'

            def define(self, dimensions):
                x, y = dimensions
                return {x: ('middle', 3, 4), y: ('right', 5)}

        g = dv.Grid(shape=(14, 14), subdomains=(Mid(),))
        f = dv.Function(name='f', grid=g)
        dv.Operator(dv.Eq(f, 1, subdomain=g.subdomains['mid']))()
        ref_f = np.asarray(f.data).copy()

    from devito_tpu import Grid, Function, Eq, Operator, SubDomain

    class Mid2(SubDomain):
        name = 'mid'

        def define(self, dims):
            x, y = dims
            return {x: ('middle', 3, 4), y: ('right', 5)}

    g2 = Grid(shape=(14, 14), subdomains=(Mid2(),))
    f2 = Function(name='f', grid=g2)
    Operator(Eq(f2, 1, subdomain=g2.subdomains['mid'])).apply()
    assert np.array_equal(np.asarray(f2.data), ref_f)


def test_subsampled_save_vs_oracle():
    """ConditionalDimension factor saves match row-for-row."""
    ref = harness.reference()
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(10, 10))
        u = dv.TimeFunction(name='u', grid=g)
        tsub = dv.ConditionalDimension('t_sub', parent=g.time_dim, factor=4)
        us = dv.TimeFunction(name='us', grid=g, save=5, time_dim=tsub)
        dv.Operator([dv.Eq(u.forward, u + 1), dv.Eq(us, u)])(time_M=16)
        ref_us = np.asarray(us.data).copy()

    from devito_tpu import (Grid, TimeFunction, Eq, Operator,
                            ConditionalDimension)
    g2 = Grid(shape=(10, 10))
    u2 = TimeFunction(name='u', grid=g2)
    ts2 = ConditionalDimension('t_sub', parent=g2.time_dim, factor=4)
    us2 = TimeFunction(name='us', grid=g2, save=5, time_dim=ts2)
    Operator([Eq(u2.forward, u2 + 1), Eq(us2, u2)]).apply(time_M=16, dt=1.)
    assert np.array_equal(np.asarray(us2.data), ref_us)


def test_spatial_bounds_vs_oracle():
    """x_m/x_M apply arguments restrict regions identically."""
    ref = harness.reference()
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(12, 12))
        u = dv.TimeFunction(name='u', grid=g)
        dv.Operator(dv.Eq(u.forward, u + 1))(time_M=3, x_m=2, x_M=7,
                                             y_m=4, y_M=9)
        ref_u = np.asarray(u.data).copy()

    from devito_tpu import Grid, TimeFunction, Eq, Operator
    g2 = Grid(shape=(12, 12))
    u2 = TimeFunction(name='u', grid=g2)
    Operator(Eq(u2.forward, u2 + 1)).apply(time_M=3, dt=1., x_m=2, x_M=7,
                                           y_m=4, y_M=9)
    assert np.array_equal(np.asarray(u2.data), ref_u)


def test_precomputed_sparse_vs_oracle():
    """PrecomputedSparseFunction gridpoint/coefficient conventions."""
    ref = harness.reference()
    rng = np.random.default_rng(3)
    coeffs = rng.uniform(0.1, 0.9, (3, 2, 2))
    gpts = np.array([[2, 3], [5, 5], [1, 6]])
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(9, 9), dtype=np.float64)
        p = dv.PrecomputedSparseFunction(
            name='p', grid=g, npoint=3, r=2, gridpoints=gpts,
            interpolation_coeffs=coeffs.copy())
        f = dv.Function(name='f', grid=g, dtype=np.float64)
        f.data[:] = np.arange(81.).reshape(9, 9)
        dv.Operator(p.interpolate(expr=f))()
        ref_vals = np.asarray(p.data).copy()

    from devito_tpu import (Grid, Function, Operator,
                            PrecomputedSparseFunction)
    g2 = Grid(shape=(9, 9), dtype=np.float64)
    p2 = PrecomputedSparseFunction(
        name='p', grid=g2, npoint=3, r=2, gridpoints=gpts,
        interpolation_coeffs=coeffs.copy())
    f2 = Function(name='f', grid=g2, dtype=np.float64)
    f2.data[:] = np.arange(81.).reshape(9, 9)
    Operator([p2.interpolate(expr=f2)]).apply()
    assert np.allclose(np.asarray(p2.data), ref_vals, rtol=1e-12)


def test_sinc_interpolation_vs_oracle():
    """Kaiser-windowed sinc interpolation (Hicks) matches the reference."""
    ref = harness.reference()
    coords = np.array([[3.37, 4.71], [10.12, 11.89]])
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(21, 21), extent=(20., 20.), dtype=np.float64)
        f = dv.Function(name='f', grid=g, space_order=4, dtype=np.float64)
        f.data[:] = np.fromfunction(lambda i, j: np.sin(0.4 * i) + 0.1 * j,
                                    (21, 21))
        p = dv.SparseFunction(name='p', grid=g, npoint=2,
                              interpolation='sinc', r=4)
        p.coordinates.data[:] = coords
        dv.Operator(p.interpolate(expr=f))()
        ref_vals = np.asarray(p.data).copy()

    from devito_tpu import Grid, Function, Operator, SparseFunction
    g2 = Grid(shape=(21, 21), extent=(20., 20.), dtype=np.float64)
    f2 = Function(name='f', grid=g2, space_order=4, dtype=np.float64)
    f2.data[:] = np.fromfunction(lambda i, j: np.sin(0.4 * i) + 0.1 * j,
                                 (21, 21))
    p2 = SparseFunction(name='p', grid=g2, npoint=2,
                        interpolation='sinc', r=4)
    p2.coordinates.data[:] = coords
    Operator([p2.interpolate(expr=f2)]).apply()
    assert np.allclose(np.asarray(p2.data), ref_vals, rtol=1e-10)


def test_msf_vs_oracle():
    """MatrixSparseTimeFunction (scipy-matrix-coupled channels)."""
    import scipy.sparse as sp
    ref = harness.reference()
    M = np.array([[1.0, 0.0], [0.5, 0.5]])
    gpts = [[3, 4], [5, 5]]

    def fill(msf, grid):
        msf.gridpoints.data[:] = gpts
        for d in grid.dimensions:
            msf.interpolation_coefficients[d].data[:] = 1.

    with ref.use():
        import devito as dv
        from devito.types.sparse import MatrixSparseTimeFunction as RMSF
        g = dv.Grid(shape=(9, 9), dtype=np.float64)
        msf = RMSF(name='m', grid=g, r=1, matrix=sp.csr_matrix(M), nt=4)
        fill(msf, g)
        f = dv.TimeFunction(name='f', grid=g, save=4, dtype=np.float64)
        for t in range(4):
            f.data[t] = t + np.arange(81.).reshape(9, 9) / 100.
        msf.manual_scatter()
        dv.Operator(msf.interpolate(f))(time_m=0, time_M=3)
        msf.manual_gather()
        ref_vals = np.asarray(msf.data).copy()

    from devito_tpu import (Grid, TimeFunction, Operator,
                            MatrixSparseTimeFunction)
    g2 = Grid(shape=(9, 9), dtype=np.float64)
    m2 = MatrixSparseTimeFunction(name='m', grid=g2, r=1,
                                  matrix=sp.csr_matrix(M), nt=4)
    fill(m2, g2)
    f2 = TimeFunction(name='f', grid=g2, save=4, dtype=np.float64)
    for t in range(4):
        f2.data[t] = t + np.arange(81.).reshape(9, 9) / 100.
    m2.manual_scatter()
    Operator([m2.interpolate(f2)]).apply(time_m=0, time_M=3)
    m2.manual_gather()
    assert np.allclose(np.asarray(m2.data), ref_vals, rtol=1e-12)
