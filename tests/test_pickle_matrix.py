"""Pickle matrix across the type zoo (VERDICT r4 item 7).

Reference parity: tests/test_pickle.py (1085 LoC) round-trips every
user-facing type, parametrized over pickle/cloudpickle, and re-runs
pickled Operators. The C-machinery rows (Lock, PThreadArray, SharedData,
Cast, SizeOf, FIndexed, MPI structs) are N/A under XLA — the applicable
surface is the symbolic type zoo, the data carriers, the application
layer, and Operators (incl. sharded re-runs, covered in test_pickle.py).
"""

import pickle as pickle_mod

import numpy as np
import pytest

try:
    import cloudpickle
    _PICKLERS = [pickle_mod, cloudpickle]
except ImportError:  # pragma: no cover
    _PICKLERS = [pickle_mod]

from devito_tpu import (Grid, Function, TimeFunction, Eq, Inc, Operator,
                        solve, Constant, SubDomain, Dimension,
                        SpaceDimension, TimeDimension, SteppingDimension,
                        SubDimension, ConditionalDimension,
                        DefaultDimension, Derivative, ReduceMax, ReduceMin,
                        TensorFunction, VectorFunction, TensorTimeFunction,
                        VectorTimeFunction, Buffer, NODE, CELL)
from devito_tpu.types.sparse import (SparseFunction, SparseTimeFunction,
                                     PrecomputedSparseTimeFunction,
                                     MatrixSparseTimeFunction)
from devito_tpu.finite_differences.coefficients import (Coefficient,
                                                        Substitutions)


@pytest.fixture(params=_PICKLERS,
                ids=[m.__name__ for m in _PICKLERS])
def pickle(request):
    return request.param


def _rt(pickle, obj):
    return pickle.loads(pickle.dumps(obj))


class TestDimensions:
    """Reference: test_pickle.py test_dimension/:82 sub_dimension/:334
    conditional_dimension/:346."""

    def test_dimension(self, pickle):
        d = Dimension(name='dp')
        nd = _rt(pickle, d)
        assert nd.name == 'dp' and nd.spacing == d.spacing
        assert nd is d  # symbol cache: same name -> same object

    def test_space_time_dimensions(self, pickle):
        x = SpaceDimension(name='xsp')
        t = TimeDimension(name='tsp')
        assert _rt(pickle, x).is_Space
        nt = _rt(pickle, t)
        assert nt.is_Time and nt.spacing.name == t.spacing.name

    def test_stepping_dimension(self, pickle):
        t = TimeDimension(name='tst')
        s = SteppingDimension(name='tsd', parent=t)
        ns = _rt(pickle, s)
        assert ns.is_Stepping and ns.parent.name == 'tst'

    @pytest.mark.parametrize('mk', [
        lambda x: SubDimension.left('xl9', x, 3),
        lambda x: SubDimension.right('xr9', x, 4),
        lambda x: SubDimension.middle('xm9', x, 2, 5),
    ])
    def test_sub_dimension(self, pickle, mk):
        x = SpaceDimension(name='xsb')
        sd = mk(x)
        nsd = _rt(pickle, sd)
        assert nsd.parent.name == 'xsb'
        assert nsd.side == sd.side
        assert nsd.thickness == sd.thickness
        assert getattr(nsd, '_width', None) == getattr(sd, '_width', None)
        assert nsd.bounds(20) == sd.bounds(20)

    def test_conditional_dimension(self, pickle):
        t = TimeDimension(name='tcd9')
        cd = ConditionalDimension(name='tsub9', parent=t, factor=4)
        ncd = _rt(pickle, cd)
        assert ncd.parent.name == 't cd9'.replace(' ', '')
        assert ncd.factor == 4

    def test_conditional_dimension_condition(self, pickle):
        grid = Grid(shape=(5, 5))
        x, _ = grid.dimensions
        from devito_tpu import Gt
        cd = ConditionalDimension(name='cgt', parent=x,
                                  condition=Gt(x, 2))
        ncd = _rt(pickle, cd)
        assert str(ncd.condition) == str(cd.condition)

    def test_default_dimension(self, pickle):
        d = DefaultDimension(name='dd9', default_value=7)
        nd = _rt(pickle, d)
        assert nd._default_value == 7


class TestCarriers:
    """Reference: test_pickle.py test_function:115 (incl. on-SubDomain),
    test_constant:70, tensor rows."""

    def test_constant_dtype(self, pickle):
        c = Constant(name='cpk', value=2.5, dtype=np.float64)
        nc = _rt(pickle, c)
        assert float(nc.value) == 2.5 and nc.dtype == np.float64

    @pytest.mark.parametrize('on_sd', [False, True])
    def test_function(self, pickle, on_sd):
        grid = Grid(shape=(6, 6, 6))
        if on_sd:
            sd = SubDomain(name='sdpk', spec={'x': ('middle', 1, 1),
                                              'y': ('left', 4),
                                              'z': None}, grid=grid)
            f = Function(name='fpk', grid=sd, space_order=4)
        else:
            f = Function(name='fpk', grid=grid, space_order=4)
        f.data[0] = 1.
        nf = _rt(pickle, f)
        assert np.all(np.asarray(nf.data[0]) == 1.)
        assert nf.space_order == 4 and nf.dtype == f.dtype
        assert nf.shape == f.shape

    def test_function_staggered(self, pickle):
        grid = Grid(shape=(6, 6))
        x, y = grid.dimensions
        f = Function(name='fstg', grid=grid, staggered=x)
        nf = _rt(pickle, f)
        assert nf.staggered == f.staggered
        g = Function(name='gstg', grid=grid, staggered=NODE)
        assert _rt(pickle, g).staggered == g.staggered

    @pytest.mark.parametrize('save', [None, 12])
    def test_timefunction(self, pickle, save):
        grid = Grid(shape=(5, 5))
        u = TimeFunction(name='upk', grid=grid, time_order=2,
                         space_order=2, save=save)
        u.data[0, 2, 2] = 3.
        nu = _rt(pickle, u)
        assert nu.time_order == 2 and nu.save == save
        assert np.asarray(nu.data)[0, 2, 2] == 3.
        assert nu.shape == u.shape
        # fd shortcuts still usable post-unpickle
        assert str(nu.forward) == str(u.forward)
        assert str(nu.dt2.evaluate) == str(u.dt2.evaluate)

    def test_timefunction_buffer(self, pickle):
        grid = Grid(shape=(5, 5))
        u = TimeFunction(name='ubf', grid=grid, save=Buffer(4))
        nu = _rt(pickle, u)
        assert nu.shape[0] == u.shape[0] == 4

    def test_tensor_vector_functions(self, pickle):
        grid = Grid(shape=(5, 5))
        tau = TensorTimeFunction(name='taupk', grid=grid, space_order=2)
        v = VectorTimeFunction(name='vpk', grid=grid, space_order=2)
        nt_ = _rt(pickle, tau)
        nv = _rt(pickle, v)
        assert nt_.shape == tau.shape
        assert [c.name for c in nv] == [c.name for c in v]
        # staggering survives
        assert [c.staggered for c in nv] == [c.staggered for c in v]
        t2 = _rt(pickle, TensorFunction(name='tfpk', grid=grid))
        v2 = _rt(pickle, VectorFunction(name='vfpk', grid=grid))
        assert t2.is_TensorValued and v2.is_VectorValued


class TestSparse:
    """Reference: test_pickle.py test_sparse_function:137,
    test_precomputed_sparse_function:160, test_sparse_op:241."""

    @pytest.mark.parametrize('interp', ['linear', 'sinc'])
    def test_sparse_function(self, pickle, interp):
        grid = Grid(shape=(7, 7), extent=(6., 6.))
        kw = {'r': 3} if interp == 'sinc' else {}
        sf = SparseFunction(name='sfpk', grid=grid, npoint=3,
                            coordinates=[(0., 0.), (1., 2.), (3., 3.)],
                            interpolation=interp, **kw)
        sf.data[0] = 1.
        nsf = _rt(pickle, sf)
        assert np.all(np.asarray(nsf.data)[0] == 1.)
        assert nsf.interpolation == interp
        assert np.all(np.asarray(nsf.coordinates.data) ==
                      np.asarray(sf.coordinates.data))
        assert nsf.npoint == 3 and nsf.dtype == sf.dtype

    def test_sparse_time_function(self, pickle):
        grid = Grid(shape=(7, 7), extent=(6., 6.))
        sf = SparseTimeFunction(name='stpk', grid=grid, npoint=2, nt=9,
                                coordinates=[(1., 1.), (4., 4.)])
        sf.data[3, 1] = 5.
        nsf = _rt(pickle, sf)
        assert np.asarray(nsf.data)[3, 1] == 5.
        assert nsf.shape == sf.shape

    def test_precomputed_sparse(self, pickle):
        grid = Grid(shape=(11, 11), extent=(10., 10.))
        rng = np.random.RandomState(7)
        sf = PrecomputedSparseTimeFunction(
            name='ppk', grid=grid, r=2, npoint=3, nt=5,
            gridpoints=[(0, 0), (6, 6), (8, 3)],
            interpolation_coeffs=rng.randn(3, 2, 2))
        sf.data[2, 1] = 5.
        nsf = _rt(pickle, sf)
        assert np.asarray(nsf.data)[2, 1] == 5.
        assert np.all(nsf.gridpoints == sf.gridpoints)
        assert np.allclose(np.asarray(nsf.interpolation_coeffs),
                           np.asarray(sf.interpolation_coeffs))

    def test_matrix_sparse(self, pickle):
        grid = Grid(shape=(9, 9), extent=(8., 8.))
        mat = np.zeros((3, 2))
        mat[0, 0] = mat[2, 1] = 1.
        sf = MatrixSparseTimeFunction(name='mpk', grid=grid, r=2, nt=6,
                                      matrix=mat)
        nsf = _rt(pickle, sf)
        assert np.all(np.asarray(nsf.matrix) == mat)

    @pytest.mark.parametrize('op', ['inject', 'interpolate'])
    def test_sparse_op(self, pickle, op):
        grid = Grid(shape=(7, 7), extent=(6., 6.))
        u = Function(name='uso', grid=grid, space_order=2)
        sf = SparseFunction(name='sopk', grid=grid, npoint=2,
                            coordinates=[(1., 1.), (4., 4.)])
        expr = sf.inject(field=u, expr=sf) if op == 'inject' \
            else sf.interpolate(expr=u)
        nexpr = _rt(pickle, expr)
        assert repr(nexpr) == repr(expr)
        lo, nlo = expr._lower(), nexpr._lower()
        assert [type(e).__name__ for e in nlo] == \
               [type(e).__name__ for e in lo]
        assert [str(getattr(e, 'expr', e)) for e in nlo] == \
               [str(getattr(e, 'expr', e)) for e in lo]


class TestSymbolic:
    """Reference: test_pickle.py test_derivative:605, test_equation:625,
    test_collected_coeffs:820, test_symbolics:468."""

    @pytest.mark.parametrize('transpose', [False, True])
    @pytest.mark.parametrize('side', [None, 'left', 'right'])
    @pytest.mark.parametrize('deriv_order', [1, 2])
    def test_derivative(self, pickle, transpose, side, deriv_order):
        grid = Grid(shape=(8, 8))
        x, _ = grid.dimensions
        u = TimeFunction(name='udv', grid=grid, time_order=2,
                         space_order=4)
        kw = {'fd_order': 2, 'deriv_order': deriv_order}
        if side is not None:
            kw['side'] = side
        d = Derivative(u, x, **kw)
        if transpose:
            d = d.T
        nd = _rt(pickle, d)
        assert str(nd) == str(d)
        assert str(nd.evaluate) == str(d.evaluate)

    def test_derivative_x0(self, pickle):
        grid = Grid(shape=(8, 8))
        x, _ = grid.dimensions
        u = Function(name='ux0', grid=grid, space_order=4)
        d = u.dx(x0=x + x.spacing / 2)
        nd = _rt(pickle, d)
        assert str(nd.evaluate) == str(d.evaluate)

    def test_equation_kinds(self, pickle):
        grid = Grid(shape=(8, 8))
        u = TimeFunction(name='ueq', grid=grid, time_order=2,
                         space_order=2)
        f = Function(name='feq', grid=grid)
        for eq in (Eq(u.forward, u.laplace + 1.),
                   Inc(f, u * u),
                   ReduceMax(f, u), ReduceMin(f, u)):
            neq = _rt(pickle, eq)
            assert type(neq).__name__ == type(eq).__name__
            assert str(neq.evaluate) == str(eq.evaluate)

    def test_eq_subdomain(self, pickle):
        grid = Grid(shape=(8, 8))
        sd = SubDomain(name='sdeq', spec={'x': ('middle', 2, 2),
                                          'y': None}, grid=grid)
        u = Function(name='usd9', grid=grid)
        eq = Eq(u, u + 1, subdomain=sd)
        neq = _rt(pickle, eq)
        assert neq.subdomain.name == 'sdeq'
        assert str(_rt(pickle, neq)) == str(eq)

    def test_coefficient_substitutions(self, pickle):
        grid = Grid(shape=(8,))
        x, = grid.dimensions
        u = Function(name='ucf', grid=grid, space_order=2)
        w = np.array([-0.6, 0.1, 0.6])
        c = Coefficient(1, u, x, w)
        subs = Substitutions(c)
        nsubs = _rt(pickle, subs)
        nc = nsubs.coefficients[0]
        assert np.all(np.asarray(nc.weights) == w)
        assert nc.deriv_order == 1 and nc.dimension.name == 'x'

    def test_spacing_and_indexed(self, pickle):
        grid = Grid(shape=(6, 6), extent=(5., 5.))
        x, y = grid.dimensions
        assert _rt(pickle, x.spacing).name == x.spacing.name
        u = Function(name='uix', grid=grid)
        idx = u.indexify()
        nidx = _rt(pickle, idx)
        assert str(nidx) == str(idx)


class TestGridsAndApplications:
    """Reference: test_pickle.py test_geometry:701, test_full_model:991,
    test_receiver:583."""

    def test_grid(self, pickle):
        grid = Grid(shape=(6, 8), extent=(10., 14.), origin=(1., 2.))
        ng = _rt(pickle, grid)
        assert ng.shape == grid.shape
        assert ng.extent == grid.extent
        assert ng.origin_map == grid.origin_map
        assert [d.name for d in ng.dimensions] == \
               [d.name for d in grid.dimensions]
        assert ng.dtype == grid.dtype

    def test_grid_with_subdomains(self, pickle):
        sd = SubDomain(name='sdg', spec={'x': ('left', 2), 'y': None})
        grid = Grid(shape=(8, 8), subdomains=(sd,))
        ng = _rt(pickle, grid)
        names = set(ng.subdomains)
        assert {'sdg', 'domain', 'interior'} <= names
        nsd = ng.subdomains['sdg']
        assert nsd.bounds() == grid.subdomains['sdg'].bounds()

    def test_geometry(self, pickle):
        from devito_tpu.models.seismic import acoustic_setup
        solver = acoustic_setup(shape=(16, 16), spacing=(10., 10.),
                                tn=60., nbl=4, space_order=2)
        geom = solver.geometry
        ngeom = _rt(pickle, geom)
        assert ngeom.nt == geom.nt and ngeom.f0 == geom.f0
        assert np.allclose(np.asarray(ngeom.src_positions),
                           np.asarray(geom.src_positions))
        assert np.allclose(np.asarray(ngeom.rec_positions),
                           np.asarray(geom.rec_positions))
        src = ngeom.src
        assert np.allclose(np.asarray(src.data),
                           np.asarray(geom.src.data))

    def test_full_model(self, pickle):
        from devito_tpu.models.seismic.model import SeismicModel
        shape = (12, 12)
        vp = np.full(shape, 1.5, dtype=np.float32)
        vp[:, 6:] = 2.5
        model = SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                             shape=shape, space_order=2, vp=vp, nbl=3,
                             bcs='damp')
        nmodel = _rt(pickle, model)
        assert nmodel.shape == model.shape
        assert abs(nmodel.critical_dt - model.critical_dt) < 1e-12
        assert np.allclose(np.asarray(nmodel.vp.data),
                           np.asarray(model.vp.data))
        assert np.allclose(np.asarray(nmodel.damp.data),
                           np.asarray(model.damp.data))

    def test_receiver_rerun(self, pickle):
        """A pickled receiver's data and coordinates feed a fresh
        Operator run (reference test_receiver:583)."""
        from devito_tpu.models.seismic.source import Receiver
        from devito_tpu.models.seismic import acoustic_setup
        solver = acoustic_setup(shape=(16, 16), spacing=(10., 10.),
                                tn=60., nbl=4, space_order=2)
        rec, _, _ = solver.forward()
        nrec = _rt(pickle, rec)
        assert isinstance(nrec, Receiver) or type(nrec).__name__ in (
            'Receiver', 'PointSource', 'SparseTimeFunction')
        assert np.allclose(np.asarray(nrec.data), np.asarray(rec.data))
        assert np.allclose(np.asarray(nrec.coordinates.data),
                           np.asarray(rec.coordinates.data))


class TestOperators:
    """Reference: test_pickle.py test_unjitted_operator:747,
    test_operator_function[_w_preallocation]:758, test_usave_sampled:1055,
    test_operator_parameters:737."""

    def test_unjitted_operator(self, pickle):
        grid = Grid(shape=(10, 10), extent=(9., 9.))
        u = TimeFunction(name='uuj', grid=grid, time_order=2,
                         space_order=2)
        op = Operator(Eq(u.forward,
                         solve(u.dt2 - u.laplace, u.forward)),
                      subs=grid.spacing_map)
        # never applied — pickles before any jit
        nop = _rt(pickle, op)
        u.data[0, 5, 5] = 1.
        nop.apply(uuj=u, time_M=3, dt=0.1)
        assert np.isfinite(np.asarray(u.data)).all()
        assert np.abs(np.asarray(u.data)).max() > 0

    def test_operator_parameters(self, pickle):
        grid = Grid(shape=(10, 10), extent=(9., 9.))
        u = TimeFunction(name='upar', grid=grid, time_order=2,
                         space_order=2)
        c = Constant(name='cpar', value=0.5)
        op = Operator(Eq(u.forward, u + c), subs=grid.spacing_map)
        nop = _rt(pickle, op)
        known = set(nop._known_arguments())
        assert {'upar', 'cpar'} <= known
        nop.apply(upar=u, cpar=2.0, time_M=0, dt=0.1)
        assert np.all(np.asarray(u.data)[1] == 2.0)

    @pytest.mark.parametrize('prealloc', [False, True])
    def test_operator_function(self, pickle, prealloc):
        grid = Grid(shape=(8, 8))
        f = Function(name='fop9', grid=grid)
        op = Operator(Eq(f, f + 1.5))
        if prealloc:
            op.apply()
            assert np.all(np.asarray(f.data) == 1.5)
        nop = _rt(pickle, op)
        nop.apply(fop9=f)
        expect = 3.0 if prealloc else 1.5
        assert np.all(np.asarray(f.data) == expect)

    @pytest.mark.parametrize('prealloc', [False, True])
    def test_operator_timefunction(self, pickle, prealloc):
        grid = Grid(shape=(8, 8))
        u = TimeFunction(name='utf9', grid=grid, save=10)
        op = Operator(Eq(u.forward, u + 1.))
        if prealloc:
            op.apply(time_M=4)
        nop = _rt(pickle, op)
        start = 5 if prealloc else 0
        nop.apply(utf9=u, time_m=start, time_M=8)
        assert np.all(np.asarray(u.data)[9] == 9.)

    def test_usave_sampled(self, pickle):
        """Subsampled-save operator (ConditionalDimension factor)
        round-trips and reproduces the snapshot stream."""
        grid = Grid(shape=(8, 8))
        time = grid.time_dim
        factor = 3
        tsub = ConditionalDimension('tsub9', parent=time, factor=factor)
        u = TimeFunction(name='uus', grid=grid, time_order=2)
        usave = TimeFunction(name='usave9', grid=grid, time_dim=tsub,
                             save=4)
        op = Operator([Eq(u.forward, u + 1.), Eq(usave, u)])
        nop = _rt(pickle, op)
        nop.apply(uus=u, usave9=usave, time_M=9, dt=1)
        ref_op = Operator([Eq(u.forward, u + 1.), Eq(usave, u)])
        u2 = TimeFunction(name='uus', grid=grid, time_order=2)
        us2 = TimeFunction(name='usave9', grid=grid, time_dim=tsub,
                           save=4)
        ref_op.apply(uus=u2, usave9=us2, time_M=9, dt=1)
        assert np.array_equal(np.asarray(usave.data),
                              np.asarray(us2.data))

    def test_operator_double_roundtrip(self, pickle):
        """pickle(pickle(op)) — guards stateful __getstate__ mutations."""
        grid = Grid(shape=(8, 8))
        u = TimeFunction(name='udr', grid=grid, time_order=2,
                         space_order=2)
        op = Operator(Eq(u.forward,
                         solve(u.dt2 - u.laplace, u.forward)),
                      subs=grid.spacing_map)
        op2 = _rt(pickle, _rt(pickle, op))
        u.data[0, 4, 4] = 1.
        op2.apply(udr=u, time_M=2, dt=0.1)
        assert np.isfinite(np.asarray(u.data)).all()
