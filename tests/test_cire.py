"""CIRE pass (ir/cire.py): extraction equivalence and scheduling.

Reference analog: tests/test_dse.py's CIRE sections — the reference
asserts op-counts of extracted aliases; here the contract is exactness
(the pass must be a pure scheduling transform) plus structural checks.
"""

import numpy as np
import pytest
import sympy

import devito_tpu
from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
from devito_tpu.finite_differences.derivative import Derivative


def _nested_op(names, cire):
    rng = np.random.default_rng(0)
    with devito_tpu.switchconfig(cire=cire):
        g = Grid(shape=(20, 20), extent=(19., 19.), dtype=np.float64)
        x, y = g.dimensions
        u = TimeFunction(name=names[0], grid=g, space_order=4)
        w = TimeFunction(name=names[1], grid=g, space_order=4)
        u.data[0] = rng.standard_normal((20, 20))
        inner = Derivative(u, x, fd_order=2,
                           x0={x: x + sympy.Rational(1, 2) * x.spacing})
        outer = Derivative(inner, x, fd_order=2,
                           x0={x: x - sympy.Rational(1, 2) * x.spacing})
        op = Operator([Eq(w.forward, outer), Eq(u.forward, u)])
        op.apply(time_M=3, dt=1.)
        return np.asarray(w.data).copy(), op


def test_nested_extraction_exact():
    """Nested Gzz-style derivative: CIRE result is bitwise-equal."""
    a, _ = _nested_op(('ua', 'wa'), cire=False)
    b, op = _nested_op(('ub', 'wb'), cire=True)
    assert np.array_equal(a, b) or np.abs(a - b).max() < 1e-13
    # a temporary was actually extracted and scheduled with a
    # halo-extended write region
    temps = [it for it in op._schedule.body
             if getattr(it, 'target', None) is not None
             and it.target.name.startswith('cire')]
    assert temps, "no CIRE temporary extracted"
    assert any(r[0] < 0 for r in temps[0].region)


def test_tti_centered_equivalence():
    """Whole TTI centered solver: identical receivers with/without CIRE
    (reference CIRE correctness contract, passes/clusters/aliases.py)."""
    from devito_tpu.models.seismic.tti import tti_setup

    def run(cire):
        with devito_tpu.switchconfig(cire=cire):
            s = tti_setup(shape=(40, 40), spacing=(20., 20.), tn=250.,
                          space_order=4, nbl=10, dtype=np.float64)
            rec, p, m, _ = s.forward()
            return np.asarray(rec.data).copy()

    a, b = run(False), run(True)
    assert np.allclose(a, b, rtol=1e-10, atol=1e-12)


def test_viscoacoustic_adjoint_with_cire():
    """sls-2 adjoint stays an exact transpose under CIRE (regression:
    temporaries must be scheduled after the body eq whose value they
    read — the adjoint's r.backward)."""
    from devito_tpu.models.seismic.viscoacoustic import viscoacoustic_setup
    s = viscoacoustic_setup(shape=(40, 40), spacing=(20., 20.), tn=300.,
                            space_order=4, nbl=10, kernel='sls',
                            time_order=2, dtype=np.float64)
    rec, p, v, _ = s.forward()
    srca = s.geometry.new_src(name='srca', src_type=None)
    s.adjoint(rec, srca=srca)
    term1 = float(np.sum(np.asarray(srca.data) *
                         np.asarray(s.geometry.src.data)))
    term2 = float(np.sum(np.asarray(rec.data) ** 2))
    assert np.isclose((term1 - term2) / term1, 0., atol=1e-11)


def test_staggered_uniform_lattice_extraction():
    """Elastic staggered system: groups shared across SAME-lattice
    consumers (diag(div(v)) in the three node diagonal stress equations)
    are extracted; mixed-lattice groups stay in place. Correctness is
    pinned by test_elastic_reference_norms."""
    from devito_tpu.models.seismic.elastic import elastic_setup
    s = elastic_setup(shape=(30, 30), spacing=(20., 20.), tn=200.,
                      space_order=4, nbl=10)
    op = s.op_fwd()
    temps = [it for it in op._schedule.body
             if getattr(it, 'target', None) is not None
             and it.target.name.startswith('cire')]
    assert temps, "expected the shared div(v) group to be extracted"


def test_acoustic_untouched():
    """No nested/shared derivatives: the pass is a no-op."""
    g = Grid(shape=(16, 16), extent=(15., 15.))
    u = TimeFunction(name='u', grid=g, time_order=2, space_order=4)
    op = Operator(Eq(u.forward, solve(u.dt2 - u.laplace, u.forward)),
                  subs=g.spacing_map)
    assert all(not (getattr(it, 'target', None) is not None
                    and it.target.name.startswith('cire'))
               for it in op._schedule.body)
