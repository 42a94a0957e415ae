"""Pickle round-trips, including whole Operators re-run after unpickling
(reference: tests/test_pickle.py — pickled Operators re-run via the shipped
generated code; here the runner retraces from the pickled schedule)."""

import pickle

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator, solve,
                        Constant)
from devito_tpu.models.seismic import acoustic_setup


def _roundtrip(obj):
    return pickle.loads(pickle.dumps(obj))


def test_pickle_operator_rerun():
    grid = Grid(shape=(16, 16), extent=(15., 15.))
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=4)
    st = solve(u.dt2 - u.laplace, u.forward)
    op = Operator(Eq(u.forward, st), subs=grid.spacing_map)
    u.data[0, 8, 8] = 1.0
    op.apply(time_M=5, dt=0.1)
    ref = np.array(u.data)

    op2 = _roundtrip(op)
    u2 = TimeFunction(name='u', grid=grid, time_order=2, space_order=4)
    u2.data[0, 8, 8] = 1.0
    op2.apply(u=u2, time_M=5, dt=0.1)
    assert np.array_equal(np.array(u2.data), ref)


def test_pickle_operator_with_sparse():
    """An Operator with source injection + receiver interpolation survives
    pickling and reproduces the original receiver data."""
    solver = acoustic_setup(shape=(24, 24), spacing=[12.5, 12.5], nbl=4,
                            tn=80., space_order=4,
                            preset='layers-isotropic', dtype=np.float64)
    op = solver.op_fwd(False)
    rec, u, _ = solver.forward()
    ref = np.array(rec.data)

    op2 = _roundtrip(op)
    solver2 = acoustic_setup(shape=(24, 24), spacing=[12.5, 12.5], nbl=4,
                             tn=80., space_order=4,
                             preset='layers-isotropic', dtype=np.float64)
    from devito_tpu import TimeFunction as TF
    u2 = TF(name='u', grid=solver2.model.grid, time_order=2, space_order=4)
    rec2 = solver2.geometry.rec
    op2.apply(src=solver2.geometry.src, rec=rec2, u=u2,
              vp=solver2.model.vp, damp=solver2.model.damp,
              dt=solver2.dt)
    assert np.allclose(np.array(rec2.data), ref, rtol=1e-12, atol=1e-14)


def test_pickle_operator_preserves_metadata():
    grid = Grid(shape=(12, 12), extent=(11., 11.))
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=2)
    op = Operator(Eq(u.forward, solve(u.dt2 - u.laplace, u.forward)),
                  subs=grid.spacing_map, name='Pkl')
    op2 = _roundtrip(op)
    assert op2.name == 'Pkl'
    assert len(op2._schedule.body) == len(op._schedule.body)
    assert op2._flops_per_step == op._flops_per_step
    assert str(op2) == str(op)


def test_pickle_types_roundtrip():
    grid = Grid(shape=(10, 10), extent=(9., 9.))
    f = Function(name='f', grid=grid, space_order=2)
    f.data[:] = np.arange(100.).reshape(10, 10)
    f2 = _roundtrip(f)
    assert np.array_equal(f2.data, f.data)
    c = Constant(name='c', value=3.5)
    assert float(_roundtrip(c).value) == 3.5
