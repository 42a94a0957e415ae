"""MatrixSparseTimeFunction: matrix-coupled multi-location sources.

Reference parity: devito/types/sparse.py MatrixSparseTimeFunction:1399
(dipole injection; channels = M^T @ location samples).
"""

import numpy as np

from devito_tpu import Grid, TimeFunction, Operator
from devito_tpu.types.sparse import MatrixSparseTimeFunction


def _make(grid, name, M):
    x, y = grid.dimensions
    msf = MatrixSparseTimeFunction(name=name, grid=grid, npoint=1, nt=5,
                                   matrix=M, r=2,
                                   gridpoints=[[3, 3], [6, 6]])
    msf.interpolation_coefficients[x][:] = [[1.0, 0.0], [0.5, 0.5]]
    msf.interpolation_coefficients[y][:] = [[1.0, 0.0], [1.0, 0.0]]
    return msf


def test_matrix_sparse_inject_interpolate():
    g = Grid(shape=(11, 11), extent=(10., 10.))
    M = np.array([[1.0], [-1.0]])

    u = TimeFunction(name='u', grid=g, space_order=2)
    src = _make(g, 'src', M)
    src.data[:] = 2.0
    src.manual_scatter()
    Operator([src.inject(field=u.forward, expr=src)]).apply(
        time_m=0, time_M=0, dt=1.0)
    d = np.asarray(u.data[1])
    assert d[3, 3] == 2.0
    assert d[6, 6] == -1.0 and d[7, 6] == -1.0

    u2 = TimeFunction(name='u2', grid=g, space_order=2)
    u2.data[:] = np.arange(11)[None, :, None] * 1.0
    rec = _make(g, 'rec', M)
    Operator([rec.interpolate(expr=u2)]).apply(time_m=0, time_M=1, dt=1.0)
    assert np.isclose(rec.data[0, 0], 3.0 - 6.5)
