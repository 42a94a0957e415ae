"""SubDimension execution matrix (reference: tests/test_dimension.py
TestSubDimension — interior/domain interplay, classmethod constructors,
BC strips with intra-step dependencies). VERDICT r3 item 6."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator,
                        SubDimension)


def test_interior():
    """(reference: test_interior:264)."""
    grid = Grid(shape=(4, 4, 4))
    u = TimeFunction(name='u', grid=grid)
    op = Operator([Eq(u.forward, u + 2, subdomain=grid.interior)])
    op.apply(time_M=2, dt=1.)
    d = np.asarray(u.data)
    assert np.all(d[1, 1:-1, 1:-1, 1:-1] == 6.)
    assert np.all(d[1, :, 0] == 0.) and np.all(d[1, :, -1] == 0.)
    assert np.all(d[1, :, :, 0] == 0.) and np.all(d[1, :, :, -1] == 0.)


def test_domain_vs_interior():
    """Whole-domain eq + interior eq on the same target
    (reference: test_domain_vs_interior:286)."""
    grid = Grid(shape=(4, 4, 4))
    u = TimeFunction(name='u', grid=grid)
    op = Operator([Eq(u.forward, u + 1),
                   Eq(u.forward, u.forward + 2,
                      subdomain=grid.interior)])
    op.apply(time_M=1, dt=1.)
    d = np.asarray(u.data)
    for ax_slice in [(1, 0), (1, -1)]:
        assert np.all(d[ax_slice] == 1)
    assert np.all(d[1, :, 0, :] == 1) and np.all(d[1, :, -1, :] == 1)
    assert np.all(d[1, :, :, 0] == 1) and np.all(d[1, :, :, -1] == 1)
    assert np.all(d[1, 1:3, 1:3, 1:3] == 3)


def test_subdim_middle_subs():
    """eq.subs(x, xi) classmethod-constructed middle strip
    (reference: test_subdim_middle:315)."""
    grid = Grid(shape=(4, 4, 4))
    x, y, z = grid.dimensions
    u = TimeFunction(name='u', grid=grid)
    xi = SubDimension.middle(name='xi', parent=x,
                             thickness_left=1, thickness_right=1)
    eqs = [Eq(u.forward, u + 1).subs(x, xi)]
    op = Operator(eqs)
    u.data[:] = 1.0
    op.apply(time_M=1, dt=1.)
    d = np.asarray(u.data)
    assert np.all(d[1, 0] == 1) and np.all(d[1, -1] == 1)
    assert np.all(d[1, 1:3] == 2)


def test_bcs_strips_with_dependencies():
    """Left/right BC strips READING the centre's same-step write
    (reference: test_bcs:363 — the classic Dirichlet-extrapolation
    pattern)."""
    grid = Grid(shape=(20, 20))
    x, y = grid.dimensions
    t = grid.stepping_dim
    thickness = 4
    u = TimeFunction(name='u', save=None, grid=grid, space_order=0,
                     time_order=1)
    xleft = SubDimension.left(name='xleft', parent=x, thickness=thickness)
    xi = SubDimension.middle(name='xi', parent=x,
                             thickness_left=thickness,
                             thickness_right=thickness)
    xright = SubDimension.right(name='xright', parent=x,
                                thickness=thickness)
    yi = SubDimension.middle(name='yi', parent=y,
                             thickness_left=thickness,
                             thickness_right=thickness)
    eqs = [Eq(u[t + 1, xi, yi], 1),
           Eq(u[t + 1, xleft, yi], u[t + 1, xleft + 1, yi] + 1),
           Eq(u[t + 1, xright, yi], u[t + 1, xright - 1, yi] + 1)]
    op = Operator(eqs)
    op.apply(time_m=1, time_M=1, dt=1.)
    d = np.asarray(u.data)
    assert np.all(d[0, :, 0:thickness] == 0.)
    assert np.all(d[0, :, -thickness:] == 0.)
    for i in range(thickness):
        assert np.all(d[0, i, thickness:-thickness] == (thickness + 1 - i))
    for i in range(1, thickness + 1):
        assert np.all(d[0, -i, thickness:-thickness] == (thickness + 2 - i))
    assert np.all(d[0, thickness:-thickness, thickness:-thickness] == 1.)


def test_subdimension_sides_predicates():
    """is_left/is_middle/is_right predicates (reference:
    test_symbolic_size:343 subset)."""
    grid = Grid(shape=(4,))
    x, = grid.dimensions
    xl = SubDimension.left(name='xleft', parent=x, thickness=4)
    xi = SubDimension.middle(name='xi', parent=x, thickness_left=4,
                             thickness_right=4)
    xr = SubDimension.right(name='xright', parent=x, thickness=4)
    assert xl.side == 'left' and xi.side == 'middle' and xr.side == 'right'
    assert xl.local and xr.local and not xi.local
