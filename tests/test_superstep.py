"""Superstepping: k combined steps equal k individual steps.

Reference parity: devito/timestepping/superstep.py (binary-decomposition
superstep generator).
"""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
from devito_tpu.timestepping import (superstep_generator,
                                     superstep_solution_transfer)


@pytest.mark.parametrize('k', [1, 2, 3, 4])
def test_superstep_equals_k_steps(k):
    g = Grid(shape=(41, 41), extent=(40., 40.), dtype=np.float64)
    x = np.arange(41)
    gauss = np.exp(-((x[:, None] - 20) ** 2 +
                     (x[None, :] - 20) ** 2) / 20.)

    u = TimeFunction(name='u', grid=g, time_order=2, space_order=2)
    st = solve(u.dt2 - 0.2 * u.laplace, u.forward).subs(
        g.spacing_map).subs({g.time_dim.spacing: 0.3})
    u.data[0] = gauss
    u.data[1] = gauss
    Operator(Eq(u.forward, st)).apply(time_m=1, time_M=k, dt=0.3)
    ref = np.array(u.data[(k + 1) % 3])

    u2 = TimeFunction(name='w', grid=g, time_order=2, space_order=2)
    u2.data[0] = gauss
    u2.data[1] = gauss
    st2 = solve(u2.dt2 - 0.2 * u2.laplace, u2.forward).subs(
        g.spacing_map).subs({g.time_dim.spacing: 0.3})
    uss, ussp, eq1, eq2 = superstep_generator(u2, st2, k, nt=1)
    Operator([eq1, eq2]).apply(time_m=1, time_M=1, dt=0.3)
    got = np.array(uss.data[2])
    assert np.abs(got - ref).max() < 1e-10
