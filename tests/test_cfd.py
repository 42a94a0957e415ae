"""CFD example problems vs NumPy references.

Reference parity: examples/cfd notebooks (convection, diffusion, Burgers,
Poisson) — the same discretizations validated numerically here.
"""

import sys
import os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from examples.cfd import linear_convection, diffusion, burgers, poisson


def test_linear_convection():
    u = linear_convection(nx=41, ny=41, nt=40)
    d = np.asarray(u.data)
    assert np.isfinite(d).all()
    # the hat advects diagonally without changing amplitude much
    assert 1.9 < d.max() <= 2.01
    # peak has moved diagonally from its initial center (15, 15)
    i, j = np.unravel_index(d[0].argmax(), d[0].shape)
    assert i > 18 and j > 18


def test_diffusion_decay():
    u = diffusion(nx=41, ny=41, nt=200)
    d = np.asarray(u.data[0])
    assert np.isfinite(d).all()
    # peak decays but stays above background
    assert 1.0 < d.max() < 2.0


def test_burgers_stable():
    u, v = burgers(nx=41, ny=41, nt=100)
    for f in (u, v):
        d = np.asarray(f.data)
        assert np.isfinite(d).all()
        assert d.max() <= 2.2


def test_poisson_converges():
    p, b = poisson(nx=30, ny=30, niter=500)
    d = np.asarray(p.data)
    # residual of the converged Jacobi iterate is small
    last, prev = d[500 % 2], d[(500 - 1) % 2]
    assert np.abs(last - prev).max() < 2e-4
    assert np.isfinite(d).all()
    # dipole source -> antisymmetric-ish solution with both signs
    assert last.max() > 0 and last.min() < 0
