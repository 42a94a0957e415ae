"""Tests for the misc example suites: linear algebra contractions,
Black-Scholes, and the extended CFD set (reference: examples/misc/linalg.py,
examples/finance/bs_ivbp.ipynb, examples/cfd notebooks 02/05/07/08/09)."""

import numpy as np
import pytest

from devito_tpu import Function, Inc, Operator, dimensions
from examples.linalg import (mat_vec, transpose_mat_vec, mat_mat,
                             mat_mat_sum, chain_contractions)
from examples.cfd import (nonlinear_convection, laplace, cavity_flow,
                          shallow_water, darcy_flow)


class TestLinalg:
    def _mats(self, n=6):
        i, j, k, l = dimensions('i j k l')
        rng = np.random.default_rng(0)

        def mk(name, dims):
            f = Function(name=name, shape=(n,) * len(dims), dimensions=dims,
                         dtype=np.float64)
            f.data[:] = rng.standard_normal(f.data.shape)
            return f
        return mk, (i, j, k, l)

    def test_mat_vec(self):
        mk, (i, j, k, l) = self._mats()
        A, x, b = mk('A', (i, j)), mk('x', (j,)), mk('b', (i,))
        b.data[:] = 0.
        mat_vec(A, x, b)
        assert np.allclose(b.data, np.asarray(A.data) @ np.asarray(x.data),
                           rtol=1e-6)

    def test_transpose_mat_vec(self):
        mk, (i, j, k, l) = self._mats()
        A, x, b = mk('A', (i, j)), mk('x', (j,)), mk('b', (i,))
        b.data[:] = 0.
        transpose_mat_vec(A, x, b)
        assert np.allclose(b.data, np.asarray(A.data).T @ np.asarray(x.data),
                           rtol=1e-6)

    def test_mat_mat(self):
        mk, (i, j, k, l) = self._mats()
        A, B, C = mk('A', (i, j)), mk('B', (j, k)), mk('C', (i, k))
        C.data[:] = 0.
        mat_mat(A, B, C)
        assert np.allclose(C.data, np.asarray(A.data) @ np.asarray(B.data),
                           rtol=1e-6)

    def test_mat_mat_sum(self):
        mk, (i, j, k, l) = self._mats()
        A, B, C, D = (mk('A', (i, j)), mk('B', (j, k)), mk('C', (j, k)),
                      mk('D', (i, k)))
        D.data[:] = 0.
        mat_mat_sum(A, B, C, D)
        an, bn, cn = (np.asarray(f.data) for f in (A, B, C))
        assert np.allclose(D.data, an @ bn + an @ cn, rtol=1e-6)

    def test_chain_contractions(self):
        mk, (i, j, k, l) = self._mats()
        A, B, C = mk('A', (i, j)), mk('B', (j, k)), mk('C', (j, k))
        D, E, F = mk('D', (i, k)), mk('E', (k, l)), mk('F', (i, l))
        D.data[:] = 0.
        F.data[:] = 0.
        chain_contractions(A, B, C, D, E, F)
        an, bn, cn, en = (np.asarray(f.data) for f in (A, B, C, E))
        dn = an @ bn + an @ cn
        assert np.allclose(D.data, dn, rtol=1e-6)
        assert np.allclose(F.data, dn @ en, rtol=1e-5)


class TestBlackScholes:
    def test_matches_closed_form(self):
        from examples.finance import black_scholes, call_value_bs
        v, s_axis, nt = black_scholes(tmax=0.5, dt0=0.002)
        # compare mid-region against the closed form at t=0.5 to expiry
        sl = slice(20, -20)
        truth = call_value_bs(s_axis[sl], 100.0, 0.5, 0.12, 0.1)
        approx = np.asarray(v.data)[nt - 1][sl]
        rms = np.sqrt(np.mean((truth - approx) ** 2))
        assert rms < 0.1, f"Black-Scholes RMS vs closed form: {rms}"


class TestCfdExtended:
    def test_nonlinear_convection(self):
        u, v = nonlinear_convection(nt=40)
        d = np.asarray(u.data)[0]
        assert np.isfinite(d).all()
        # boundaries pinned at 1, hat advected inside
        assert np.allclose(d[0, :], 1.) and np.allclose(d[:, 0], 1.)
        assert d.max() > 1.5

    def test_laplace(self):
        p = laplace(niter=400)
        d = np.asarray(p.data)
        assert np.isfinite(d).all()
        # Dirichlet edges: p(0, y) = 0, p(nx-1, y) = linspace(0, 1)
        assert np.allclose(d[0, 1:], 0., atol=1e-6)
        # corners belong to the Neumann updates (list order, as in the
        # reference notebook), so compare from index 1
        assert np.allclose(d[-1, 1:-1], np.linspace(0, 1, d.shape[1])[1:-1],
                           atol=1e-6)
        # converged interior stays between the Dirichlet extremes
        assert d.min() > -1e-6 and d.max() < 1. + 1e-6

    def test_cavity_flow(self):
        u, v, p = cavity_flow(nx=21, ny=21, nt=200)
        du = np.asarray(u.data)[0]
        assert np.isfinite(du).all()
        # the moving lid drives the top row
        assert np.allclose(du[:, -1], 1.)
        assert np.abs(du[:, :-1]).max() < 1.  # interior slower than lid
        # circulation developed: some negative u in the interior
        assert du.min() < -1e-3

    def test_shallow_water(self):
        eta, M, N = shallow_water(nx=51, ny=51, nt=100)
        d = np.asarray(eta.data)[0]
        assert np.isfinite(d).all()
        # wave spread out: peak decayed from initial 2.0
        assert 0.01 < d.max() < 2.0

    def test_darcy(self):
        u, a = darcy_flow(n=32, niter=800)
        d = np.asarray(u.data)[0]
        assert np.isfinite(d).all()
        assert np.allclose(d[0, :], 0.) and np.allclose(d[:, -1], 0.)
        # source drives a positive interior pressure
        assert d.max() > 1e-4


class TestCompilerTour:
    """examples/compiler_tour.py (reference: examples/compiler 00-04
    notebooks — lowering + generated-code introspection)."""

    def test_lowering_tour(self):
        from examples.compiler_tour import lowering_tour
        evaluated, items = lowering_tour()
        # the evaluated form carries the expanded laplace taps
        assert 'h_x' in evaluated and 'h_y' in evaluated
        assert len(items) == 1
        it = items[0]
        assert it.target.name == 'u' and it.time_kind == 'stepping'

    def test_introspection_tour(self):
        from examples.compiler_tour import introspection_tour
        jaxpr, hlo = introspection_tour()
        assert 'while' in jaxpr          # the fori time loop
        assert 'func.func' in hlo or 'HloModule' in hlo
