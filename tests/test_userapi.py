"""User-API walkthrough suite (reference: examples/userapi notebooks
00-09, executed as tests in the reference CI — tutorials.yaml)."""

import numpy as np

from examples import userapi


def test_dsl_overview():
    u = userapi.dsl_overview()
    assert np.isfinite(np.asarray(u.data)).all()
    assert np.asarray(u.data).max() > 0


def test_apply_and_arguments():
    u, w, summary = userapi.apply_and_arguments()
    assert np.asarray(u.data).max() == 5.
    assert np.asarray(w.data).max() == 10.
    assert summary.globals['fdlike'].time > 0


def test_subdomains():
    f, g = userapi.subdomains_demo()
    fd, gd = np.asarray(f.data), np.asarray(g.data)
    assert fd[8, 8] == 1. and fd[0, 0] == 0.
    assert gd[:8].min() == 2. and gd[8:].max() == 0.


def test_boundary_conditions():
    u = userapi.boundary_conditions_demo()
    d = np.asarray(u.data)[0]
    assert np.allclose(d[0, 1:], 1.)
    assert np.isfinite(d).all()


def test_conditional_dimension():
    usave = userapi.conditional_dimension_demo()
    d = np.asarray(usave.data)
    for k in range(4):
        assert np.allclose(d[k], 5 * k)


def test_sparse_operations():
    vals, g = userapi.sparse_operations_demo()
    # f = x + y sampled at the points
    assert np.allclose(vals, [11., 20., 0.5], atol=1e-6)
    # injection scatter-adds unit weight partitions
    assert np.isclose(float(np.asarray(g.data).sum()), 3., atol=1e-6)


def test_staggered_interpolation():
    own, b = userapi.staggered_interpolation_demo()
    assert 'h_x' in str(own)


def test_fd_evaluation():
    out = userapi.fd_evaluation_demo()
    # so8 first derivative: 8 taps; fd_order=2 demotes to 2-point
    assert out['dx_so8'].count('f(') == 8
    assert out['dx_order2'].count('f(') == 2
    assert out['dx_left'] != out['dx_right']
    assert out['dx_T'] != out['dx_so8']


def test_compiler_tour():
    """Compiler-internals walkthrough (reference: examples/compiler
    notebooks — here: evaluated equations, schedule, jaxpr, HLO)."""
    from examples.compiler_tour import lowering_tour, introspection_tour
    evaluated, items = lowering_tour()
    assert 'h_x' in evaluated
    assert len(items) == 1 and items[0].kind == 'dense'
    jaxpr, hlo = introspection_tour()
    assert 'while' in jaxpr or 'scan' in jaxpr or 'lambda' in jaxpr
    assert 'module' in hlo and 'func' in hlo  # StableHLO text
