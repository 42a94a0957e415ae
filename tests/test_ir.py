"""Dependence analysis / scheduling semantics.

Reference parity: tests/test_ir.py (Scope/dependence assertions over
lowered expressions, ir/support/basic.py:870) + the clusterize ordering
semantics (ir/clusters/algorithms.py:29).
"""

import numpy as np
import pytest

from devito_tpu import (Grid, TimeFunction, Function, Eq, Operator, solve)
from devito_tpu.ir.lowering import lower_expressions
from devito_tpu.ir.support import Scope, validate_directions
from devito_tpu.exceptions import InvalidOperator


def _scope(exprs, subs=None):
    sched = lower_expressions(exprs, subs=subs)
    return Scope(sched.body or sched.all_items)


@pytest.fixture
def ctx():
    grid = Grid(shape=(12, 12), extent=(11., 11.))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    v = TimeFunction(name='v', grid=grid, space_order=2)
    f = Function(name='f', grid=grid)
    return grid, u, v, f


def test_flow_dep_same_step(ctx):
    """v reads u.forward after u.forward is written: flow dependence,
    time-distance 0 (not loop-carried)."""
    grid, u, v, f = ctx
    scope = _scope([Eq(u.forward, u + 1), Eq(v.forward, u.forward)])
    cross = [d for d in scope.d_flow if d.function.name == 'u'
             and d.source.item_index != d.sink.item_index]
    assert cross and all(d.distance[0] == 0 for d in cross)
    assert not scope.independent(0, 1)


def test_anti_dep_program_order(ctx):
    """u.forward read before written (reader first in program order):
    anti dependence — the reader sees the previous iteration's value and
    the order must be preserved."""
    grid, u, v, f = ctx
    scope = _scope([Eq(v.forward, u.forward), Eq(u.forward, u + 1)])
    antis = [d for d in scope.d_anti if d.function.name == 'u']
    assert antis
    assert not scope.independent(0, 1)


def test_carried_flow_dep(ctx):
    """u.forward = f(u): flow dependence carried by the time loop
    (distance 1 in t)."""
    grid, u, v, f = ctx
    scope = _scope([Eq(u.forward, u + u.dx)])
    carried = [d for d in scope.d_flow if d.is_carried]
    assert carried and carried[0].distance[0] == 1


def test_output_dep(ctx):
    grid, u, v, f = ctx
    scope = _scope([Eq(u.forward, u + 1), Eq(u.forward, u + 2)])
    assert scope.d_output
    assert not scope.independent(0, 1)


def test_independent_equations(ctx):
    grid, u, v, f = ctx
    scope = _scope([Eq(u.forward, u + 1), Eq(v.forward, v * 2)])
    assert scope.independent(0, 1)
    # only loop-carried self dependences remain
    assert all(d.source.item_index == d.sink.item_index for d in scope.d_all)


def test_space_shift_dep_distance(ctx):
    """v reads u.forward at x+1: dependence with space distance 1."""
    grid, u, v, f = ctx
    x, y = grid.dimensions
    scope = _scope([Eq(u.forward, u + 1),
                    Eq(v.forward, u.forward.subs(x, x + 1))])
    flows = [d for d in scope.d_flow if d.function.name == 'u'
             and d.distance[0] == 0]
    assert flows and flows[0].distance[1] == -1  # sink reads ahead


def test_static_then_timedep_dep(ctx):
    """f computed once then read in the loop: flow dependence from the
    prologue into the body (reference: Lift semantics)."""
    grid, u, v, f = ctx
    sched = lower_expressions([Eq(f, 3.0), Eq(u.forward, u + f)])
    assert len(sched.prologue) == 1 and len(sched.body) == 1
    scope = Scope(sched.all_items)
    assert any(d.is_flow and d.function.name == 'f' for d in scope.d_all)


def test_permuted_independent_equal_results(ctx):
    """The permutation property: reordering independent equations leaves
    the computed wavefields identical (reference: toposort
    normalization, clusterize)."""
    grid = Grid(shape=(12, 12), extent=(11., 11.))

    def run(order):
        u = TimeFunction(name='u', grid=grid, space_order=2)
        v = TimeFunction(name='v', grid=grid, space_order=2)
        u.data[0, 6, 6] = 1.0
        v.data[0, 3, 3] = 1.0
        eqs = [Eq(u.forward, 0.5 * u + 0.1 * u.laplace),
               Eq(v.forward, 0.6 * v + 0.1 * v.laplace)]
        op = Operator([eqs[i] for i in order], subs=grid.spacing_map)
        op.apply(time_M=4, dt=1.0)
        return np.asarray(u.data), np.asarray(v.data)

    ua, va = run([0, 1])
    ub, vb = run([1, 0])
    assert np.array_equal(ua, ub) and np.array_equal(va, vb)


def test_dependent_order_is_semantic(ctx):
    """Flow vs anti order changes results (and must: the reader sees the
    new value after the writer, the old value before — reference lifted
    schedule semantics)."""
    grid = Grid(shape=(8, 8), extent=(7., 7.))

    def run(flow_first):
        u = TimeFunction(name='u', grid=grid)
        v = TimeFunction(name='v', grid=grid)
        u.data[0] = 1.0
        eqs = [Eq(u.forward, u + 1), Eq(v.forward, u.forward * 2)]
        if not flow_first:
            eqs = eqs[::-1]
        op = Operator(eqs)
        op.apply(time_M=0, dt=1.0)
        return np.asarray(v.data[1])

    after = run(True)    # v = 2*(u+1) = 4
    before = run(False)  # v = 2*old u.forward = 0
    assert after.max() == 4.0 and before.max() == 0.0


def test_mixed_time_flow_rejected(ctx):
    grid, u, v, f = ctx
    with pytest.raises(InvalidOperator):
        Operator([Eq(u.forward, u + 1), Eq(v.backward, v + u)])


def test_inject_read_write_dep(ctx):
    """Injection both reads and writes the field: dependences with the
    dense update are detected."""
    from devito_tpu import SparseTimeFunction
    grid, u, v, f = ctx
    src = SparseTimeFunction(name='src', grid=grid, npoint=1, nt=4,
                             coordinates=[[5., 5.]])
    sched = lower_expressions([Eq(u.forward, u + 1),
                               src.inject(field=u.forward, expr=src)])
    scope = Scope(sched.body)
    assert any(d.function.name == 'u' for d in scope.d_all)
    assert not scope.independent(0, 1)


def test_disjoint_subdimension_writes_independent(ctx):
    """Two writes to provably disjoint SubDimension strips carry NO
    dependence (reference disjoint_test, ir/support/basic.py:1498) —
    round-1 registered a spurious output dependence, keeping BC-strip
    scheduling maximally conservative."""
    from devito_tpu import SubDimension
    grid, u, v, f = ctx
    x, y = grid.dimensions
    xl = SubDimension.left(name='xl', parent=x, thickness=3)
    xr = SubDimension.right(name='xr', parent=x, thickness=3)
    scope = _scope([Eq(u.forward, u + 1).subs(x, xl),
                    Eq(u.forward, u + 2).subs(x, xr)])
    assert not [d for d in scope.d_output
                if d.source.item_index != d.sink.item_index]
    assert scope.independent(0, 1)


def test_overlapping_subdimension_writes_dependent(ctx):
    """Overlapping strips keep their output dependence."""
    from devito_tpu import SubDimension
    grid, u, v, f = ctx
    x, y = grid.dimensions
    xl = SubDimension.left(name='xl', parent=x, thickness=7)
    xm = SubDimension.middle(name='xm', parent=x, thickness_left=3,
                             thickness_right=3)
    scope = _scope([Eq(u.forward, u + 1).subs(x, xl),
                    Eq(u.forward, u + 2).subs(x, xm)])
    assert [d for d in scope.d_output
            if d.source.item_index != d.sink.item_index]
    assert not scope.independent(0, 1)


def test_strip_write_full_read_dependent(ctx):
    """A full-domain read of a strip-written function intersects the
    strip: the flow dependence must survive the disjoint pruning."""
    from devito_tpu import SubDimension
    grid, u, v, f = ctx
    x, y = grid.dimensions
    xl = SubDimension.left(name='xl', parent=x, thickness=3)
    scope = _scope([Eq(u.forward, u + 1).subs(x, xl),
                    Eq(v.forward, u.forward + u.forward.dx)])
    cross = [d for d in scope.d_flow if d.function.name == 'u'
             and d.source.item_index != d.sink.item_index]
    assert cross
    assert not scope.independent(0, 1)


def test_disjoint_reads_of_strip_write(ctx):
    """A read whose taps stay outside the written strip is independent
    of the strip write."""
    from devito_tpu import SubDimension
    grid, u, v, f = ctx
    x, y = grid.dimensions
    xl = SubDimension.left(name='xl', parent=x, thickness=2)
    xr = SubDimension.right(name='xr', parent=x, thickness=2)
    # write u rows [0,2); read u rows [10,12) — no intersection
    scope = _scope([Eq(u.forward, u + 1).subs(x, xl),
                    Eq(v.forward, u.forward).subs(x, xr)])
    cross = [d for d in scope.d_all if d.function.name == 'u'
             and d.source.item_index != d.sink.item_index]
    assert not cross
    assert scope.independent(0, 1)


def test_spacing_subs_keep_double_precision():
    """grid.spacing_map carries grid-dtype (fp32) scalars; substituting
    them must NOT downgrade the FD-weight fold to 24-bit sympy floats —
    fp64/complex128 runs were receiving float32-rounded weights (e.g.
    4/3 -> 1.3333334; round-4 fix: ir/lowering.py _normalize_subs)."""
    import sympy
    import numpy as np
    from devito_tpu import Grid, TimeFunction, Eq, Operator

    grid = Grid(shape=(24, 24), extent=(23., 23.))  # default fp32 grid
    u = TimeFunction(name='u', grid=grid, dtype=np.float64,
                     time_order=2, space_order=4)
    op = Operator(Eq(u.forward, u.laplace), subs=grid.spacing_map)
    for leq in op._schedule.all_items:
        if not hasattr(leq, 'rhs'):
            continue
        for f in leq.rhs.atoms(sympy.Float):
            assert f._prec >= 53, (
                f"FD weight {f!r} folded below double precision")
        # the 4/3 weight is the fp64-exact value, not float32-rounded
        vals = {float(f) for f in leq.rhs.atoms(sympy.Float)}
        assert any(abs(v - 4.0 / 3.0) < 1e-15 for v in vals), vals
