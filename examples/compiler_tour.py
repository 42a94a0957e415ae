"""Compiler-internals tour: executable condensation of the reference's
``examples/compiler`` notebook series (00-04 — expression lowering,
IR inspection, generated-code introspection).

The reference inspects `op.ccode` / the IET; the TPU-native equivalents
are the lowered schedule, the jaxpr, and the XLA HLO.
"""

import numpy as np

from devito_tpu import Grid, TimeFunction, Eq, Operator, solve

__all__ = ['lowering_tour', 'introspection_tour']


def lowering_tour():
    """From user equation to schedule (reference: compiler/00-02):
    returns (evaluated equation string, schedule items)."""
    grid = Grid(shape=(16, 16), extent=(15., 15.))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    eq = Eq(u.forward, solve(Eq(u.dt, 0.5 * u.laplace), u.forward))

    # stage 1: symbolic evaluation (Derivative -> weighted taps)
    evaluated = eq.evaluate

    # stage 2: the Operator's lowered schedule (the single thin IR that
    # replaces the reference's LoweredEq/Cluster/ScheduleTree/IET stack)
    op = Operator(eq)
    items = list(op._schedule.body)
    return str(evaluated), items


def introspection_tour():
    """Generated-computation introspection (reference: op.ccode /
    cinterface -> here op.jaxpr() and op.hlo())."""
    grid = Grid(shape=(16, 16), extent=(15., 15.))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    op = Operator(Eq(u.forward, solve(Eq(u.dt, 0.5 * u.laplace),
                                      u.forward)))
    jaxpr = op.jaxpr(dt=0.001, time_M=2)
    hlo = op.hlo(dt=0.001, time_M=2)
    return str(jaxpr), str(hlo)
