"""Apply-time autotuning (reference: devito/core/autotuning.py:19 —
preemptive-mode timing over candidate block shapes; here the searched
knobs are the runner formulation, the x-chunk slab target — the knob a
hand sweep measured worth +22% at 512^3 fp32, PERF_NOTES r4 — and, at
'aggressive', XLA scoped-VMEM budgets).

The timing loop itself needs a real TPU (``_autotune`` is a no-op on
the CPU backend, matching the reference's skip when no device exists);
what CAN be pinned anywhere is the candidate-set construction, the
chunk-knob probe, and that ``apply(autotune=...)`` stays green and
numerically inert on the CPU path.
"""

import numpy as np

from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve


def _acoustic_op(shape, so=8):
    grid = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape))
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=so)
    vp = Function(name='vp', grid=grid, space_order=so)
    m = 1 / (vp * vp)
    stencil = solve(m * u.dt2 - u.laplace, u.forward)
    return Operator(Eq(u.forward, stencil), subs=grid.spacing_map), u, vp


def test_candidates_small_grid_no_chunk_knob():
    """On a grid far below the chunk trigger the slab-target knob is
    inert and must not bloat the candidate set."""
    op, _, _ = _acoustic_op((48, 44, 40))
    assert not op._chunking_engages()
    labels = [c[0] for c in op._autotune_candidates('basic')]
    assert labels == ['default', 'phase', 'nophase', 'nostrips']


def test_candidates_large_grid_has_chunk_targets():
    """Past the trigger (metadata-only: buffers stay unallocated) the
    tuner searches slab targets bracketing the measured optima (52 MB
    fp32 / 64 MB bf16 — PERF_NOTES r4), replacing the hand-frozen
    constants."""
    op, _, _ = _acoustic_op((512, 512, 512))
    assert op._chunking_engages()
    labels = [c[0] for c in op._autotune_candidates('basic')]
    for t in (40, 52, 64, 80):
        assert f'chunk{t}M' in labels, labels
    agg = [c[0] for c in op._autotune_candidates('aggressive')]
    assert set(labels) < set(agg)
    assert any(l.startswith('vmem') for l in agg)
    # the phase/dynamic runner choice is a first-class candidate (the
    # measured winner flips with shape: 512^3 phase, 200^3 dynamic)
    assert 'nophase' in labels
    # chunk candidates carry the override dict the executor consumes
    chunk = [c for c in op._autotune_candidates('basic')
             if c[0] == 'chunk52M']
    assert chunk[0][3] == {'target_mb': 52}


def test_apply_autotune_green_and_inert_on_cpu():
    """autotune kwarg accepted everywhere; on the CPU backend the tuner
    skips (reference skips autotuning without the target hardware) and
    results are bit-identical to the untuned run."""
    op, u, vp = _acoustic_op((48, 44, 40), so=4)
    vp.data[:] = 1.5
    u.data[1][24, 22, 20] = 1.0
    op.apply(time_m=1, time_M=8, dt=0.05, autotune='aggressive')
    out = np.array(u.data)

    op2, u2, vp2 = _acoustic_op((48, 44, 40), so=4)
    vp2.data[:] = 1.5
    u2.data[1][24, 22, 20] = 1.0
    op2.apply(time_m=1, time_M=8, dt=0.05)
    assert np.array_equal(out, np.array(u2.data))


def test_chunk_choice_survives_into_compile(monkeypatch):
    """A tuner pick is applied to the production trace: _compiled wraps
    lowering in set_chunk_override(_chunk_choice), so the plan the
    candidates timed is the plan that ships."""
    from devito_tpu.compiler import executor

    op, u, vp = _acoustic_op((96, 44, 40), so=8)
    vp.data[:] = 1.5
    u.data[1][48, 22, 20] = 1.0
    monkeypatch.setenv('DTPU_XCHUNK_TRIGGER_MB', '0.0001')

    seen = []
    orig = executor._x_chunk_plan

    def spy(eq, region, t, strips, shard_spec):
        plan = orig(eq, region, t, strips, shard_spec)
        if plan is not None:
            seen.append(len(plan[2]))
        return plan

    monkeypatch.setattr(executor, '_x_chunk_plan', spy)
    op._chunk_choice = {'force_n': 5}
    op.apply(time_m=1, time_M=4, dt=0.05)
    assert 5 in seen, seen
    # override cleared after the trace: a fresh plan outside the
    # compile sees the defaults again
    assert executor._chunk_override == {}
