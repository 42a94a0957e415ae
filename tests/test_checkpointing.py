"""Checkpoint/recompute gradient equivalence.

Reference parity: tests/test_checkpointing.py + test_gradient.py:60 — the
reference asserts the checkpointed FWI gradient equals the full-save
gradient bit-for-bit, which it gets for free because both paths execute
the *same* generated C kernel. Here the save-mode and rolling-buffer
forward operators are two different XLA programs; XLA is deterministic
within a program but does not contract instruction-for-instruction
identity across differently-structured programs, so the honest TPU-native
assertion is ULP-level agreement (measured ~3e-13 max relative in f64,
i.e. a few ULPs accumulated over ~500 steps).
"""

from functools import lru_cache

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)

from devito_tpu import Function
from devito_tpu.builtins import smooth
from devito_tpu.checkpointing import Revolver, optimal_forward_count
from devito_tpu.models.seismic import acoustic_setup, Receiver


@lru_cache(maxsize=None)
def _t_bruteforce(n, c):
    """Independent memoized evaluation of the binomial recurrence."""
    if n <= 1:
        return 0
    if c == 0:
        return n * (n - 1) // 2
    return min(m + _t_bruteforce(n - m, c - 1) + _t_bruteforce(m, c)
               for m in range(1, n))


def test_optimal_count_matches_bruteforce():
    for n in (1, 2, 3, 5, 10, 20, 37, 60):
        for c in (0, 1, 2, 3, 5, 8):
            assert optimal_forward_count(n, c) == _t_bruteforce(n, c)


class _CountingOp:
    def __init__(self):
        self.count = 0
        self.reversed_ts = []

    def apply(self, a, b):
        self.count += b - a + 1


class _CountingRev:
    def __init__(self):
        self.reversed_ts = []

    def apply(self, a, b):
        assert a == b
        self.reversed_ts.append(a)


class _CountingCp:
    def __init__(self):
        self.n_live = 0
        self.max_live = 0

    def save(self):
        self.n_live += 1
        self.max_live = max(self.max_live, self.n_live)
        return object()

    def load(self, state):
        pass


@pytest.mark.parametrize('nt,ncp', [(100, 10), (1000, 30), (7, 3), (17, 2)])
def test_revolver_schedule_is_griewank_walther_optimal(nt, ncp):
    """Executed forward-application counts equal the Griewank-Walther
    optimum (+1 final completion step) and memory stays within the
    checkpoint budget (reference: pyrevolve via
    devito/checkpointing/checkpoint.py:49)."""
    fw, rv, cp = _CountingOp(), _CountingRev(), _CountingCp()
    r = Revolver(cp, fw, rv, ncp, nt, t_min=1)
    orig_exec = r._exec

    def counting_exec(action, recompute):
        if action[0] == 'free':
            cp.n_live -= 1
        orig_exec(action, recompute)

    r._exec = counting_exec
    r.apply_forward()
    assert fw.count == nt  # single full sweep, no recompute going forward
    r.apply_reverse()
    opt = optimal_forward_count(nt, ncp - 1)
    # +1: the completion step that finishes the forward outputs at nt-1
    assert fw.count == opt + 1
    assert cp.max_live <= ncp
    # every timestep reversed exactly once, in descending order
    assert rv.reversed_ts == list(range(nt, 0, -1))


def test_checkpointed_gradient_equals_full():
    wave = acoustic_setup(shape=(40, 45), spacing=(10., 10.),
                          dtype=np.float64, kernel='OT2', tn=250.0,
                          space_order=4, nbl=20)
    vel0 = Function(name='vel0', grid=wave.model.grid, space_order=4)
    smooth(vel0, wave.model.vp)
    rec = wave.forward()[0]
    rec0, u0 = wave.forward(vp=vel0, save=True)[0:2]
    residual = Receiver(name='resid', grid=wave.model.grid,
                        data=np.asarray(rec0.data) - np.asarray(rec.data),
                        time_range=wave.geometry.time_axis,
                        coordinates=wave.geometry.rec_positions)
    g_full, _ = wave.jacobian_adjoint(residual, u0, vp=vel0)
    g_ck, _ = wave.jacobian_adjoint(residual, None, vp=vel0,
                                    checkpointing=True)
    a, b = np.asarray(g_full.data), np.asarray(g_ck.data)
    assert np.allclose(a, b, rtol=1e-11, atol=0)
