"""FWI end-to-end: the multi-shot adjoint-state loop reduces the objective.

Reference parity: examples/seismic/inversion/fwi.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from examples.seismic_fwi import run_fwi


def test_fwi_objective_decreases():
    history, model0 = run_fwi(shape=(41, 41), nshots=2, nreceivers=15,
                              fwi_iterations=2, tn=400., nbl=15)
    assert history[1] < history[0]
    assert np.isfinite(np.asarray(model0.vp.data)).all()
