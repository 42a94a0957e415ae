"""ABC-methods tutorial suite (reference:
examples/seismic/abc_methods/02_damping, 03_pml, 04_habc notebooks).

The validation mirrors the notebooks' point: after the wavefront has hit
the boundary, a treated boundary leaves far less energy in the interior
than the untreated (reflecting) one.
"""

import numpy as np
import pytest

from examples.seismic_abc import (reflecting, damping_abc, pml_abc, habc,
                                  interior_energy)

# run long enough for the wavefront to hit and bounce off the boundaries
CFG = dict(shape=(101, 101), extent=(1000., 1000.), nt=900, dt=1.0)


@pytest.fixture(scope='module')
def ref_energy():
    return interior_energy(reflecting(**CFG))


def test_damping_absorbs(ref_energy):
    e = interior_energy(damping_abc(**CFG))
    assert np.isfinite(e)
    assert e < 0.25 * ref_energy, (e, ref_energy)


def test_pml_absorbs(ref_energy):
    e = interior_energy(pml_abc(**CFG))
    assert np.isfinite(e)
    assert e < 0.25 * ref_energy, (e, ref_energy)


def test_habc_absorbs(ref_energy):
    e = interior_energy(habc(**CFG))
    assert np.isfinite(e)
    assert e < 0.25 * ref_energy, (e, ref_energy)
