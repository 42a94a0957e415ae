"""Platform registry + roofline reporting (devito_tpu/arch.py).

Reference analog: the platform registry devito/arch/archinfo.py:765-1239
feeding defaults everywhere; here the registry drives %-of-roofline in
the apply PERF log (VERDICT r3 item 8)."""

import numpy as np
import pytest

from devito_tpu.arch import (platform_registry, get_platform, _classify,
                             roofline_gpts, roofline_fraction, CPU_GENERIC)


def test_registry_entries_sane():
    for name, p in platform_registry.items():
        assert p.name == name
        assert p.hbm_bw > 100e9
        assert p.mxu_flops > p.vpu_flops
        assert p.vmem_bytes >= 64 * 2**20
        assert p.hbm_bytes >= 8 * 2**30


@pytest.mark.parametrize('kind,expect', [
    ('TPU v5 lite', 'tpu-v5e'),
    ('TPU v5e', 'tpu-v5e'),
    ('TPU v5p', 'tpu-v5p'),
    ('TPU v4', 'tpu-v4'),
    ('TPU v6e', 'tpu-v6e'),
    ('cpu', 'cpu-generic'),
    ('', 'cpu-generic'),
])
def test_classify(kind, expect):
    assert _classify(kind).name == expect


def test_roofline_math():
    # 5 fp32 streams/point on v5e: 819e9 / 20 bytes
    assert abs(roofline_gpts('TPU v5 lite', 20) - 819 / 20) < 1e-9
    p = platform_registry['tpu-v5p']
    # moved half the bandwidth-seconds -> 50%
    assert abs(roofline_fraction(p, p.hbm_bw / 2, 1.0) - 0.5) < 1e-12
    assert roofline_fraction(p, 0, 1.0) is None
    assert roofline_fraction(p, 100, 0.0) is None


def test_get_platform_detects_current_backend():
    p = get_platform()
    assert p in platform_registry.values() or p is CPU_GENERIC


def test_apply_log_reports_roofline(caplog):
    """op.apply() PERF log includes %-of-roofline (VERDICT item 8
    done-bar)."""
    import logging
    from devito_tpu import Grid, TimeFunction, Eq, Operator
    from devito_tpu.logger import logger

    grid = Grid(shape=(16, 16))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    op = Operator(Eq(u.forward, u + 0.1 * u.laplace),
                  subs=grid.spacing_map)
    with caplog.at_level(logging.DEBUG, logger=logger.name):
        summary = op.apply(time_M=3, dt=0.01)
    assert any('roofline' in r.getMessage() for r in caplog.records)
    assert summary.platform.name in ([p.name for p in
                                      platform_registry.values()]
                                     + [CPU_GENERIC.name])


def test_roofline_known_generations():
    """Every registered TPU generation yields a finite roofline."""
    from devito_tpu.arch import roofline_gpts
    for kind in ('TPU v5 lite', 'TPU v5p', 'TPU v4', 'TPU v6 lite'):
        r = roofline_gpts(kind, 20)
        assert r is None or r > 0


def test_roofline_unknown_kind_safe():
    from devito_tpu.arch import roofline_gpts
    r = roofline_gpts('totally unknown accelerator', 20)
    assert r is None or r > 0


def test_roofline_scales_with_bytes():
    """Half the bytes per point -> double the GPts/s roofline."""
    from devito_tpu.arch import roofline_gpts
    a = roofline_gpts('TPU v5 lite', 10)
    b = roofline_gpts('TPU v5 lite', 20)
    if a is not None and b is not None:
        import pytest
        assert a == pytest.approx(2 * b, rel=1e-6)
