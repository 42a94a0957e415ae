"""TPU platform registry: per-generation peak numbers feeding defaults.

Reference analog: the platform registry in devito/arch/archinfo.py:765-1239
(Platform class tree with cores/simd_vl/memtotal per micro-architecture,
``get_platform`` lscpu sniffing, ``platform_registry``). The TPU build's
equivalents are per-generation HBM bandwidth, VPU/MXU peaks and VMEM/HBM
capacities — the numbers that drive roofline reporting
(PerformanceSummary %-of-roofline) and the VMEM working-set heuristics.

Peaks are public figures (TPU system architecture docs / the scaling
book); ``vpu_flops`` entries are order-of-magnitude estimates (vector
unit throughput is not published per generation) and are marked so.
"""

from collections import namedtuple

__all__ = ['TpuPlatform', 'platform_registry', 'get_platform',
           'roofline_gpts', 'CPU_GENERIC']

TpuPlatform = namedtuple(
    'TpuPlatform',
    [
        'name',        # canonical name, e.g. 'tpu-v5e'
        'hbm_bw',      # HBM bandwidth, bytes/s per chip
        'mxu_flops',   # MXU peak, bf16 FLOP/s per chip
        'vpu_flops',   # VPU fp32 FLOP/s per chip (estimate)
        'vmem_bytes',  # VMEM per core
        'hbm_bytes',   # HBM capacity per chip
        'ici_bw',      # ICI bandwidth per link, bytes/s (one direction)
    ])

# Public per-chip numbers. VMEM: 128 MiB on v4+ (16 MiB v2/v3 era
# scratch figures vary; only v4+ matter here). ICI: per-link one-way.
platform_registry = {
    'tpu-v4': TpuPlatform('tpu-v4', 1228e9, 275e12, 4.9e12,
                          128 * 2**20, 32 * 2**30, 50e9),
    'tpu-v5e': TpuPlatform('tpu-v5e', 819e9, 197e12, 3.5e12,
                           128 * 2**20, 16 * 2**30, 50e9),
    'tpu-v5p': TpuPlatform('tpu-v5p', 2765e9, 459e12, 8.2e12,
                           128 * 2**20, 95 * 2**30, 100e9),
    'tpu-v6e': TpuPlatform('tpu-v6e', 1640e9, 918e12, 7.3e12,
                           128 * 2**20, 32 * 2**30, 100e9),
}

# CPU / unknown fallback: an arbitrary-but-stated 100 GB/s host figure so
# %-roofline still prints something meaningful off-TPU.
CPU_GENERIC = TpuPlatform('cpu-generic', 100e9, 2e12, 1e12,
                          32 * 2**20, 64 * 2**30, 10e9)


def _classify(kind):
    """Map a jax device_kind string to a registry entry."""
    k = (kind or '').lower()
    if 'v5p' in k or 'v5 p' in k:
        return platform_registry['tpu-v5p']
    if 'v5' in k:  # 'TPU v5 lite' / 'TPU v5e'
        return platform_registry['tpu-v5e']
    if 'v6' in k or 'trillium' in k:
        return platform_registry['tpu-v6e']
    if 'v4' in k:
        return platform_registry['tpu-v4']
    if 'tpu' in k:
        return platform_registry['tpu-v5e']  # unknown TPU: conservative
    return CPU_GENERIC


def get_platform(device=None):
    """Detect the current platform (reference: get_platform,
    devito/arch/archinfo.py:722 — lscpu sniffing becomes a
    device_kind sniff)."""
    if device is None:
        try:
            import jax
            device = jax.devices()[0]
        except Exception:
            return CPU_GENERIC
    kind = getattr(device, 'device_kind', str(device))
    return _classify(kind)


def roofline_gpts(platform, bytes_per_point):
    """HBM-bandwidth roofline in GPts/s for a memory-bound stencil
    moving ``bytes_per_point`` per grid point per step."""
    if isinstance(platform, str):
        platform = _classify(platform)
    return platform.hbm_bw / bytes_per_point / 1e9


def roofline_fraction(platform, traffic_bytes, seconds):
    """Achieved fraction of the HBM-bandwidth roofline for a section
    that moved ``traffic_bytes`` (cost-model estimate) in ``seconds``."""
    if seconds <= 0 or traffic_bytes <= 0:
        return None
    if isinstance(platform, str):
        platform = _classify(platform)
    return (traffic_bytes / seconds) / platform.hbm_bw
