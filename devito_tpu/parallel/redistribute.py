"""Cross-topology redistribution of function data.

Reference parity: the distributed indexing engine
(devito/data/distributed/__init__.py:1-16 — Selection/Layout/ExchangePlan/
Exchange, ~1200 LoC of rank-to-rank routing for moving data between
decompositions). The TPU-native re-design is a single ``jax.device_put``
onto the destination's ``NamedSharding``: XLA's runtime computes the
device-to-device transfer schedule (the ExchangePlan analog) and moves
shards over ICI without a host bounce — so the whole engine collapses to
layout/halo bookkeeping on both ends.
"""


__all__ = ['redistribute']


def _interior_device(fn):
    """Device-side DOMAIN view (halo stripped) of ``fn``'s current device
    buffer, in compute dtype."""
    dev = fn._device_array()
    lead = fn._leading_slices()
    zc = getattr(fn, 'is_zcompact', False)
    slices = []
    ns = fn.shape[len(lead):]
    for ax, (n, (hl, hr)) in enumerate(zip(ns, fn.halo)):
        if zc and ax == len(ns) - 1:
            slices.append(slice(0, n))  # z-compact: no lane halo
        else:
            slices.append(slice(hl, hl + n))
    out = dev[tuple(lead) + tuple(slices)]
    if out.dtype != fn.dtype:
        out = out.astype(fn.dtype)
    return out


def redistribute(src, dst):
    """Copy ``src``'s domain data into ``dst`` device-to-device.

    ``src`` and ``dst`` must have the same domain shape; they may live on
    grids with DIFFERENT topologies (or one side unsharded), different
    device layouts (padded / z-compact), and different storage dtypes.
    The transfer is a device-side interior slice + ``jax.device_put``
    onto the destination sharding + a padded write — no host round-trip
    when the source is device-authoritative. ``dst``'s halo is zeroed.

    Returns ``dst``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    if tuple(src.shape) != tuple(dst.shape):
        raise ValueError(
            f"redistribute: shape mismatch {src.shape} vs {dst.shape}")

    interior = _interior_device(src)

    # destination shardings (interior and padded buffer share the spec)
    ddist = dst.grid.distributor if dst.grid is not None else None
    if ddist is not None:
        with_time = interior.ndim == len(dst.shape) and \
            len(dst.shape) == dst.grid.dim + 1
        spec = [None] if with_time else []
        for name, t in zip(ddist.axis_names, ddist.topology):
            spec.append(name if t > 1 else None)
        sharding = NamedSharding(ddist.mesh, PartitionSpec(*spec))
        # device_put requires every sharded extent divisible by its
        # topology factor (GSPMD's internal padding only applies inside
        # jitted computations): zero-pad uneven axes device-side before
        # the transfer and trim after
        lead_n = 1 if with_time else 0
        pads = [(0, 0)] * interior.ndim
        uneven = False
        for j, t in enumerate(ddist.topology):
            n = interior.shape[lead_n + j]
            if t > 1 and n % t:
                pads[lead_n + j] = (0, t - n % t)
                uneven = True
        if uneven:
            interior = jnp.pad(interior, pads)
        # reshard the interior onto the destination mesh (device-to-
        # device; works across meshes and from unsharded sources)
        interior = jax.device_put(interior, sharding)
        if uneven:
            interior = interior[tuple(slice(0, n) for n in dst.shape)]

    # build the destination padded buffer and write the interior
    from ..types.dense import _registry_layout
    dst.set_device_layout(_registry_layout(dst))
    sdt = dst.storage_dtype
    shape = dst.shape_device
    zeros = jnp.zeros(shape, dtype=sdt)
    if ddist is not None:
        zeros = jax.device_put(zeros, sharding)
    lead = dst._leading_slices()
    zc = getattr(dst, 'is_zcompact', False)
    ns = dst.shape[len(lead):]
    slices = []
    for ax, (n, (hl, hr)) in enumerate(zip(ns, dst.halo)):
        if zc and ax == len(ns) - 1:
            slices.append(slice(0, n))
        else:
            slices.append(slice(hl, hl + n))
    buf = zeros.at[tuple(lead) + tuple(slices)].set(interior.astype(sdt))
    dst._set_device_array(buf)
    return dst
