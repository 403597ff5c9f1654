"""shard_map compatibility across jax versions."""

import functools

try:
    from jax import shard_map as _sm
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _sm


def shard_map(f, mesh, in_specs, out_specs):
    """check_rep/check_vma disabled across API generations (our kernels
    contain collectives whose replication the checker cannot infer).

    The traced body runs with the Pallas limb-kernel routing pinned to
    the MESH devices' platform: kernel availability is decided by where
    this computation actually lowers, not by `jax.default_backend()`
    (on a host with a TPU plugin registered, a virtual-CPU-mesh dryrun
    would otherwise route to Pallas TPU kernels and fail to lower).
    """
    platform = next(iter(mesh.devices.flat)).platform

    @functools.wraps(f)
    def traced(*args, **kwargs):
        from ..ops import limb_kernels as lk

        with lk.force_platform(platform):
            return f(*args, **kwargs)

    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return _sm(traced, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature")
