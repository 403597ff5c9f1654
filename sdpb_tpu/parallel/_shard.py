"""shard_map compatibility across jax versions."""

try:
    from jax import shard_map as _sm
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _sm


def shard_map(f, mesh, in_specs, out_specs):
    """check_rep/check_vma disabled across API generations (our kernels
    contain collectives whose replication the checker cannot infer)."""
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature")
