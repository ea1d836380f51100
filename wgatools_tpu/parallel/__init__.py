"""Parallel runtime package.

Lazy re-exports (PEP 562): `mesh` pulls in jax + pallas (~1.7 s of import
on this container), but the fork-pool `-t` paths and every host-only CLI
dispatch import this package too — the device stack must not tax them.
"""

_MESH_EXPORTS = (
    "make_mesh",
    "sharded_column_stats",
    "sharded_pair_reduce",
    "sharded_coverage",
    "sharded_coverage_scatter",
    "sharded_liftover",
)

__all__ = list(_MESH_EXPORTS)


def __getattr__(name):
    if name in _MESH_EXPORTS:
        from . import mesh

        return getattr(mesh, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
