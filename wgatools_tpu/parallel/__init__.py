from .mesh import (  # noqa: F401
    make_mesh,
    sharded_column_stats,
    sharded_pair_reduce,
    sharded_coverage,
)
