from .classify import (  # noqa: F401
    classify_stat_jnp,
    classify_stat_pallas,
    column_stats,
    STAT_MATCHED,
    STAT_MISMATCHED,
    STAT_INS_SIZE,
    STAT_DEL_SIZE,
    STAT_INS_EVENT,
    STAT_DEL_EVENT,
    STAT_GAPGAP,
    STAT_RUNS,
)
