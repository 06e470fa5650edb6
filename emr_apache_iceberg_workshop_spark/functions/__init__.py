from .exact import (  # noqa: F401
    dsum, davg, osum, oavg, sdot, sdot_approx, odot, TS_FMT_SPARK, TS_FMT_DUCK,
)
