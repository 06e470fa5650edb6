from .exact import dsum, davg, osum, oavg, TS_FMT_SPARK, TS_FMT_DUCK  # noqa: F401
