from .registry import QuerySpec, query, registry  # noqa: F401
