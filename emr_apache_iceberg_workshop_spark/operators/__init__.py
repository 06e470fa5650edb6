from .relational import dedup_latest, merge_upsert, top_k  # noqa: F401
