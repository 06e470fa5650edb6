from .relational import dedup_latest, merge_upsert, salted_join, top_k  # noqa: F401
