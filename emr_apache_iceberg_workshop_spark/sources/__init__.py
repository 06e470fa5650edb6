from .checkpoints import CheckpointStore  # noqa: F401
from .incremental_files import IncrementalFileSource  # noqa: F401
