from .lineage import Checkpointer, run_resumable  # noqa: F401
