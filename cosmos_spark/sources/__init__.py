from .catalog import Catalog, CommitConflict, zorder_key  # noqa: F401
