from .catalog import Catalog, zorder_key  # noqa: F401
