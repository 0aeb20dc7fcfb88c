from .nrt import start_incremental_indexing  # noqa: F401
