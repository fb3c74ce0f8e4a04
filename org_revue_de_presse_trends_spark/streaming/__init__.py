from . import incremental, jdbc_sync  # noqa: F401
