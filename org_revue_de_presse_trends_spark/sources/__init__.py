from . import document_sink, jdbc, lake  # noqa: F401
