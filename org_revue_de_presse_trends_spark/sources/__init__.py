from . import bucketed, document_sink, jdbc, lake  # noqa: F401
