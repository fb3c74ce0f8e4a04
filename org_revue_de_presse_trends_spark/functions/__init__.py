from . import expressions, hashing, text, vectors  # noqa: F401
