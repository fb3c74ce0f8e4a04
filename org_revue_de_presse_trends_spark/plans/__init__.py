from .registry import ORACLES, QUERIES, query  # noqa: F401
from . import driver_queries, llm_queries, trends  # noqa: F401  (register on import)
