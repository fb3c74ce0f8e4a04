from .metrics import MetricsCollector, QueryMetrics  # noqa: F401
