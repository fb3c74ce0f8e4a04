from . import antijoin, argmax, asof, dedup, similarity, topk  # noqa: F401
