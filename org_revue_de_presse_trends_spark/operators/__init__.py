from . import (  # noqa: F401
    antijoin,
    argmax,
    asof,
    dedup,
    multimodal,
    similarity,
    skew,
    topk,
)
