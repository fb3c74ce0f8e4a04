from . import (  # noqa: F401
    antijoin,
    argmax,
    asof,
    decontaminate,
    dedup,
    mixing,
    multimodal,
    packing,
    rangejoin,
    similarity,
    skew,
    topk,
)
