from .registry import ORACLES, QUERIES, query  # noqa: F401
from . import (  # noqa: F401  (register on import)
    driver_queries,
    driver_queries_ext,
    llm_queries,
    trends,
    analytics_ext,  # registers past the driver's 50-slot window
    analytics_tpch,  # also past the window
    corpus_stats,  # also past the window
    events_analytics,  # also past the window
    analytics_tpch2,  # also past the window
    curation_ext,  # also past the window
    cdc_ext,  # also past the window
    sketch_ext,  # also past the window
    retrieval_ext,  # also past the window
    graph_ext,  # also past the window
    url_curation,  # also past the window
    analytics_tpch3,  # also past the window
    eval_ext,  # also past the window
    classifier_ext,  # also past the window
    export_ext,  # also past the window
    sampling_ext,  # also past the window
    webtext_ext,  # also past the window
    tokenizer_ext,  # registers LAST: rows-only, past the window
)
