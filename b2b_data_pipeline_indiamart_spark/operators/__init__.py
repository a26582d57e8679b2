from . import (  # noqa: F401
    analytics,
    cleaning,
    dedup,
    multimodal,
    outliers,
    profiling,
    similarity,
    skew,
    temporal,
    textstats,
)
