from . import (  # noqa: F401
    analytics,
    cleaning,
    dedup,
    outliers,
    profiling,
    similarity,
    temporal,
    textstats,
)
