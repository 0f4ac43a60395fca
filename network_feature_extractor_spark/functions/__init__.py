from .stats import (  # noqa: F401
    stddev_pop_moments,
    entropy_from_counts,
    safe_div,
    clamped_rate,
)
from .islands import with_island_id  # noqa: F401
