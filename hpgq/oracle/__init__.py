from .spec import (  # noqa: F401
    accumulate_read,
    filter_verdict,
    read_stats,
    stats_of_file,
    trim_lengths,
)
