"""Structured Streaming slice (beyond-reference, SURVEY.md §2.11).

The reference has no stream processing — its chunked ratings load
(reference ``challenge.py:317-325``) is batch iteration. This module
is the engine's forward-looking streaming surface over the same
aggregations the batch catalog verifies: the batch/stream parity is
the point (``tumbling_window_counts`` in the catalog is the
oracle-checked twin of ``tumbling_event_counts`` here).
"""

from .dedup import dedup_stream, run_dedup_over_events  # noqa: F401
from .stateful import (  # noqa: F401
    run_sessionize_over_events,
    sessionize_stateful,
)
from .windows import (  # noqa: F401
    interval_join_streams,
    read_event_stream,
    session_window_counts,
    sliding_event_counts,
    tumbling_event_counts,
)
