"""Shared stream==batch contract constants.

Every streaming operator in this repo has a batch twin that the driver
oracle replays; the semantic knobs they must agree on live HERE, in a
dependency-free module both tiers import. Housing a constant inside
the streaming module (the previous home of the funnel deadline) forced
batch-only plans to import pandas and the streaming state machinery at
module load; duplicating a literal on both sides (the previous state
of the dynamic session gaps) lets one side drift silently until the
parity oracle fails — or worse, both drift together.
"""

#: view→click and click→purchase step deadline of the funnel operators
#: (streaming/stateful.py::streaming_funnel and the batch
#: event_funnel_stats / FUNNEL_SQL in plans/queries_analytics.py).
FUNNEL_DEADLINE_HOURS = 72

#: Per-event session gaps of the dynamic-gap sessionization pair
#: (streaming/windows.py::dynamic_sessionized and the batch
#: dynamic_gap_sessions query): an error event holds the session open
#: briefly, anything else gets the long idle gap. CalendarInterval
#: literal strings — session_window() requires that type.
SESSION_GAP_ERROR = "2 hours"
SESSION_GAP_DEFAULT = "8 hours"
