"""Streaming & windowed event analytics.

The reference is strictly batch (SURVEY.md §2.11); this package adds the
event-time operators a live event warehouse needs — tumbling/sliding
windows, gap sessionization — each with a batch-equivalent formulation
(oracle-checkable) and a Structured Streaming wiring with watermarks and
``Trigger.AvailableNow`` for incremental runs.
"""
