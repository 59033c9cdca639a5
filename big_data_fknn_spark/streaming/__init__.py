"""Structured Streaming building blocks.

``replay`` turns the batch testdata into terminating file-source
streams and drains streaming DataFrames into memory sinks — the
plumbing under the a6/i4/i5/i6 queries (queries/events.py).  In
production the source directory is a real landing zone and the sink
is kafka/delta; the transformations in between are unchanged.
"""

from big_data_fknn_spark.streaming.replay import events_stream, run_to_memory

__all__ = ["events_stream", "run_to_memory"]
