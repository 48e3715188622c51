"""Structured Streaming surface (SURVEY.md §3 group I).

The reference emulates streaming with daily Airflow batch [PUBLIC];
here the same operators run incrementally: windowed aggregations with
watermarks, stateful dedup, stream-static joins, arbitrary state via
applyInPandasWithState, and foreachBatch upsert sinks.

Every streaming operator has a batch twin; the S-suite
(tests/test_streaming.py) replays the events fixture through file
micro-batches and asserts stream == batch.
"""
