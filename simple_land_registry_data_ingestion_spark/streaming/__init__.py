"""Structured Streaming surface (SURVEY.md section 2.10).

The reference is a manually-run batch job whose commented-out "retry in 1h"
(reference main.py:124-127) gestures at periodic ingestion; this package
supplies the real streaming layer: file sources, watermarks, tumbling /
sliding / session windows, streaming dedup, arbitrary stateful processing,
and exactly-once-ish sinks via foreachBatch.
"""
