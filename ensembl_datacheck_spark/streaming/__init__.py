"""Structured Streaming surface.

The reference has **no streaming** (SURVEY.md §2.4 'Not present'); its
incremental re-run is batch bookkeeping, modeled by plans/checkpoint.py.
This module is the engine's forward-looking streaming tier: continuous
validation of an event/sequence stream with watermarked windows."""

from ensembl_datacheck_spark.streaming.validate import (  # noqa: F401
    dedup_stream,
    dsir_weights_stream,
    lm_outliers_stream,
    snapshot_equality_stream,
    streaming_violations,
    windowed_event_counts,
)
