"""Streaming validation: run row-level check predicates continuously over
a stream (readStream → transform → writeStream), with watermarked
windowed aggregates for drift-style monitoring.

Batch/stream parity: the same `RowPredicate` list used by the batch
fused scan (operators/fused.py) drives the streaming violation filter, so
a check validated in batch behaves identically on the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators.fused import RowPredicate


def streaming_violations(
    stream: DataFrame,
    predicates: list[RowPredicate],
    key_col: str,
) -> DataFrame:
    """Tag violating rows on a stream — same semantics as the batch
    fused_violation_rows (map-only; safe for append-mode sinks)."""
    tags = F.array_compact(
        F.array(*[F.when(p.predicate, F.lit(p.assertion)) for p in predicates])
    )
    any_pred = predicates[0].predicate
    for p in predicates[1:]:
        any_pred = any_pred | p.predicate
    return (
        stream.filter(any_pred)
        .select(
            F.explode(tags).alias("assertion"),
            F.col(key_col).cast("string").alias("key"),
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys arriving within the
    watermark horizon (`dropDuplicatesWithinWatermark` — state is bounded
    by the watermark, unlike global dropDuplicates).  The streaming
    counterpart of dedup.dedup_exact."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    category_col: str = "event_type",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per category — the streaming
    analogue of the subtotals drift input.  Late rows beyond the
    watermark are dropped; state is bounded."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(category_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(category_col),
            "n",
        )
    )
