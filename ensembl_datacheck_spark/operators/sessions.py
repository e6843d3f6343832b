"""Gap-based sessionization of event streams.

The standard clickstream/telemetry primitive a training-data pipeline
needs when events become documents (one session = one trajectory /
conversation / browsing episode): assign every event a session id such
that consecutive events of the same user more than ``gap`` apart start
a new session.

Batch tier: one window over (user) ordered by (ts) — a single Exchange
on the user key, boundary flag via ``lag``, session ordinal via a
running sum of the flags.  That is the textbook plan and the one you
want at 100 TB: per-user event counts bound the sort width, AQE handles
hot users, and the same shuffle is reused by the per-session rollup
(``session_stats`` composes on top without a second Exchange until the
session-level groupBy).

Streaming tier: the engine-native ``F.session_window`` (merging session
windows + watermark, incremental state) — `sessionize_stream` — whose
session boundaries coincide with the batch lag-rule for point events;
the parity is pinned in tests/test_multimodal_streaming.py.

The reference has no event-stream shape; this extends its ordered
adjacent-row family (S13, event_gaps kin — same lag-over-window core)
to session semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    session_col: str = "session_seq",
) -> DataFrame:
    """Events + per-user session ordinal (1-based, ordered by time).

    New session when the gap to the user's previous event exceeds
    ``gap_minutes`` (strictly greater — an event landing exactly on the
    boundary continues the session, matching ``session_window``'s
    closed-start/open-end merge rule).  Ties on ts stay in one session
    regardless of tie order, so the assignment is deterministic even
    when event ids arrive shuffled.  NULL user/ts rows are dropped —
    they belong to the completeness checks, and a NULL user would
    otherwise funnel into one giant window partition.
    """
    # integer microsecond arithmetic: exact, and replayable verbatim by
    # the DuckDB oracle's epoch_us() — no float-seconds rounding edge.
    # The cast("timestamp") lifts TIMESTAMP_NTZ columns for unix_micros;
    # with the engine's pinned UTC session timezone (session.py:54) the
    # NTZ wall-clock maps 1:1 to epoch micros, same as DuckDB.
    gap_us = int(gap_minutes * 60 * 1_000_000)
    if gap_us <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    # try_cast, not cast: under ANSI (Spark 4 default) a malformed ts
    # STRING would fail the whole job; here it becomes NULL and the row
    # is dropped by the filter below
    us = F.unix_micros(F.col(ts_col).try_cast("timestamp"))
    # order by the SAME micros expression the gap arithmetic uses — a
    # raw string ts_col in a non-lexicographic format (e.g. unpadded
    # '2024-1-2 9:05') would otherwise hand lag() the wrong neighbor
    # and sessionize silently wrong
    w = Window.partitionBy(user_col).orderBy(us)
    prev_us = F.lag(us).over(w)
    new_session = (
        prev_us.isNull() | (us - prev_us > F.lit(gap_us))
    ).cast("long")
    return (
        # us.isNotNull() also drops rows whose ts string cannot cast to
        # a timestamp — those belong to the format checks, and NULL
        # micros would corrupt every later gap in the user's stream
        df.filter(F.col(user_col).isNotNull() & us.isNotNull())
        .withColumn(
            session_col,
            F.sum(new_session).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: (user, session_seq) -> event count, span.

    Composes on sessionize's window shuffle — the groupBy keys are a
    superset of the window partition key, so Catalyst plans the
    aggregation without a second full Exchange of the fact rows.
    Span is integer epoch-microsecond arithmetic (BIGINT end-to-end)
    for exact oracle parity.
    """
    s = sessionize(df, user_col, ts_col, gap_minutes)
    # min/max over the CAST timestamp (no-op for timestamp columns):
    # chronological, not lexicographic, for string ts inputs — matches
    # the micros ordering sessionize itself uses
    ts = F.col(ts_col).try_cast("timestamp")
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))
        ).cast("long").alias("span_us"),
    )


def sessionize_stream(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    watermark_minutes: float = 60.0,
) -> DataFrame:
    """Streaming per-session rollup via native merging session windows.

    groupBy(user, session_window(ts, gap)) with a watermark bounds state
    to open sessions only — the scale path for arriving data.  Session
    membership (which events share a session) coincides with the batch
    lag rule for point events, so ``session_start`` and ``n_events``
    match ``session_stats`` exactly; ``session_end`` here is Spark's
    window end = last event + gap (batch reports the last event itself).
    The batch ordinal is replaced by the window struct, which is what
    downstream joins key on in a streaming context.
    """
    # interval strings in MICROSECONDS, matching the batch tier's
    # integer-microsecond gap rule bit for bit — whole-second rounding
    # here would silently break the documented batch parity for
    # fractional gaps and degenerate to a '0 seconds' window below 1 s
    gap_us = int(gap_minutes * 60 * 1_000_000)
    if gap_us <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    gap = f"{gap_us} microseconds"
    wm = f"{max(0, int(watermark_minutes * 60 * 1_000_000))} microseconds"
    return (
        stream_df.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .withWatermark(ts_col, wm)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
