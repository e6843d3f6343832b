"""Multimodal plumbing (mapInPandas stages, stubbed decode) and
Structured Streaming validation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators import multimodal as MM
from ensembl_datacheck_spark.operators.fused import RowPredicate


@pytest.fixture(scope="module")
def media(spark):
    return MM.gen_media_fixture(spark, n_rows=48, n_partitions=4).cache()


def test_image_features_pipeline(media):
    feats = MM.image_features(media.filter(F.col("modality") == "image"))
    rows = feats.collect()
    assert len(rows) == 16
    for r in rows:
        assert r["width"] > 0 and r["height"] > 0
        assert 0 <= r["mean_luma"] <= 255
        assert len(r["sha1"]) == 40
    # deterministic across runs
    again = MM.image_features(media.filter(F.col("modality") == "image")).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_resize_composes(media, spark):
    imgs = media.filter(F.col("modality") == "image")
    # a NULL-payload row must flow through, not kill the stage
    imgs = imgs.unionByName(spark.createDataFrame(
        [("media_null_rsz", "image", None, None)], MM.MEDIA_SCHEMA))
    resized = MM.resize_images(imgs, target=(4, 4))
    rows = {r["media_id"]: r for r in resized.collect()}
    real = [r for mid, r in rows.items() if mid != "media_null_rsz"]
    assert all(r["meta"]["width"] == 4 and r["meta"]["height"] == 4
               for r in real)
    assert all(len(bytes(r["payload"])) == 16 for r in real)  # 4x4 uint8
    assert rows["media_null_rsz"]["payload"] is None
    # output IS MEDIA_SCHEMA: stages genuinely compose
    feats = {r["media_id"]: r for r in MM.image_features(resized).collect()}
    assert all(f["width"] == 4 and f["height"] == 4
               for mid, f in feats.items() if mid != "media_null_rsz")
    assert feats["media_null_rsz"]["sha1"] is None


def test_frame_sampling(media):
    frames = MM.sample_frames(media, every_n=10)
    rows = frames.collect()
    vids = media.filter(F.col("modality") == "video").count()
    assert len(rows) == vids * 3  # 30 frames, every 10th -> 0,10,20
    assert {r["frame_idx"] for r in rows} == {0, 10, 20}


def test_real_decode_stub_raises(media):
    feats = MM.image_features(
        media.filter(F.col("modality") == "image"), decoder=MM.real_decode_stub
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        feats.collect()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from ensembl_datacheck_spark.streaming import dedup_stream

    src = tmp_path / "dd_src"
    src.mkdir()
    batch = spark.createDataFrame(
        [
            ("d1", "2024-01-01 00:00:10"),
            ("d1", "2024-01-01 00:00:30"),  # dup within watermark
            ("d2", "2024-01-01 00:01:00"),
        ],
        "doc_id string, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp")).drop("ts_str")
    batch.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        dedup_stream(stream, ["doc_id"], watermark="5 minutes")
        .writeStream.format("memory").queryName("dd_stream")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.sql("select * from dd_stream").collect())
    assert got == ["d1", "d2"]


def test_advisory_failures_do_not_gate_exit(spark, seq_fixture):
    import ensembl_datacheck_spark.checks  # noqa: F401
    from ensembl_datacheck_spark.plans import reports
    from ensembl_datacheck_spark.plans.runner import Runner
    from ensembl_datacheck_spark.registry import registry
    from ensembl_datacheck_spark.verdict import Status

    # SourcesUsed (advisory) fails when a source has no rows; restrict the
    # fact table to one source to force it
    seq = seq_fixture["sequences_clean"].filter("source = 'src_00'")
    tables = {"sequences": seq, "sources": seq_fixture["sources"]}
    summary = Runner(spark, tables, n_buckets=8).run(
        registry.select(names=["SourcesUsed", "DocIdUnique"]),
        write_checkpoints=False,
    )
    res = {r.check_name: r for r in summary.results}
    assert res["SourcesUsed"].status == Status.FAIL
    assert res["SourcesUsed"].severity == "advisory"
    assert res["DocIdUnique"].status == Status.OK
    # advisory failure reported but exit code stays 0
    assert reports.exit_code(summary) == 0
    assert summary.n_failed == 1


def test_streaming_violations_and_windows(spark, tmp_path):
    from ensembl_datacheck_spark.streaming import (
        streaming_violations,
        windowed_event_counts,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    batch = spark.createDataFrame(
        [
            ("d1", 5, "src_a", "2024-01-01 00:00:10"),
            ("d2", -1, "src_a", "2024-01-01 00:00:20"),  # violating n_tok
            ("d3", 7, None, "2024-01-01 00:01:10"),      # violating source
            ("d4", 9, "src_b", "2024-01-01 00:01:40"),
        ],
        "doc_id string, n_tok int, source string, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp")).drop("ts_str")
    batch.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    preds = [
        RowPredicate("n_tok_nonpositive", F.col("n_tok") <= 0),
        RowPredicate("source_null", F.col("source").isNull()),
    ]
    viol = streaming_violations(stream, preds, "doc_id")
    q = (
        viol.writeStream.format("memory")
        .queryName("viol_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["assertion"], r["key"])
        for r in spark.sql("select * from viol_stream").collect()
    }
    assert got == {("n_tok_nonpositive", "d2"), ("source_null", "d3")}

    counts = windowed_event_counts(
        spark.readStream.schema(batch.schema).parquet(str(src)),
        ts_col="ts",
        category_col="source",
        window="1 minute",
    )
    q2 = (
        counts.writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("complete")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    rows = spark.sql("select * from win_stream").collect()
    # two windows (00:00, 00:01); src_a has 2 in the first
    by = {(str(r["window_start"]), r["source"]): r["n"] for r in rows}
    assert by[("2024-01-01 00:00:00", "src_a")] == 2


def test_streaming_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState keeps cumulative per-source stats across
    micro-batches: a second batch must ADD to the first batch's counts."""
    import time

    from ensembl_datacheck_spark.streaming.validate import running_source_stats

    src = tmp_path / "src"
    b1 = spark.createDataFrame(
        [("a", 10, False), ("a", 20, True), ("b", 5, False)],
        "source string, n_tok int, bad boolean",
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    stats = running_source_stats(stream, violation_col="bad")
    q = (
        stats.writeStream.format("memory")
        .queryName("run_stats")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [("a", 99, True)], "source string, n_tok int, bad boolean"
        )
        b2.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM run_stats WHERE source = 'a' ORDER BY n_rows"
        ).collect()
        # snapshots over time: first batch saw 2 rows/1 violation, after
        # the second batch the running state is 3 rows/2 violations
        assert [r["n_rows"] for r in rows] == [2, 3]
        last = rows[-1]
        assert last["n_violations"] == 2
        assert last["min_n_tok"] == 10 and last["max_n_tok"] == 99
        b_row = spark.sql("SELECT * FROM run_stats WHERE source = 'b'").collect()
        assert b_row and b_row[-1]["n_rows"] == 1
    finally:
        q.stop()


def test_streaming_windowed_subtotals_drift(spark, tmp_path):
    """Streaming row_subtotals: a category that vanishes from a window
    (vs its baseline share) produces an alert row; healthy mixes don't."""
    from ensembl_datacheck_spark.streaming.validate import (
        windowed_subtotals_drift,
    )

    src = tmp_path / "sd"
    rows = []
    # minute 0: healthy 50/50 a/b; minute 2: b vanishes
    for i in range(20):
        rows.append((f"2024-01-01 00:00:{i:02d}", "a" if i % 2 else "b"))
    for i in range(20):
        rows.append((f"2024-01-01 00:02:{i:02d}", "a"))
    batch = spark.createDataFrame(rows, "ts_s string, event_type string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    batch.coalesce(1).write.mode("append").parquet(str(src))
    baseline = spark.createDataFrame([("a", 0.5), ("b", 0.5)],
                                     "category string, prop double")
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    alerts = windowed_subtotals_drift(stream, baseline, window="1 minute",
                                      watermark="10 minutes",
                                      min_proportion=0.5)
    q = (alerts.writeStream.format("memory").queryName("sd_alerts")
         .outputMode("append").start())
    try:
        # append-mode windowed aggs only emit after the watermark passes:
        # advance event time far beyond both windows
        late = spark.createDataFrame([("2024-01-01 01:00:00", "a")],
                                     "ts_s string, event_type string") \
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        late.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sd_alerts").collect()
        cats = {(str(r["window_start"]), r["category"]) for r in got}
        assert ("2024-01-01 00:02:00", "b") in cats, cats
        assert ("2024-01-01 00:00:00", "b") not in cats
        assert all(r["n"] == 0 for r in got if r["category"] == "b")
    finally:
        q.stop()


def test_payload_features_robust_to_real_media_blobs(spark):
    """payload_features must survive the module's own media world:
    string ids, non-UTF-8 hash-derived payloads (NULL text features,
    real byte features), and NULL payloads (all-NULL features)."""
    from pyspark.sql import functions as F

    from ensembl_datacheck_spark.operators import multimodal as MM

    media = MM.gen_media_fixture(spark, n_rows=6, n_partitions=2)
    media = media.unionByName(
        spark.createDataFrame(
            [("media_null", "image", None, None)], MM.MEDIA_SCHEMA
        )
    )
    rows = {r["media_id"]: r
            for r in MM.payload_features(media).collect()}
    assert len(rows) == 7
    some = rows["media_000000"]
    assert some["payload_bytes"] > 0 and len(some["payload_md5"]) == 32
    assert some["n_chars"] is None  # hash bytes are not valid UTF-8
    null_row = rows["media_null"]
    assert null_row["payload_bytes"] is None and null_row["payload_md5"] is None

    # UTF-8 payloads still produce full text features
    txt = spark.createDataFrame(
        [("t1", bytearray("héllo".encode()))],
        "media_id string, payload binary",
    )
    [r] = MM.payload_features(txt).collect()
    assert r["n_chars"] == 5 and r["first_cp"] == ord("h")
    assert r["payload_bytes"] == 6  # é is two bytes


def test_snapshot_equality_stream_matches_batch(spark, tmp_path, seq_fixture):
    """VERDICT r4 item 8: the per-row snapshot invariant also runs on
    arriving data.  Stream the perturbed-fixture current table against
    the static snapshot; the emitted (key, diff_kind) set must equal the
    batch token_snapshot_diff restricted to the streamable kinds
    (changed / new_in_current — missing_in_current has no arrival event
    on an unbounded stream and stays batch-owned)."""
    from ensembl_datacheck_spark.operators import snapshot as SN
    from ensembl_datacheck_spark.sources import synth
    from ensembl_datacheck_spark.streaming import snapshot_equality_stream

    clean = seq_fixture["sequences_clean"]
    snap = synth.gen_sequences_snapshot(spark, clean, n_extra=5)

    batch_expected = {
        (r["doc_id"], r["diff_kind"])
        for r in SN.token_snapshot_diff(clean, snap)
        .filter(F.col("diff_kind") != SN.MISSING_IN_CURRENT)
        .collect()
    }
    assert batch_expected, "fixture must perturb some rows"

    src = tmp_path / "snap_src"
    cur = clean.select("doc_id", "tokens")
    cur.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(cur.schema).parquet(str(src))
    out = snapshot_equality_stream(stream, snap)
    q = (
        out.writeStream.format("memory").queryName("snap_stream")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["diff_kind"])
            for r in spark.sql("select * from snap_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch_expected
    kinds = {k for _, k in got}
    assert kinds == {SN.CHANGED, SN.NEW_IN_CURRENT}


# ---------------------------------------------------------------------------
# gap-based sessionization (operators/sessions.py)
# ---------------------------------------------------------------------------


def _session_fixture(spark):
    """Two users; user 1 has a 31-min gap after event 3 (new session),
    user 2's events all within gaps (one session), plus a NULL user row
    that must be dropped."""
    rows = [
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-01 10:10:00"),
        (3, 1, "2024-01-01 10:39:00"),
        (4, 1, "2024-01-01 11:10:00.000001"),  # 31:00.000001 after #3
        (5, 1, "2024-01-01 11:20:00"),
        (6, 2, "2024-01-01 09:00:00"),
        (7, 2, "2024-01-01 09:30:00"),  # exactly 30:00 -> same session
        (8, None, "2024-01-01 09:00:00"),
    ]
    return spark.createDataFrame(
        [(e, u, t) for e, u, t in rows],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id",
             F.col("ts_s").cast("timestamp").alias("ts"))


def test_sessionize_gap_rule_and_boundaries(spark):
    from ensembl_datacheck_spark.operators import sessions

    df = _session_fixture(spark)
    out = {r["event_id"]: r["session_seq"]
           for r in sessions.sessionize(df, "user_id", "ts", 30).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1, 7: 1}
    assert 8 not in out  # NULL user dropped, not funneled into a session


def test_session_stats_rollup(spark):
    from ensembl_datacheck_spark.operators import sessions

    df = _session_fixture(spark)
    stats = {
        (r["user_id"], r["session_seq"]): r
        for r in sessions.session_stats(df, "user_id", "ts", 30).collect()
    }
    assert stats[(1, 1)]["n_events"] == 3
    assert stats[(1, 2)]["n_events"] == 2
    assert stats[(2, 1)]["n_events"] == 2
    assert stats[(1, 1)]["span_us"] == 39 * 60 * 1_000_000
    assert stats[(2, 1)]["span_us"] == 30 * 60 * 1_000_000


def test_sessionize_single_exchange(spark):
    """One hash Exchange on the user key — the whole cost model."""
    from ensembl_datacheck_spark.operators import sessions

    df = _session_fixture(spark)
    plan = (
        sessions.sessionize(df, "user_id", "ts", 30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming session_window boundaries coincide with the batch lag
    rule: same (user, session_start, n_events) facts."""
    from ensembl_datacheck_spark.operators import sessions

    batch = _session_fixture(spark)
    src = tmp_path / "sess_src"
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    out = sessions.sessionize_stream(stream, "user_id", "ts", 30,
                                     watermark_minutes=240)
    q = (
        out.writeStream.format("memory").queryName("sess_stream")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # append mode emits a session only once the watermark passes it,
        # and the watermark advances at the END of a batch — so ship a
        # second micro-batch with one far-future sentinel event to close
        # every fixture session
        spark.createDataFrame(
            [(99, 999, "2024-01-02 12:00:00")],
            "event_id long, user_id long, ts_s string",
        ).select(
            "event_id", "user_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in spark.sql("select * from sess_stream").collect()
        if r["user_id"] != 999  # sentinel stays open — not a fixture fact
    }
    want = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in sessions.session_stats(batch, "user_id", "ts", 30).collect()
    }
    # the sentinel closed every fixture session, so the emitted set must
    # equal the batch facts exactly
    assert got == want


def test_sessionize_fractional_second_gap_parity(spark, tmp_path):
    """A 0.5 s gap rule must NOT be rounded to whole seconds in the
    streaming tier: batch and stream must split/merge the same 0.4 s
    and 0.6 s gaps (review finding on the int()-seconds truncation)."""
    import pytest as _pytest

    from ensembl_datacheck_spark.operators import sessions

    gap_min = 0.5 / 60  # 500_000 us
    batch = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00.000000"),
            (2, 1, "2024-01-01 10:00:00.400000"),  # +0.4s -> same session
            (3, 1, "2024-01-01 10:00:01.000001"),  # +0.600001s -> new
        ],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id",
             F.col("ts_s").cast("timestamp").alias("ts"))
    want = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in sessions.session_stats(batch, "user_id", "ts",
                                        gap_min).collect()
    }
    assert sorted(want.values()) == [1, 2]  # the batch rule itself

    src = tmp_path / "frac_src"
    batch.write.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        sessions.sessionize_stream(stream, "user_id", "ts", gap_min,
                                   watermark_minutes=240)
        .writeStream.format("memory").queryName("frac_stream")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(99, 999, "2024-01-02 12:00:00")],
            "event_id long, user_id long, ts_s string",
        ).select("event_id", "user_id",
                 F.col("ts_s").cast("timestamp").alias("ts")) \
            .write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in spark.sql("select * from frac_stream").collect()
        if r["user_id"] != 999
    }
    assert got == want

    with _pytest.raises(ValueError, match="positive"):
        sessions.sessionize(batch, "user_id", "ts", 0)
    with _pytest.raises(ValueError, match="positive"):
        sessions.sessionize_stream(stream, "user_id", "ts", 0)


def test_sessionize_orders_chronologically_for_string_ts(spark):
    """A raw STRING ts column in a non-lexicographic format (unpadded
    month/hour) must still sessionize in chronological order: the window
    orders by the same epoch-micros expression the gap rule uses."""
    from ensembl_datacheck_spark.operators import sessions

    rows = [
        (1, 1, "2024-1-2 9:05:00"),    # 09:05
        (2, 1, "2024-1-2 13:00:00"),   # 13:00 — lexicographically BEFORE '9:05'
        (3, 1, "2024-1-2 9:15:00"),    # 09:15, same session as event 1
        (4, 1, "bogus"),               # uncastable -> dropped, not corrupting
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string")
    out = {r["event_id"]: r["session_seq"]
           for r in sessions.sessionize(df, "user_id", "ts", 30).collect()}
    assert out == {1: 1, 3: 1, 2: 2}
    stats = {r["session_seq"]: r for r in
             sessions.session_stats(df, "user_id", "ts", 30).collect()}
    # chronological, not lexicographic, session bounds
    assert str(stats[1]["session_start"]).startswith("2024-01-02 09:05")
    assert str(stats[1]["session_end"]).startswith("2024-01-02 09:15")


def test_windowed_subtotals_drift_alerts_on_all_null_category_window(spark, tmp_path):
    """A window whose rows ALL have a NULL category is the total-collapse
    case: every baseline category's count is 0 there and must alert (a
    NULL counter would make 'NULL < threshold' silently drop the row)."""
    from ensembl_datacheck_spark.streaming.validate import (
        windowed_subtotals_drift,
    )

    src = tmp_path / "sd_null"
    rows = [(f"2024-01-01 00:00:{i:02d}", None) for i in range(10)]
    batch = spark.createDataFrame(rows, "ts_s string, event_type string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    batch.coalesce(1).write.mode("append").parquet(str(src))
    baseline = spark.createDataFrame([("a", 0.5), ("b", 0.5)],
                                     "category string, prop double")
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    alerts = windowed_subtotals_drift(stream, baseline, window="1 minute",
                                      watermark="10 minutes",
                                      min_proportion=0.5)
    q = (alerts.writeStream.format("memory").queryName("sd_null_alerts")
         .outputMode("append").start())
    try:
        late = spark.createDataFrame([("2024-01-01 01:00:00", "a")],
                                     "ts_s string, event_type string") \
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        late.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sd_null_alerts").collect()
        cats = {(str(r["window_start"]), r["category"]) for r in got}
        assert ("2024-01-01 00:00:00", "a") in cats, cats
        assert ("2024-01-01 00:00:00", "b") in cats, cats
        assert all(r["n"] == 0 for r in got
                   if str(r["window_start"]) == "2024-01-01 00:00:00")
    finally:
        q.stop()
