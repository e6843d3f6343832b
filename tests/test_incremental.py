"""Incremental dedup against a persisted store (operators/incremental.py)
plus the new repetition / hot-key profiling operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators import incremental
from ensembl_datacheck_spark.operators.skew import hot_keys
from ensembl_datacheck_spark.operators.text import repetition_signals


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    accepted = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "eta theta iota")],
        "doc_id long, text string",
    )
    # batch: 10 dups an accepted doc; 11/12 duplicate each other; 13 fresh
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),
            (11, "kappa lambda mu"),
            (12, "kappa lambda mu"),
            (13, "nu xi omicron"),
        ],
        "doc_id long, text string",
    )
    return accepted, batch


def test_flag_incremental_duplicates(spark, corpus_and_batch):
    accepted, batch = corpus_and_batch
    store = incremental.exact_store(accepted, "text")
    flagged = {
        r["doc_id"]: (r["dup_of_store"], r["dup_in_batch"])
        for r in incremental.flag_incremental_duplicates(
            batch, store, "text", "doc_id"
        ).collect()
    }
    assert flagged == {
        10: (True, False),
        11: (False, False),   # first occurrence in batch survives
        12: (False, True),
        13: (False, False),
    }


def test_incremental_dedup_exact_admits_one_copy(spark, corpus_and_batch):
    accepted, batch = corpus_and_batch
    store = incremental.exact_store(accepted, "text")
    admitted = incremental.incremental_dedup_exact(batch, store, "text", "doc_id")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [11, 13]
    # admitting then re-running against the grown store admits nothing new
    grown = store.unionByName(incremental.exact_store(admitted, "text")).distinct()
    again = incremental.incremental_dedup_exact(batch, grown, "text", "doc_id")
    assert again.count() == 0


def test_incremental_lsh_candidates_routes_to_store_and_batch(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    accepted = spark.createDataFrame(
        [(1, base), (2, "completely different accepted content about spark plans")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base + " indeed"),          # near-dup of accepted 1
            (11, "fresh unrelated text with novel words entirely"),
            (12, "fresh unrelated text with novel words entirely"),  # dup of 11
        ],
        "doc_id long, text string",
    )
    store = incremental.band_store(accepted, "doc_id", "text")
    cands = incremental.incremental_lsh_candidates(
        batch, store, "doc_id", "text"
    ).collect()
    got = {(r["new_id"], r["match_id"], r["match_src"]) for r in cands}
    assert (10, 1, "store") in got
    assert (12, 11, "batch") in got
    # the fresh doc never matches the store
    assert not any(n == 11 and s == "store" for (n, m, s) in got)


def test_incremental_lsh_store_bucket_cap_is_linear(spark):
    """A degenerate store bucket (500 identical accepted docs) is capped
    at band_store BUILD time: the probe sees at most cap_per_bucket
    representatives per colliding new doc."""
    dup = "repeated content that lands every copy in the same bucket okay"
    accepted = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit(dup).alias("text")
    )
    batch = spark.createDataFrame([(9000, dup)], "doc_id long, text string")
    store = incremental.band_store(accepted, "doc_id", "text", cap_per_bucket=20)
    # the cap is already paid: every band bucket holds <= 20 rows
    worst = (
        store.groupBy("bk").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert worst <= 20
    n = incremental.incremental_lsh_candidates(
        batch, store, "doc_id", "text"
    ).count()
    assert 1 <= n <= 20


def _store_side_ancestors(plan: str, scan_needle: str) -> list[str]:
    """Ancestor chain (tree lines) from the physical-plan node scanning
    ``scan_needle`` up to (and including) its nearest Join — the
    operators the STORE side flows through before joining the batch."""

    def marker_pos(ln: str) -> int:
        best = -1
        for m in ("+- ", ":- "):
            i = ln.find(m)
            if i >= 0 and (best == -1 or i < best):
                best = i
        return best

    lines = plan.split("\n")
    scan_idx = next(
        i for i, ln in enumerate(lines) if scan_needle in ln and "FileScan" in ln
    )
    depth = marker_pos(lines[scan_idx])
    anc: list[str] = []
    for j in range(scan_idx - 1, -1, -1):
        d = marker_pos(lines[j])
        if d == -1:
            d = 0
        if d < depth:
            anc.append(lines[j])
            depth = d
            if "Join" in lines[j]:
                break
        if depth <= 0:
            break
    return anc


def test_incremental_probe_never_reshuffles_store(spark, tmp_path):
    """Plan pin (VERDICT r2 item 3): with the store pre-capped at build
    time and persisted bucketed by bk, the probe's STORE side flows into
    the join with NO Exchange and NO Window — the per-ingest job never
    shuffles or re-ranks the persisted corpus store.  (A bucket-local
    Sort for the sort-merge variant is allowed: it is shuffle-free and
    AQE picks a broadcast of the batch side — no Sort at all — whenever
    the batch fits.)"""
    from ensembl_datacheck_spark.sources.io import write_bucketed

    dup = "repeated content that lands every copy in the same bucket okay"
    accepted = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), F.lit(dup).alias("text")
    )
    batch = spark.createDataFrame([(9000, dup)], "doc_id long, text string")
    store = incremental.band_store(accepted, "doc_id", "text")
    try:
        write_bucketed(store, "bk_store_plan_tbl", "bk", 4, sort_by="bk")
        st = spark.table("bk_store_plan_tbl")
        probe = incremental.incremental_lsh_candidates(
            batch, st, "doc_id", "text"
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # force the worst case (shuffled join, no batch broadcast) — the
        # store side must STILL reach the join without an Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = probe._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "Bucketed: true" in plan
        anc = "\n".join(_store_side_ancestors(plan, "bk_store_plan_tbl"))
        assert "Exchange" not in anc, anc
        assert "Window" not in anc, anc
        # candidates still flow: the plan is cheap, not broken
        assert probe.count() >= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_store_plan_tbl")


def test_repetition_signals(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),            # line 'a b' duplicated
            (2, "x y z w"),                   # no repetition
            (3, ""),                          # empty: zero lines, NULL fracs
            (4, "p q p q p q"),               # top 2-gram 'p q' dominates
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    assert out[1]["n_lines"] == 3
    assert out[1]["dup_line_frac"] == pytest.approx(2 / 3)
    assert out[1]["dup_line_char_frac"] == pytest.approx(6 / 9)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_frac"] is None
    # doc 4 2-grams: 'p q','q p','p q','q p','p q' → top 'p q' 3 of 5, all len 3
    assert out[4]["top_ngram_frac"] == pytest.approx(3 / 5)
    assert out[4]["dup_ngram_frac"] == 1.0
    # every input id must stay present
    assert set(out) == {1, 2, 3, 4}


def test_hot_keys_profiler(spark):
    df = spark.createDataFrame(
        [("hot", 1)] * 8 + [("warm", 2)] * 3 + [(None, 3)] * 5,
        "k string, v int",
    )
    out = hot_keys(df, ["k"], top_k=2).collect()
    assert [(r["value"], r["n"]) for r in out] == [("hot", 8), (None, 5)]
    assert out[0]["share"] == pytest.approx(8 / 16)
    with pytest.raises(ValueError, match="not in DataFrame"):
        hot_keys(df, ["missing"])


def test_hot_keys_multi_column_single_scan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "b")], "x int, y string"
    )
    out = hot_keys(df, ["x", "y"], top_k=1).collect()
    got = {r["column"]: (r["value"], r["n"]) for r in out}
    assert got == {"x": ("1", 2), "y": ("b", 2)}


def test_stream_dedup_against_store(spark, tmp_path):
    from ensembl_datacheck_spark.operators import incremental
    from ensembl_datacheck_spark.streaming.validate import (
        dedup_stream_against_store,
    )

    accepted = spark.createDataFrame(
        [(1, "already accepted content")], "doc_id long, text string"
    )
    store = incremental.exact_store(accepted, "text")

    src = tmp_path / "inc_src"
    src.mkdir()
    batch = spark.createDataFrame(
        [
            (10, "already accepted content", "2024-01-01 00:00:10"),
            (11, "brand new content", "2024-01-01 00:00:20"),
            (12, "brand new content", "2024-01-01 00:00:30"),  # stream dup
            (13, "other fresh content", "2024-01-01 00:01:00"),
            (14, None, "2024-01-01 00:01:30"),  # NULL text: passes through
        ],
        "doc_id long, text string, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp")).drop("ts_str")
    batch.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        dedup_stream_against_store(stream, store, "text", watermark="5 minutes")
        .writeStream.format("memory").queryName("inc_stream")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from inc_stream").collect()
    # store dup (doc 10) dropped; exactly ONE of the within-stream twins
    # 11/12 survives (dropDuplicatesWithinWatermark keeps the first to
    # arrive, and arrival order within a micro-batch is partition-order
    # dependent); doc 13 passes through
    assert sorted(r["text"] for r in rows if r["text"] is not None) == [
        "brand new content", "other fresh content"
    ]
    ids = {r["doc_id"] for r in rows}
    assert 13 in ids and 14 in ids and 10 not in ids and ids & {11, 12}


def test_null_text_rows_are_never_duplicates(spark):
    """SQL semantics: NULL never equals NULL — NULL-text rows pass
    through both the batch flagger and the stream dedup un-flagged."""
    store = incremental.exact_store(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"), "text"
    )
    batch = spark.createDataFrame(
        [(10, None), (11, None), (12, "x")], "doc_id long, text string"
    )
    flagged = {
        r["doc_id"]: (r["dup_of_store"], r["dup_in_batch"])
        for r in incremental.flag_incremental_duplicates(
            batch, store, "text", "doc_id"
        ).collect()
    }
    assert flagged == {10: (False, False), 11: (False, False), 12: (True, False)}


def test_runner_without_fact_table_skips_fused_checks(spark, seq_fixture):
    import ensembl_datacheck_spark.checks  # noqa: F401
    from ensembl_datacheck_spark.plans.runner import Runner
    from ensembl_datacheck_spark.registry import registry
    from ensembl_datacheck_spark.verdict import Status

    from ensembl_datacheck_spark.sources import synth
    meta = synth.gen_meta(spark, seq_fixture["sources"])
    summary = Runner(
        spark, {"meta": meta, "sources": seq_fixture["sources"]}, n_buckets=8
    ).run(registry.default_suite(), write_checkpoints=False)
    # every sequences-fused check skips with a reason; meta spec-pack
    # checks still run (and fail on their injected defects) — no KeyError
    by = {r.check_name: r for r in summary.results}
    assert by["SequencesCompleteness"].status == Status.SKIP
    assert by["TokenInvariants"].status == Status.SKIP
    assert by["MetaKeyRequired"].status == Status.FAIL


def test_quantile_drift_flags_current_only_group(spark):
    from ensembl_datacheck_spark.operators.drift import (
        quantile_drift_violations,
        quantile_profile,
    )

    base = quantile_profile(
        spark.createDataFrame([("a", 1.0)], "g string, v double"),
        "v", (0.5,), group_col="g",
    )
    cur = quantile_profile(
        spark.createDataFrame([("a", 1.0), ("NEW", 9.0)], "g string, v double"),
        "v", (0.5,), group_col="g",
    )
    out = {r["g"]: r for r in quantile_drift_violations(
        cur, base, group_cols=["g"]).collect()}
    assert "NEW" in out and out["NEW"]["base_value"] is None
    assert "a" not in out  # identical quantile: no breach


def test_quantile_drift_agree_null_is_not_drift(spark):
    """A group whose quantile is NULL in BOTH snapshots (e.g. its value
    column is all-NULL in both) AGREES — not drift; NULL on exactly one
    side still breaches (ADVICE r2)."""
    from ensembl_datacheck_spark.operators.drift import (
        quantile_drift_violations,
    )

    base = spark.createDataFrame(
        [("both_null", 0.5, None), ("one_null", 0.5, 1.0), ("ok", 0.5, 2.0)],
        "g string, q double, value double",
    )
    cur = spark.createDataFrame(
        [("both_null", 0.5, None), ("one_null", 0.5, None), ("ok", 0.5, 2.0)],
        "g string, q double, value double",
    )
    out = {
        r["g"]
        for r in quantile_drift_violations(cur, base, group_cols=["g"]).collect()
    }
    assert out == {"one_null"}


def test_batch_banded_uncapped_every_new_doc_probes_store(spark):
    """A new doc ranked past the (former) batch-side band cap must still
    find its store near-dup: 30 identical batch docs all collide in the
    same band buckets, and the HIGHEST-id one (rank 30 > cap 20 under the
    old capped banding) still gets a 'store' match (ADVICE r3 medium)."""
    dup = "shared content every copy lands in the very same band bucket"
    accepted = spark.createDataFrame([(1, dup)], "doc_id long, text string")
    batch = spark.range(100, 130).select(
        F.col("id").alias("doc_id"), F.lit(dup).alias("text")
    )
    store = incremental.band_store(accepted, "doc_id", "text")
    cands = incremental.incremental_lsh_candidates(
        batch, store, "doc_id", "text"
    )
    store_hits = {
        r["new_id"]
        for r in cands.filter(F.col("match_src") == "store").collect()
    }
    assert store_hits == set(range(100, 130))  # every batch doc, not 20


def test_overfull_store_buckets_guard(spark):
    """The pre-capped-store contract probe: an uncapped store shows its
    overfull band keys; a properly built store shows none; and the
    opt-in probe-side cap bounds a legacy store's join fan-out."""
    dup = "repeated content that lands every copy in the same bucket okay"
    accepted = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(dup).alias("text")
    )
    uncapped = incremental.band_store(
        accepted, "doc_id", "text", cap_per_bucket=None
    )
    assert incremental.overfull_store_buckets(uncapped, 20).count() > 0
    capped = incremental.band_store(accepted, "doc_id", "text", cap_per_bucket=20)
    assert incremental.overfull_store_buckets(capped, 20).count() == 0

    batch = spark.createDataFrame([(9000, dup)], "doc_id long, text string")
    n = (
        incremental.incremental_lsh_candidates(
            batch, uncapped, "doc_id", "text", store_probe_cap=5
        )
        .filter(F.col("match_src") == "store")
        .count()
    )
    assert 1 <= n <= 5


def test_quantile_drift_vanished_null_group_breaches(spark):
    """A baseline group whose quantile is NULL and that then VANISHES
    from current must breach (presence mismatch) — value-NULL-ness alone
    cannot distinguish it from the agree-NULL case (ADVICE r3)."""
    from ensembl_datacheck_spark.operators.drift import (
        quantile_drift_violations,
    )

    base = spark.createDataFrame(
        [("gone_null", 0.5, None), ("stays_null", 0.5, None)],
        "g string, q double, value double",
    )
    cur = spark.createDataFrame(
        [("stays_null", 0.5, None)], "g string, q double, value double"
    )
    out = {
        r["g"]
        for r in quantile_drift_violations(cur, base, group_cols=["g"]).collect()
    }
    assert out == {"gone_null"}


def test_hot_keys_builds_lazily_single_scan(spark, tmp_path):
    """Plan construction must trigger ZERO Spark jobs (VERDICT r3: the
    old eager df.count() was a full second scan of the fact table before
    the profiling job even started), and the executed plan must scan the
    input ONCE — the per-column share totals ride the counts shuffle via
    AQE exchange reuse, not a second scan."""
    path = str(tmp_path / "hk_fact")
    spark.createDataFrame(
        [("hot", 1)] * 8 + [("warm", 2)] * 3, "k string, v int"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    sc = spark.sparkContext
    group = "hot-keys-lazy-build-probe"
    sc.setJobGroup(group, "hot_keys plan construction must be lazy")
    try:
        plan = hot_keys(df, ["k", "v"], top_k=2)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert list(jobs) == [], f"plan construction ran Spark jobs: {jobs}"
    out = {(r["column"], r["rank"]): r for r in plan.collect()}
    assert out[("k", 1)]["value"] == "hot" and out[("k", 1)]["n"] == 8
    assert out[("k", 1)]["share"] == pytest.approx(8 / 11)
    # pin: one FileScan + a ReusedExchange in the final adaptive plan
    # (toString carries the Initial Plan section too — cut it off)
    phys = plan._jdf.queryExecution().executedPlan().toString()
    final = phys.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 1, final
    assert "ReusedExchange" in final, final


class TestIncrementalPassageDedup:
    """Passage-level batch-vs-store dedup (incremental.passage_store /
    incremental_passage_dedup)."""

    def test_store_and_batch_first_occurrence(self, spark):
        from ensembl_datacheck_spark.operators.incremental import (
            incremental_passage_dedup,
            passage_store,
        )

        corpus = spark.createDataFrame(
            [("c1", "s1 s2 s3 s4 s5 s6")], "doc_id string, text string"
        )
        store = passage_store(corpus, "text", passage_words=3)
        assert store.count() == 2  # two distinct 3-word passages
        batch = spark.createDataFrame(
            [
                # first passage hits the store, second is novel
                ("n1", "s1 s2 s3 a1 a2 a3"),
                # duplicates n1's novel passage within the batch; its own
                # second passage is novel
                ("n2", "a1 a2 a3 b1 b2 b3"),
                # fully covered: one store passage + n1's batch passage
                ("n3", "s4 s5 s6 a1 a2 a3"),
            ],
            "doc_id string, text string",
        )
        out = {
            r["doc_id"]: r
            for r in incremental_passage_dedup(
                batch, store, "doc_id", "text", passage_words=3
            ).collect()
        }
        assert out["n1"]["text_deduped"] == "a1 a2 a3"
        assert (out["n1"]["n_passages"], out["n1"]["n_kept"]) == (2, 1)
        assert out["n2"]["text_deduped"] == "b1 b2 b3"
        assert (out["n2"]["n_passages"], out["n2"]["n_kept"]) == (2, 1)
        assert out["n3"]["text_deduped"] == ""
        assert (out["n3"]["n_passages"], out["n3"]["n_kept"]) == (2, 0)

    def test_store_append_makes_readmission_impossible(self, spark):
        from pyspark.sql import functions as F

        from ensembl_datacheck_spark.operators.incremental import (
            incremental_passage_dedup,
            passage_store,
        )

        batch = spark.createDataFrame(
            [("n1", "x1 x2 x3")], "doc_id string, text string"
        )
        store = passage_store(batch, "text", passage_words=3)
        again = incremental_passage_dedup(
            batch, store, "doc_id", "text", passage_words=3
        ).collect()[0]
        assert again["n_kept"] == 0 and again["text_deduped"] == ""

    def test_empty_store_equals_passage_dedup(self, spark):
        """Against an empty store, the incremental tier degenerates to
        plain within-batch passage_dedup."""
        from ensembl_datacheck_spark.operators.corpus import passage_dedup
        from ensembl_datacheck_spark.operators.incremental import (
            incremental_passage_dedup,
        )

        batch = spark.createDataFrame(
            [("a", "p q r p q r"), ("b", "p q r z z z")],
            "doc_id string, text string",
        )
        empty = spark.createDataFrame([], "passage_hash string")
        inc = {
            tuple(r)
            for r in incremental_passage_dedup(
                batch, empty, "doc_id", "text", passage_words=3
            ).collect()
        }
        plain = {
            tuple(r)
            for r in passage_dedup(batch, "doc_id", "text", passage_words=3)
            .collect()
        }
        assert inc == plain
