"""Corpus hygiene operators: deterministic hash splits and train/eval
contamination (operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators import corpus


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("doc_id")).cache()


def test_hash_split_fractions_and_determinism(spark, ids):
    out = corpus.hash_split(ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULL split at sum=1
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # deterministic: identical assignment on re-run and re-partitioning
    again = corpus.hash_split(ids.repartition(13), "doc_id",
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (out.join(again.withColumnRenamed("split", "s2"), "doc_id")
            .filter(F.col("split") != F.col("s2")).count()) == 0


def test_hash_split_grow_only_migration(spark, ids):
    """Growing a leading split never moves rows OUT of it (boundary only
    advances through bucket space)."""
    a = corpus.hash_split(ids, "doc_id", {"train": 0.5})
    b = corpus.hash_split(ids, "doc_id", {"train": 0.7})
    lost = (a.filter(F.col("split") == "train").select("doc_id")
            .join(b.filter(F.col("split") == "train").select("doc_id"),
                  "doc_id", "left_anti"))
    assert lost.count() == 0


def test_hash_split_rejects_bad_fractions(spark, ids):
    with pytest.raises(ValueError, match="fractions"):
        corpus.hash_split(ids, "doc_id", {"a": 0.8, "b": 0.4})


def test_contamination_overlap_and_decontaminate(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "training data pipelines need careful contamination checks")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "the quick brown fox jumps over a sleeping cat"),   # partial overlap
         (11, "completely novel evaluation text with no shared phrases"),
         (12, "the quick brown fox jumps over the lazy dog")],    # fully leaked
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in corpus.contamination_overlap(
        train, ev, "doc_id", "text", ngram=3).collect()}
    assert got[12]["contamination"] == 1.0
    assert got[11]["n_contaminated"] == 0
    assert 0 < got[10]["n_contaminated"] < got[10]["n_shingles"]

    # scrub train against the eval set: doc 1 is fully present in eval
    clean = corpus.decontaminate(train, ev, "doc_id", "text", ngram=3,
                                 max_contamination=0.5)
    assert {r["doc_id"] for r in clean.collect()} == {2}


def test_contamination_train_shingles_deduped_before_join(spark):
    """A shingle repeated across the whole train corpus reaches the join
    as ONE row (distinct-before-join), keeping the plan linear."""
    train = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(1000)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    out = corpus.contamination_overlap(train, ev, "doc_id", "text", ngram=3)
    [r] = out.collect()
    assert r["n_contaminated"] == 1 and r["n_shingles"] == 2


def test_deterministic_sample_nested_and_exact(spark, ids):
    """Samples are reproducible, partitioning-independent, and NESTED:
    the 10% sample is a subset of the 30% sample."""
    s10 = corpus.deterministic_sample(ids, "doc_id", 0.10)
    s30 = corpus.deterministic_sample(ids.repartition(7), "doc_id", 0.30)
    n10, n30 = s10.count(), s30.count()
    assert abs(n10 / 5000 - 0.10) < 0.02
    assert abs(n30 / 5000 - 0.30) < 0.02
    assert s10.join(s30, "doc_id", "left_anti").count() == 0  # nested
    with pytest.raises(ValueError):
        corpus.deterministic_sample(ids, "doc_id", 1.5)


def test_stratified_sample_per_stratum_fractions(spark):
    rows = [(i, "hot" if i % 2 == 0 else "cold") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, strata string")
    out = corpus.stratified_sample(df, "doc_id", "strata",
                                   {"hot": 0.1}, default=0.9)
    got = {r["strata"]: r["count"]
           for r in out.groupBy("strata").count().collect()}
    assert abs(got["hot"] / 5000 - 0.1) < 0.03
    assert abs(got["cold"] / 5000 - 0.9) < 0.03


class TestPassageDedup:
    """Sub-document exact dedup (corpus.passage_dedup): first global
    occurrence of a k-word passage is kept, later occurrences removed."""

    def _docs(self, spark):
        # k=3 passages.  docA: [p1][p2]; docB: [p1 copied][own passage];
        # docC: entirely docA's p1+p2 (fully duplicated);
        # docD: 4 words -> trailing partial passage [d4];
        # docE: empty text (excluded from output).
        rows = [
            ("a", "w1 w2 w3 x1 x2 x3"),
            ("b", "w1 w2 w3 y1 y2 y3"),
            ("c", "w1 w2 w3 x1 x2 x3"),
            ("d", "z1 z2 z3 z4"),
            ("e", ""),
        ]
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_first_occurrence_kept_and_later_removed(self, spark):
        from ensembl_datacheck_spark.operators.corpus import passage_dedup

        out = {
            r["doc_id"]: r
            for r in passage_dedup(self._docs(spark), passage_words=3).collect()
        }
        assert set(out) == {"a", "b", "c", "d"}  # empty doc excluded
        # docA is the lowest id: keeps everything
        assert out["a"]["text_deduped"] == "w1 w2 w3 x1 x2 x3"
        assert (out["a"]["n_passages"], out["a"]["n_kept"]) == (2, 2)
        # docB loses the passage docA already owns, keeps its own
        assert out["b"]["text_deduped"] == "y1 y2 y3"
        assert (out["b"]["n_passages"], out["b"]["n_kept"]) == (2, 1)
        # docC is fully duplicated: present, but empty after dedup
        assert out["c"]["text_deduped"] == ""
        assert (out["c"]["n_passages"], out["c"]["n_kept"]) == (2, 0)
        # trailing partial passage survives as its own unit
        assert out["d"]["text_deduped"] == "z1 z2 z3 z4"
        assert (out["d"]["n_passages"], out["d"]["n_kept"]) == (2, 2)

    def test_document_order_preserved_on_reassembly(self, spark):
        from ensembl_datacheck_spark.operators.corpus import passage_dedup

        # 3 passages; the MIDDLE one duplicates another doc's passage —
        # the kept first+last must rejoin in original order
        df = spark.createDataFrame(
            [("a", "dup dup dup"), ("z", "h1 h2 h3 dup dup dup t1 t2 t3")],
            "doc_id string, text string",
        )
        out = {r["doc_id"]: r for r in passage_dedup(df, passage_words=3).collect()}
        assert out["z"]["text_deduped"] == "h1 h2 h3 t1 t2 t3"
        assert (out["z"]["n_passages"], out["z"]["n_kept"]) == (3, 2)

    def test_within_doc_repetition_also_collapses(self, spark):
        from ensembl_datacheck_spark.operators.corpus import passage_dedup

        df = spark.createDataFrame(
            [("a", "r1 r2 r3 r1 r2 r3 r1 r2 r3")], "doc_id string, text string"
        )
        (row,) = passage_dedup(df, passage_words=3).collect()
        assert row["text_deduped"] == "r1 r2 r3"
        assert (row["n_passages"], row["n_kept"]) == (3, 1)

    def test_rejects_nonpositive_k(self, spark):
        from ensembl_datacheck_spark.operators.corpus import passage_dedup

        with pytest.raises(ValueError):
            passage_dedup(self._docs(spark), passage_words=0)


def _reference_passage_dedup(docs: list[tuple[str, str]], k: int):
    """Pure-Python reference: first global occurrence by (doc_id, pidx)
    of each k-word passage is kept; per-doc reassembly in pidx order."""
    passages = []  # (doc_id, pidx, ptext)
    for doc_id, text in docs:
        if not text:
            continue
        ws = text.split(" ")
        for pidx in range((len(ws) + k - 1) // k):
            passages.append((doc_id, pidx, " ".join(ws[pidx * k:(pidx + 1) * k])))
    first: dict[str, tuple] = {}
    for doc_id, pidx, ptext in sorted(passages):
        first.setdefault(ptext, (doc_id, pidx))
    out = {}
    for doc_id, text in docs:
        if not text:
            continue
        ws = text.split(" ")
        n_pass = (len(ws) + k - 1) // k
        kept = [
            " ".join(ws[p * k:(p + 1) * k])
            for p in range(n_pass)
            if first[" ".join(ws[p * k:(p + 1) * k])] == (doc_id, p)
        ]
        out[doc_id] = (n_pass, len(kept), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", [7, 101, 9001])
def test_passage_dedup_matches_python_reference_on_random_corpus(spark, seed):
    """Seeded-random equivalence: 80 docs over a 6-word vocabulary (heavy
    passage collisions by construction, incl. within-doc repeats and
    cross-doc boilerplate), Spark output == a 15-line pure-Python
    reference, value for value; and invariant under repartitioning."""
    import random

    from ensembl_datacheck_spark.operators.corpus import passage_dedup

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "e", "f"]
    docs = [
        (f"d{idx:03d}", " ".join(rng.choice(vocab)
                                 for _ in range(rng.randint(1, 25))))
        for idx in range(80)
    ]
    expected = _reference_passage_dedup(docs, k=4)

    df = spark.createDataFrame(docs, "doc_id string, text string")
    for frame in (df, df.repartition(13)):
        got = {
            r["doc_id"]: (r["n_passages"], r["n_kept"], r["text_deduped"])
            for r in passage_dedup(frame, passage_words=4).collect()
        }
        assert got == expected


@pytest.fixture(scope="module")
def weighted(spark, ids):
    """(doc_id, source, w): 4 sources, deterministic weights 1..50."""
    return ids.limit(800).select(
        "doc_id",
        F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string")).alias("source"),
        (F.pmod(F.col("doc_id") * 37, 50) + 1).alias("w"),
    ).cache()


def test_source_budget_mix_expectation_nesting_determinism(spark, weighted):
    totals = {r["source"]: r["t"] for r in
              weighted.groupBy("source").agg(F.sum("w").alias("t")).collect()}
    half = {s: t / 2 for s, t in totals.items()}
    out = corpus.source_budget_mix(weighted, "doc_id", "source", "w", half)
    kept = {r["source"]: r["k"] for r in
            out.groupBy("source").agg(F.sum("w").alias("k")).collect()}
    for s, t in totals.items():
        # expected-value guarantee: within sampling noise of the budget
        assert 0.3 * t < kept[s] < 0.7 * t, (s, kept[s], t)
    # budget >= total keeps everything (rate clamps at 1)
    full = corpus.source_budget_mix(
        weighted, "doc_id", "source", "w", {s: t * 2 for s, t in totals.items()}
    )
    assert full.count() == weighted.count()
    # nesting: half-budget sample is a subset of the full set and of a
    # 75%-budget sample (raising a budget only adds rows)
    bigger = corpus.source_budget_mix(
        weighted, "doc_id", "source", "w", {s: 0.75 * t for s, t in totals.items()}
    )
    assert out.select("doc_id").join(
        bigger.select("doc_id"), "doc_id", "left_anti").count() == 0
    # deterministic under re-partitioning
    again = corpus.source_budget_mix(
        weighted.repartition(7), "doc_id", "source", "w", half)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_source_budget_mix_default_and_missing_budget(spark, weighted):
    # default_budget=None: unnamed sources keep everything
    out = corpus.source_budget_mix(weighted, "doc_id", "source", "w", {"s0": 1.0})
    others = weighted.filter(F.col("source") != "s0").count()
    assert out.filter(F.col("source") != "s0").count() == others
    # a tiny budget floors the rate toward zero but never errors
    assert out.filter(F.col("source") == "s0").count() < 10
    with pytest.raises(ValueError):
        corpus.source_budget_mix(weighted, "doc_id", "source", "w", {"s0": -1})


def test_source_budget_mix_plan_broadcasts_rates(spark, weighted):
    """Scale contract: the rates side joins as a broadcast (no
    SortMergeJoin of the fact table against its own aggregate)."""
    out = corpus.source_budget_mix(
        weighted, "doc_id", "source", "w", {"s0": 100.0}, default_budget=200.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_source_budget_trim_exact_and_maximal(spark, weighted):
    budget = 500
    out = corpus.source_budget_trim(weighted, "doc_id", "source", "w", budget)
    kept = {r["source"]: r["k"] for r in
            out.groupBy("source").agg(F.sum("w").alias("k")).collect()}
    # never exceeds the budget
    assert all(k <= budget for k in kept.values()), kept
    # maximal: the first dropped doc (hash order) would push past budget
    ranked = weighted.withColumn(
        "h", F.md5(F.col("doc_id").cast("string"))
    ).orderBy("source", "h", "doc_id").collect()
    kept_ids = {r["doc_id"] for r in out.collect()}
    cum: dict[str, int] = {}
    for r in ranked:
        cum[r["source"]] = cum.get(r["source"], 0) + r["w"]
        assert (r["doc_id"] in kept_ids) == (cum[r["source"]] <= budget), r
    # nesting: bigger budget keeps a superset
    bigger = corpus.source_budget_trim(weighted, "doc_id", "source", "w", 800)
    assert out.select("doc_id").join(
        bigger.select("doc_id"), "doc_id", "left_anti").count() == 0


@pytest.fixture(scope="module")
def texts(spark):
    """200 docs: ids 0..99 distinct texts; 100..149 duplicate ids 0..49."""
    base = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    dups = spark.range(100, 150).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), (F.col("id") - 100).cast("string")).alias("text"),
    )
    return base.unionByName(dups).cache()


def test_leakage_safe_split_exact_mode(spark, texts):
    out = corpus.leakage_safe_split(
        texts, "doc_id", {"train": 0.6, "val": 0.2, "test": 0.2},
        text_col="text",
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    # every duplicate pair shares its representative's split
    for i in range(50):
        assert rows[i + 100] == rows[i], (i, rows[i], rows[i + 100])
    # docs with unique text follow plain hash_split on their own id
    plain = {r["doc_id"]: r["split"] for r in corpus.hash_split(
        texts.filter(F.col("doc_id") >= 50).filter(F.col("doc_id") < 100),
        "doc_id", {"train": 0.6, "val": 0.2, "test": 0.2}).collect()}
    for i in range(50, 100):
        assert rows[i] == plain[i]


def test_leakage_safe_split_pairs_mode(spark, texts):
    # chain 10-11-12 is one cluster: all three must share split
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (30, 31)], "id_a long, id_b long")
    out = corpus.leakage_safe_split(
        texts, "doc_id", {"train": 0.5, "val": 0.5}, pairs=pairs)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert rows[10] == rows[11] == rows[12]
    assert rows[30] == rows[31]
    with pytest.raises(ValueError):
        corpus.leakage_safe_split(texts, "doc_id", {"train": 1.0})
    with pytest.raises(ValueError):
        corpus.leakage_safe_split(
            texts, "doc_id", {"train": 1.0}, text_col="text", pairs=pairs)


def test_upsample_sources_counts_nesting_zero_shuffle(spark, weighted):
    per_src = {r["source"]: r["n"] for r in
               weighted.groupBy("source").agg(F.count("*").alias("n")).collect()}
    out = corpus.upsample_sources(
        weighted, "doc_id", "source",
        epochs={"s0": 2.5, "s1": 0.0}, default_epochs=1.0)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # expected-value row counts: 2.5x for s0 (within hash-sampling
    # noise), 0 for s1, exactly 1x elsewhere
    assert abs(got["s0"] / per_src["s0"] - 2.5) < 0.3, got
    assert "s1" not in got
    assert got["s2"] == per_src["s2"] and got["s3"] == per_src["s3"]
    # every row carries a dense 0-based epoch index
    mx = out.filter(F.col("source") == "s0").agg(
        F.min("epoch").alias("lo"), F.max("epoch").alias("hi")).collect()[0]
    assert mx["lo"] == 0 and mx["hi"] == 2
    # nesting: raising an epoch count only ADDS (id, epoch) copies
    bigger = corpus.upsample_sources(
        weighted, "doc_id", "source",
        epochs={"s0": 3.0, "s1": 0.0}, default_epochs=1.0)
    lost = out.select("doc_id", "epoch").join(
        bigger.select("doc_id", "epoch"), ["doc_id", "epoch"], "left_anti")
    assert lost.count() == 0
    # scale contract: pure projection + generator — no Exchange at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError):
        corpus.upsample_sources(weighted, "doc_id", "source", {"s0": -1.0})


def test_pack_sequences_gapless_deterministic(spark, weighted):
    L, B = 64, 8
    out = corpus.pack_sequences(weighted, "doc_id", "w", seq_len=L,
                                n_buckets=B).collect()
    # reconstruct every bucket's stream: in hash order the starts must
    # be gapless (each doc starts where the previous one ended) and
    # bin/offset must decompose the start exactly
    import hashlib

    def h(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    by_bucket: dict[int, list] = {}
    for r in out:
        assert 0 <= r["bucket"] < B
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert len(by_bucket) == B
    for rows in by_bucket.values():
        rows.sort(key=lambda r: (h(r["doc_id"]), r["doc_id"]))
        pos = 0
        for r in rows:
            assert r["bin"] == pos // L and r["offset"] == pos % L, r
            pos += r["w"]
    # deterministic under re-partitioning
    again = corpus.pack_sequences(weighted.repartition(11), "doc_id", "w",
                                  seq_len=L, n_buckets=B)
    assert sorted(map(tuple, out)) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError):
        corpus.pack_sequences(weighted, "doc_id", "w", seq_len=0)
    with pytest.raises(ValueError):
        corpus.pack_sequences(weighted, "doc_id", "w", seq_len=8, n_buckets=0)


def test_hash_split_rejects_zero_fraction_and_zero_buckets(spark, ids):
    # a 0.0 fraction must raise the explicit ValueError, not the
    # ZeroDivisionError the granularity hint used to hit
    with pytest.raises(ValueError, match="non-positive fraction"):
        corpus.hash_split(ids, "doc_id", {"train": 1.0, "test": 0.0})
    # buckets=0: pmod(h, 0) is NULL row-for-row — refuse loudly
    with pytest.raises(ValueError, match="buckets"):
        corpus.hash_split(ids, "doc_id", {"train": 1.0}, buckets=0)


def test_contamination_ignores_null_and_empty_docs(spark):
    """NULL/whitespace-only docs carry no shingles: one empty train doc
    must not mark empty eval docs contaminated, and decontaminate must
    not drop empty train docs over an empty eval doc."""
    train = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, ""), (11, None), (12, "genuinely novel eval content here")],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in corpus.contamination_overlap(
        train, ev, "doc_id", "text", ngram=3).collect()}
    assert set(got) == {12}          # empty/NULL eval docs emit no row
    assert got[12]["n_contaminated"] == 0
    kept = corpus.decontaminate(train, ev, "doc_id", "text", ngram=3,
                                max_contamination=0.0)
    # nothing leaks: all three train docs survive, including the empties
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}


def test_source_budget_mix_null_source_and_null_weights(spark):
    """Rows with a NULL source ride the null-safe join (default budget
    applies); a source whose weights are all NULL keeps all its rows
    instead of silently vanishing from the mix."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0),
         (3, None, 5.0), (4, None, 7.0),
         (5, "b", None), (6, "b", None)],
        "doc_id long, source string, w double",
    )
    out = corpus.source_budget_mix(df, "doc_id", "source", "w", {"a": 100.0})
    got = {r["doc_id"] for r in out.collect()}
    # default_budget=None keeps ALL rows of unnamed sources — including
    # the NULL source and the all-NULL-weight source
    assert got == {1, 2, 3, 4, 5, 6}
    # naming the NULL-weight source keeps it too (no computable rate ->
    # keep-all, never drop-all)
    out2 = corpus.source_budget_mix(df, "doc_id", "source", "w",
                                    {"a": 100.0, "b": 1.0})
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 3, 4, 5, 6}


def test_leakage_safe_split_null_text_not_one_cluster(spark):
    """NULL-text docs are their own singleton clusters: they spread over
    splits like any unique doc instead of all landing in the split of
    one global representative."""
    n = 400
    rows = [(i, None) for i in range(n)] + [(n, "dup"), (n + 1, "dup")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.leakage_safe_split(
        df, "doc_id", {"train": 0.5, "test": 0.5}, text_col="text"
    )
    by_null = {r["split"] for r in out.filter(F.col("text").isNull()).collect()}
    assert by_null == {"train", "test"}  # spread, not funneled
    # identical non-null content still clusters: both 'dup' docs share a split
    dup_splits = {r["split"] for r in out.filter(F.col("text") == "dup").collect()}
    assert len(dup_splits) == 1


def test_source_budget_trim_null_weight_is_zero_width(spark):
    """NULL weight counts as 0 toward the budget (missing->0, the
    row_subtotals convention): the row is kept deterministically and the
    running total of REAL weights still respects the budget — regardless
    of where the NULL row lands in md5 order."""
    rows = [(i, "s", None if i % 3 == 0 else 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w int")
    out = corpus.source_budget_trim(df, "doc_id", "source", "w", budget=50)
    got = out.collect()
    # python reference: walk md5 order, NULL advances the running total
    # by 0; keep while cum <= budget (zero-width rows past the cutoff
    # are trimmed like any other tail row)
    import hashlib

    def h(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    expected = set()
    cum = 0
    for doc_id, _, w in sorted(rows, key=lambda r: (h(r[0]), r[0])):
        cum += w or 0
        if cum <= 50:
            expected.add(doc_id)
    assert {r["doc_id"] for r in got} == expected
    # NULL rows before the cutoff survive (zero-width), and the kept
    # real weights respect the budget exactly
    assert any(r["w"] is None for r in got)
    assert sum(r["w"] or 0 for r in got) <= 50
    # determinism under re-partitioning
    again = corpus.source_budget_trim(
        df.repartition(7), "doc_id", "source", "w", budget=50)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_pack_sequences_null_weight_zero_width_placement(spark):
    """A NULL-weight doc gets a real zero-width placement (bin/offset at
    the current stream position) instead of NULL bin/offset, and does not
    advance the stream for its neighbors."""
    rows = [(i, None if i == 3 else 8) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    out = corpus.pack_sequences(df, "doc_id", "w", seq_len=16, n_buckets=2)
    got = out.collect()
    assert all(r["bin"] is not None and r["offset"] is not None for r in got)
    # reconstruct each bucket stream: NULL advances position by 0
    import hashlib

    def h(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    by_bucket: dict[int, list] = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows_ in by_bucket.values():
        rows_.sort(key=lambda r: (h(r["doc_id"]), r["doc_id"]))
        pos = 0
        for r in rows_:
            assert r["bin"] == pos // 16 and r["offset"] == pos % 16, r
            pos += r["w"] or 0


class TestTemperatureSourceSample:
    @pytest.fixture(scope="class")
    def mix(self, spark):
        # small: 10 docs, mid: 40, big: 160 — temperature should keep
        # small whole and thin big hardest
        rows = (
            [(i, "small") for i in range(10)]
            + [(100 + i, "mid") for i in range(40)]
            + [(1000 + i, "big") for i in range(160)]
        )
        return spark.createDataFrame(rows, "doc_id long, source string").cache()

    def test_smallest_source_kept_whole_and_rates_flatten(self, spark, mix):
        kept = corpus.temperature_source_sample(mix, "doc_id", "source")
        by = {
            r.source: r.n
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by["small"] == 10  # rate 1.0 at the anchor
        # expected rates: mid sqrt(10/40)=0.5, big sqrt(10/160)=0.25;
        # md5 buckets are uniform so counts land near expectation
        assert 10 <= by["mid"] <= 30
        assert 25 <= by["big"] <= 55
        # flattening: kept shares are closer to uniform than the input
        assert by["big"] / by["small"] < 160 / 10

    def test_tau_one_keeps_everything_and_nested_in_tau(self, spark, mix):
        all_kept = corpus.temperature_source_sample(
            mix, "doc_id", "source", tau=1.0
        )
        assert all_kept.count() == mix.count()
        lo = {
            r.doc_id
            for r in corpus.temperature_source_sample(
                mix, "doc_id", "source", tau=0.25
            ).collect()
        }
        hi = {
            r.doc_id
            for r in corpus.temperature_source_sample(
                mix, "doc_id", "source", tau=0.75
            ).collect()
        }
        assert lo <= hi  # monotone rate in tau => nested kept sets

    def test_weight_mode_and_null_source_survives(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 100), (2, "a", 100), (3, None, 5), (4, "b", 10)],
            "doc_id long, source string, w long",
        )
        kept = corpus.temperature_source_sample(
            df, "doc_id", "source", weight_col="w"
        )
        ids = {r.doc_id for r in kept.collect()}
        # NULL source has the smallest total -> it IS the anchor (rate
        # 1.0), so its row must survive via the null-safe join; other
        # sources keep a per-id hash fraction (not asserted — the md5
        # bucket of a single id is effectively a coin flip)
        assert 3 in ids

    def test_degenerate_totals_keep_all(self, spark):
        df = spark.createDataFrame(
            [(1, "a", None), (2, "a", None), (3, "b", 0)],
            "doc_id long, source string, w long",
        )
        kept = corpus.temperature_source_sample(
            df, "doc_id", "source", weight_col="w"
        )
        # every total is NULL/0: nothing is silently dropped
        assert kept.count() == 3

    def test_tau_validation(self, spark, mix):
        with pytest.raises(ValueError, match="tau"):
            corpus.temperature_source_sample(mix, "doc_id", "source", tau=1.5)
        with pytest.raises(ValueError, match="buckets"):
            corpus.temperature_source_sample(
                mix, "doc_id", "source", buckets=0
            )

    def test_plan_broadcasts_rates_no_wide_shuffle(self, spark, mix):
        from tests.test_plans import plan_str

        plan = plan_str(
            corpus.temperature_source_sample(mix, "doc_id", "source"), "simple"
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
