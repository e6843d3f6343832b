"""Deterministic synthetic fixtures (FIXTURES.md): the `sequences` fact
table per BASELINE.json input_hint, the `sources` dimension, and baseline
snapshot stats — with violations injected at *known residues* so every
check family has exact expected verdicts.

Modeled on the reference's golden-fixture strategy
(t/test-genome-DBs/* + MultiTestDB, known-answer assertions in
t/TestDataCheck.t:54-58) but generated Spark-natively: every column is a
pure function of ``spark.range`` ids through xxhash64, so generation is
fully distributed, reproducible at any scale, and never materializes data
on the driver.  Violation counts scale with row count (residues mod
10_000), matching FIXTURES.md's "per 10k rows" quotas.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50257
N_SOURCES = 20
HOT_SOURCE = "src_00"  # ~40% of rows — the skew hot key (FIXTURES.md §1)

# residues mod 10_000 carrying injected violations (FIXTURES.md §1)
DUP_RESIDUES = (7, 2007, 4007, 6007, 8007)        # 5 dup pairs / 10k
ORPHAN_RESIDUES = (11, 3011, 6011)                # 3 orphan sources / 10k
NULL_ID_RESIDUES = (21, 5021)                     # null doc_id
EMPTY_ID_RESIDUES = (23, 5023)                    # empty doc_id
LEN_MISMATCH_RESIDUES = (31, 1031, 2031, 3031, 4031, 5031)  # size(tokens) != n_tok
NULL_TOKENS_RESIDUES = (41, 5041)
EMPTY_TOKENS_RESIDUES = (43, 5043)
BAD_TOKEN_RESIDUES = (51, 3051, 6051)             # out-of-domain token value


def _u(col, salt: int):
    """Deterministic uniform in [0,1) from a long column."""
    h = F.xxhash64(col, F.lit(salt))
    return (F.pmod(h, F.lit(1 << 40))).cast("double") / float(1 << 40)


def gen_sequences(
    spark: SparkSession,
    n_rows: int,
    n_partitions: int = 8,
    median_tok: int = 512,
    max_tok: int = 8192,
    seed: int = 42,
    inject_violations: bool = True,
) -> DataFrame:
    """Build the `sequences` table: (doc_id string, tokens array<int32>,
    n_tok int, source string).

    n_tok is log-normal-ish (median ``median_tok``, clamped [1, max_tok])
    via an Irwin-Hall normal approximation over hash-uniforms; tokens are
    `sequence` + `transform` (all JVM-side, whole-stage codegen — no
    Python in the generation path); source is Zipf-skewed with one hot key
    at ~40% for salted-agg testing.
    """
    df = spark.range(0, n_rows, 1, n_partitions)
    mod = F.pmod(F.col("id"), F.lit(10_000))

    # --- n_tok: exp(ln(median) + 0.9 * z), z ~ approx N(0,1) (Irwin-Hall) ---
    z = (
        _u(F.col("id"), seed + 1)
        + _u(F.col("id"), seed + 2)
        + _u(F.col("id"), seed + 3)
        + _u(F.col("id"), seed + 4)
        - F.lit(2.0)
    ) / F.lit(math.sqrt(4 / 12.0))
    n_tok = F.least(
        F.lit(max_tok),
        F.greatest(
            F.lit(1), F.round(F.exp(F.lit(math.log(median_tok)) + z * 0.9)).cast("int")
        ),
    )

    # --- source: skewed over N_SOURCES, hot key ≈ 40% ---
    su = _u(F.col("id"), seed + 5)
    src_idx = F.floor(F.pow(su, F.lit(3.0)) * N_SOURCES).cast("int")
    source = F.format_string("src_%02d", src_idx)

    # --- tokens: array<int32> of length n_tok, values hash-derived ---
    tokens = F.transform(
        F.sequence(F.lit(1), F.col("n_tok")),
        lambda i: F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed + 6)),
                         F.lit(VOCAB_SIZE)).cast("int"),
    )

    out = (
        df.withColumn("n_tok", n_tok)
        .withColumn("source", source)
        .withColumn("tokens", tokens)
        .withColumn("doc_id", F.format_string("doc_%012d", F.col("id")))
    )

    if inject_violations:
        out = (
            out
            # duplicate doc_id pairs: residue rows copy the previous row's id
            .withColumn(
                "doc_id",
                F.when(mod.isin(*DUP_RESIDUES),
                       F.format_string("doc_%012d", F.col("id") - 1))
                .otherwise(F.col("doc_id")),
            )
            # orphan sources (not in the dimension)
            .withColumn(
                "source",
                F.when(mod.isin(*ORPHAN_RESIDUES),
                       F.format_string("src_orphan_%d", mod % 7))
                .otherwise(F.col("source")),
            )
            # null / empty doc_id (completeness)
            .withColumn(
                "doc_id",
                F.when(mod.isin(*NULL_ID_RESIDUES), F.lit(None).cast("string"))
                .when(mod.isin(*EMPTY_ID_RESIDUES), F.lit(""))
                .otherwise(F.col("doc_id")),
            )
            # n_tok / size(tokens) mismatch (per-row token invariant)
            .withColumn(
                "n_tok",
                F.when(mod.isin(*LEN_MISMATCH_RESIDUES), F.col("n_tok") + 1)
                .otherwise(F.col("n_tok")),
            )
            # null / empty token arrays
            .withColumn(
                "tokens",
                F.when(mod.isin(*NULL_TOKENS_RESIDUES),
                       F.lit(None).cast("array<int>"))
                .when(mod.isin(*EMPTY_TOKENS_RESIDUES),
                      F.array().cast("array<int>"))
                .otherwise(F.col("tokens")),
            )
            # out-of-domain token values (first element -> -5 or vocab+3)
            .withColumn(
                "tokens",
                F.when(
                    mod.isin(*BAD_TOKEN_RESIDUES),
                    F.concat(
                        F.array(
                            # every BAD residue is odd, so parity would
                            # pick -5 always — key on the residue itself
                            # to cover BOTH domain violations
                            F.when(mod == BAD_TOKEN_RESIDUES[1],
                                   F.lit(VOCAB_SIZE + 3))
                            .otherwise(F.lit(-5))
                            .cast("int")
                        ),
                        F.slice(F.col("tokens"), 2, 1_000_000),
                    ),
                ).otherwise(F.col("tokens")),
            )
        )

    return out.select("doc_id", "tokens", "n_tok", "source")


def expected_violation_counts(n_rows: int) -> dict[str, int]:
    """Exact expected violation counts for a table of ``n_rows`` generated
    with violations — the known-answer golden (FIXTURES.md §5)."""

    def n_res(residues) -> int:
        return sum(
            (n_rows - r + 10_000 - 1) // 10_000 for r in residues if r < n_rows
        )

    return {
        "dup_rows": 2 * n_res(DUP_RESIDUES),  # each dup = pair of rows
        "dup_keys": n_res(DUP_RESIDUES),
        "orphan_source_rows": n_res(ORPHAN_RESIDUES),
        "null_doc_id": n_res(NULL_ID_RESIDUES),
        "empty_doc_id": n_res(EMPTY_ID_RESIDUES),
        "len_mismatch": n_res(LEN_MISMATCH_RESIDUES),
        "null_tokens": n_res(NULL_TOKENS_RESIDUES),
        "empty_tokens": n_res(EMPTY_TOKENS_RESIDUES),
        "bad_token_rows": n_res(BAD_TOKEN_RESIDUES),
    }


# residues mod 10_000 carrying injected embedding defects (one per
# vectors.py hygiene rule; 2 rows per 10k each)
EMB_NULL_RESIDUES = (61, 5061)
EMB_EMPTY_RESIDUES = (63, 5063)
EMB_DIM_RESIDUES = (71, 5071)      # vector truncated to dim // 2
EMB_NAN_RESIDUES = (73, 5073)      # first element -> NaN
EMB_INF_RESIDUES = (81, 5081)      # first element -> +Inf
EMB_ZERO_RESIDUES = (83, 5083)     # all elements -> 0.0


def gen_embeddings(
    spark: SparkSession,
    n_rows: int,
    dim: int = 64,
    n_partitions: int = 8,
    seed: int = 42,
    inject_violations: bool = True,
) -> DataFrame:
    """The `embeddings` companion table: (vec_id long, embedding
    array<float>, label int) — unit-normalized hash-derived vectors, the
    input shape of the ANN / semantic-dedup operators
    (operators/similarity.py) and of the EmbeddingHygiene check.

    Same golden-fixture strategy as ``gen_sequences``: every element is
    a pure function of the row id through xxhash64 (fully distributed,
    reproducible at any scale), with one defect class per residue so
    EmbeddingHygiene has exact expected verdicts.
    """
    df = spark.range(0, n_rows, 1, n_partitions)
    mod = F.pmod(F.col("id"), F.lit(10_000))

    raw = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id"), j, F.lit(seed + 7)),
                   F.lit(1 << 40)).cast("double") / float(1 << 40)
            - F.lit(0.5)
        ),
    )
    sq = F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    emb = F.transform(raw, lambda x: (x / F.sqrt(sq)).cast("float"))
    label = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 8)), F.lit(10)).cast(
        "int"
    )
    out = df.withColumn("embedding", emb).withColumn("label", label)

    if inject_violations:
        nan = F.lit(float("nan")).cast("float")
        inf = F.lit(float("inf")).cast("float")
        vec = F.col("embedding")
        out = out.withColumn(
            "embedding",
            F.when(mod.isin(*EMB_NULL_RESIDUES),
                   F.lit(None).cast("array<float>"))
            .when(mod.isin(*EMB_EMPTY_RESIDUES),
                  F.array().cast("array<float>"))
            .when(mod.isin(*EMB_DIM_RESIDUES), F.slice(vec, 1, dim // 2))
            .when(mod.isin(*EMB_NAN_RESIDUES),
                  F.concat(F.array(nan), F.slice(vec, 2, dim)))
            .when(mod.isin(*EMB_INF_RESIDUES),
                  F.concat(F.array(inf), F.slice(vec, 2, dim)))
            .when(mod.isin(*EMB_ZERO_RESIDUES),
                  F.transform(vec, lambda x: F.lit(0.0).cast("float")))
            .otherwise(vec),
        )

    return out.select(F.col("id").alias("vec_id"), "embedding", "label")


def gen_sources(spark: SparkSession) -> DataFrame:
    """The `sources` dimension (FIXTURES.md §2): ~20 rows, PK `source`,
    expected weight share (used by drift checks), active flag (inactive
    sources must have 0 fact rows — constrained-FK analogue,
    ForeignKeys.pm:82-89)."""
    rows = []
    for i in range(N_SOURCES):
        # P(idx = i) = ((i+1)/N)^(1/3)... share from the cube mapping:
        lo, hi = (i / N_SOURCES) ** (1 / 3.0), ((i + 1) / N_SOURCES) ** (1 / 3.0)
        rows.append((f"src_{i:02d}", hi - lo, True))
    rows.append(("src_inactive", 0.0, False))
    return spark.createDataFrame(rows, "source string, weight_expected double, active boolean")


def ntok_bin(col=None):
    """Histogram bin for n_tok: floor(log2) — 14 bins over [1, 8192].
    Binning is the per-partition-combinable representation drift stats
    need (SURVEY.md §4: bin first, then combine counts — never sample)."""
    if col is None:
        col = F.col("n_tok")
    return F.floor(F.log2(F.greatest(col.cast("double"), F.lit(1.0)))).cast("int")


def gen_baseline_stats(
    spark: SparkSession,
    sequences: DataFrame,
    shifted: bool = False,
    unigram_top_k: int = 64,
) -> DataFrame:
    """Baseline snapshot (FIXTURES.md §3): long-format stats table
    (stat_key, category, value).  ``shifted=False`` reproduces the live
    distribution (drift checks pass); ``shifted=True`` shifts the n_tok
    histogram one bin up, halves the hot source's count, and grossly
    reweights the unigram baseline (top-K x30, __other__ halved; the
    drift checks fail with known categories) —
    mirroring the pass+fail golden pairs of t/TestDataCheck.t:135-139."""
    hist = (
        sequences.filter(F.col("n_tok").isNotNull())
        .groupBy(ntok_bin().alias("bin"))
        .count()
    )
    if shifted:
        hist = hist.withColumn("bin", F.col("bin") + 1)
    n_tok_hist = hist.select(
        F.lit("n_tok_hist").alias("stat_key"),
        F.col("bin").cast("string").alias("category"),
        F.col("count").cast("double").alias("value"),
    )
    src = sequences.groupBy("source").count()
    if shifted:
        src = src.withColumn(
            "count",
            F.when(F.col("source") == HOT_SOURCE, (F.col("count") / 2).cast("long"))
            .otherwise(F.col("count")),
        )
    src_counts = src.select(
        F.lit("source_count").alias("stat_key"),
        F.col("source").alias("category"),
        F.col("count").cast("double").alias("value"),
    )
    # quantile snapshot rows (NTokQuantileDrift baseline): exact
    # percentiles at snapshot time; shifted=True inflates them 1.25×, a
    # clear breach of the check's default 5% relative tolerance
    from ensembl_datacheck_spark.operators.drift import quantile_profile

    q_prof = quantile_profile(
        sequences.filter(F.col("n_tok").isNotNull()), "n_tok",
        (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    )
    if shifted:
        q_prof = q_prof.withColumn("value", F.col("value") * 1.25)
    n_tok_q = q_prof.select(
        F.lit("n_tok_quantile").alias("stat_key"),
        F.col("q").cast("string").alias("category"),
        F.col("value"),
    )

    # token_unigram rows (TokenUnigramDrift baseline): the top-K tokens
    # by corpus count plus one __other__ bucket carrying the remaining
    # mass — the baseline-aligned representation the check folds the
    # live profile onto.  Deterministic top-K (count desc, token asc).
    from ensembl_datacheck_spark.operators.drift import unigram_profile

    prof = unigram_profile(sequences)
    topk = prof.orderBy(F.col("count").desc(), "token").limit(unigram_top_k).collect()
    total = prof.agg(F.sum("count").alias("t")).collect()[0]["t"] or 0
    uni_rows = [
        ("token_unigram", str(r["token"]), float(r["count"])) for r in topk
    ]
    uni_rows.append(
        ("token_unigram", "__other__",
         float(total - sum(r["count"] for r in topk)))
    )
    if shifted:
        # 30x every top-K token and halve the __other__ mass: the synth
        # vocab is uniform, so top-64 of ~50k tokens carries <1% of the
        # mass — only a gross reweight moves enough share to breach BOTH
        # the chi-square and the 5% L1 total-variation bound
        uni_rows = [
            (k, cat, v * (0.5 if cat == "__other__" else 30.0))
            for (k, cat, v) in uni_rows
        ]
    unigrams = spark.createDataFrame(
        uni_rows, "stat_key string, category string, value double"
    )
    return (
        n_tok_hist.unionByName(src_counts)
        .unionByName(n_tok_q)
        .unionByName(unigrams)
    )


def gen_sequences_snapshot(
    spark: SparkSession,
    sequences: DataFrame,
    changed_mod: int = 97,
    dropped_mod: int = 89,
    n_extra: int = 5,
) -> DataFrame:
    """Snapshot fixture for TokenSnapshotEquality, derived from a
    sequences table (typically the inject_violations=False variant):

    * docs with ``pmod(xxhash64(doc_id), changed_mod) == 0`` carry a
      perturbed first token in the snapshot → diff as ``changed``;
    * docs with ``pmod(xxhash64(doc_id), dropped_mod) == 0`` (and not
      already changed) are absent from the snapshot → ``new_in_current``;
    * ``n_extra`` synthetic docs exist only in the snapshot →
      ``missing_in_current``.

    Tests derive exact expected counts by evaluating the same hash
    predicates on the input — the fixture never hardcodes counts."""
    h = F.pmod(F.xxhash64("doc_id"), F.lit(changed_mod))
    hd = F.pmod(F.xxhash64("doc_id"), F.lit(dropped_mod))
    perturbed = F.concat(
        F.array(
            F.pmod(F.element_at("tokens", 1) + 1, F.lit(VOCAB_SIZE)).cast("int")
        ),
        F.slice(F.col("tokens"), 2, 1_000_000),
    )
    snap = (
        sequences.filter((hd != 0) | (h == 0))
        .withColumn(
            "tokens",
            F.when(
                (h == 0) & F.col("tokens").isNotNull() & (F.size("tokens") > 0),
                perturbed,
            ).otherwise(F.col("tokens")),
        )
    )
    extra = spark.range(n_extra).select(
        F.format_string("snap_only_%06d", F.col("id")).alias("doc_id"),
        F.array(F.lit(1), F.lit(2), F.lit(3)).cast("array<int>").alias("tokens"),
        F.lit(3).alias("n_tok"),
        F.lit("src_00").alias("source"),
    )
    return snap.select("doc_id", "tokens", "n_tok", "source").unionByName(extra)


# meta-table injected-violation constants (spec-pack checks): which
# entities carry which defect — exact expected counts for tests
META_MISSING_KEY_ENTITY = "src_03"    # loses its required 'source.weight'
META_DUP_KEY_ENTITY = "src_05"        # singleton 'source.active' twice
META_DESYNC_ENTITY = "src_07"         # meta weight != sources.weight_expected
META_RANGE_ENTITY = "src_09"          # weight tag outside [0, 1]

#: keys every entity must carry (CompareMetaKeys.pm-style completeness)
META_REQUIRED_KEYS = ("source.name", "source.weight", "source.active")
#: keys allowed at most once per entity (MetaKeyCardinality.pm:44-85)
META_SINGLETON_KEYS = ("source.name", "source.weight", "source.active")


def gen_meta(
    spark: SparkSession,
    sources: DataFrame,
    inject_violations: bool = True,
) -> DataFrame:
    """The `meta` tag table (entity_id, meta_key, meta_value) — the
    analogue of the reference's meta/method_link_species_set_tag tables
    that MetaKeyCardinality.pm / CompareMetaKeys.pm / Test::Compara
    has_tags+cmp_tag validate.  One entity per source row; values are
    strings (the reference's meta_value is VARCHAR).  With
    ``inject_violations`` four entities carry one known defect each (see
    META_*_ENTITY constants)."""
    m = sources.select(
        F.col("source").alias("entity_id"),
        F.col("weight_expected"),
        F.col("active"),
    )
    rows = (
        m.select(
            "entity_id",
            F.lit("source.name").alias("meta_key"),
            F.col("entity_id").alias("meta_value"),
        )
        .unionByName(
            m.select(
                "entity_id",
                F.lit("source.weight").alias("meta_key"),
                F.col("weight_expected").cast("string").alias("meta_value"),
            )
        )
        .unionByName(
            m.select(
                "entity_id",
                F.lit("source.active").alias("meta_key"),
                F.col("active").cast("string").alias("meta_value"),
            )
        )
        # multi-valued key: aliases are legitimately repeated (cardinality
        # checks must NOT flag keys outside the singleton list)
        .unionByName(
            m.select(
                "entity_id",
                F.lit("source.alias").alias("meta_key"),
                F.concat(F.lit("alias_a_"), F.col("entity_id")).alias("meta_value"),
            )
        )
        .unionByName(
            m.select(
                "entity_id",
                F.lit("source.alias").alias("meta_key"),
                F.concat(F.lit("alias_b_"), F.col("entity_id")).alias("meta_value"),
            )
        )
        # JSON-document tag value (CheckJSONObjects.pm:44-69 analogue):
        # a structured per-entity blob the JsonValueSpec check validates
        .unionByName(
            m.select(
                "entity_id",
                F.lit("source.props").alias("meta_key"),
                F.to_json(
                    F.struct(
                        F.col("entity_id").alias("name"),
                        F.col("active").alias("active"),
                    )
                ).alias("meta_value"),
            )
        )
    )
    if not inject_violations:
        return rows
    rows = rows.filter(
        ~(
            (F.col("entity_id") == META_MISSING_KEY_ENTITY)
            & (F.col("meta_key") == "source.weight")
        )
    )
    extra = spark.createDataFrame(
        [
            (META_DUP_KEY_ENTITY, "source.active", "false"),
        ],
        "entity_id string, meta_key string, meta_value string",
    )
    rows = rows.unionByName(extra)
    # desync + out-of-range rewrites on the weight tag
    rows = rows.withColumn(
        "meta_value",
        F.when(
            (F.col("entity_id") == META_DESYNC_ENTITY)
            & (F.col("meta_key") == "source.weight"),
            F.lit("0.123456789"),
        )
        .when(
            (F.col("entity_id") == META_RANGE_ENTITY)
            & (F.col("meta_key") == "source.weight"),
            F.lit("1.5"),
        )
        .otherwise(F.col("meta_value")),
    )
    return rows
