"""Corpus-level training-data operators: deterministic dataset splits
and train/eval contamination detection.

Both are standard steps of a large-scale training-data pipeline (the
reference's kin is its whole-table sweep checks, e.g. the
duplicate/orphan scans in Checks/*; these extend the same plan shapes to
corpus hygiene):

* `hash_split` — assign every row to a named split by a deterministic
  hash of its id: reproducible across runs, partitioning, and engines
  (md5-derived, so a SQL oracle computes identical assignments).  No
  shuffle at all — the split column is a projection.
* `contamination_overlap` — for every eval document, how many of its
  word n-gram shingles occur anywhere in the train corpus
  (decontamination primitive).  Plan: explode both sides to distinct
  (id, shingle) / distinct shingle sets, one shuffle keyed by shingle
  for the membership semi-join, then a per-doc count aggregation —
  never a doc×doc join, so cost is linear in total shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators.dedup import content_hash, word_ngrams


def split_bucket(id_col, buckets: int = 100):
    """Deterministic, engine-portable bucket in [0, buckets): first 8 hex
    chars of md5(id) as an integer, mod buckets.  (xxhash64 would be
    cheaper but is Spark-specific; split assignment must be reproducible
    by any engine auditing the split.)"""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def _md5_order_cumsum_window(partition_key, ident: Column):
    """The deterministic-order running-total window shared by
    source_budget_trim and pack_sequences: partition by
    ``partition_key``, rows ordered by (md5(id), id) — engine-portable,
    reproducible across runs and partitionings — cumulative frame
    INCLUDING the current row.  One definition so the ordering contract
    cannot drift between the two operators (their oracles replay it
    verbatim)."""
    return (
        Window.partitionBy(partition_key)
        .orderBy(F.md5(ident.cast("string")), ident)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    buckets: int = 100,
) -> DataFrame:
    """Attach a `split` column assigning each row to one named split with
    the given fractions (must sum to ≤ 1; remainder rows get NULL).
    Pure projection — zero shuffle, stable under re-partitioning and
    re-runs, and rows never migrate between splits when fractions grow
    (a split boundary only moves forward through the bucket space)."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    if buckets < 1:
        # pmod(h, 0) is NULL under non-ANSI eval — every row would fall
        # to the NULL remainder split with no error
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    for name, frac in fractions.items():
        if frac <= 0:
            # caught here, not at the granularity check below, whose
            # "raise buckets" advice divides by min(fractions) — no
            # bucket count fixes a zero fraction
            raise ValueError(f"split {name!r} has non-positive fraction {frac}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = split_bucket(id_col, buckets)
    hi = 0.0
    bounds = []
    for name, frac in fractions.items():
        lo, hi = hi, hi + frac
        lo_b, hi_b = int(round(lo * buckets)), int(round(hi * buckets))
        if hi_b <= lo_b:
            # a silent empty split is a data-loss trap — refuse instead
            raise ValueError(
                f"split {name!r} ({frac}) is below the bucket granularity "
                f"1/{buckets}; raise `buckets` to at least "
                f"{int(1 / min(fractions.values())) + 1}"
            )
        bounds.append((name, lo_b, hi_b))
    cond = None
    for name, lo_b, hi_b in bounds:
        clause = (b >= lo_b) & (b < hi_b)
        cond = F.when(clause, name) if cond is None else cond.when(clause, name)
    return df.withColumn("split", cond.otherwise(F.lit(None).cast("string")))


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 8,
) -> DataFrame:
    """(id, n_shingles, n_contaminated, contamination) per eval document:
    how many of its distinct word `ngram`-shingles appear anywhere in
    the train corpus.  The decontamination primitive — eval rows with
    high overlap leaked into training data (or vice versa).

    Scale shape: train collapses to its DISTINCT shingle set (map-side
    combinable aggregation — the hot shingle that appears 10^9 times
    becomes one row BEFORE the join), then one semi-join keyed by
    shingle marks eval shingle hits; per-doc counts are a final small
    aggregation.  Linear in total shingles; no doc×doc pairing.

    NULL and whitespace-only documents carry no shingles and are
    excluded on BOTH sides (they produce no output row): word_ngrams'
    short-document fallback would otherwise collapse every empty doc to
    the single shingle '', making one empty train doc mark every empty
    eval doc 100% contaminated (and, via decontaminate's mirrored
    direction, drop every empty train doc for one empty eval doc)."""

    def _nonempty(d: DataFrame) -> DataFrame:
        t = F.col(text_col)
        return d.filter(t.isNotNull() & (F.trim(t) != ""))

    tr = (
        _nonempty(train)
        .select(F.explode(word_ngrams(F.col(text_col), ngram)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ev = _nonempty(eval_df).select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("shingle"),
    ).distinct()
    # ONE pass over the eval shingles: left join against the distinct
    # train set (no fan-out — tr is unique per shingle), then count all
    # vs count(flag non-null) in a single aggregation.  A semi-join +
    # separate totals aggregation would shuffle and shingle the eval
    # side twice.
    marked = ev.join(tr, "shingle", "left")
    return marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
        (F.count("__hit") / F.count(F.lit(1))).alias("contamination"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 8,
    max_contamination: float = 0.0,
) -> DataFrame:
    """Drop train documents whose shingle overlap with the EVAL corpus
    exceeds ``max_contamination`` (the mirrored direction: scrub the
    training set against held-out benchmarks).  Returns the filtered
    train DataFrame; join is a broadcast-friendly semi/anti on ids."""
    overlap = contamination_overlap(eval_df, train, id_col, text_col, ngram)
    bad = overlap.filter(F.col("contamination") > max_contamination).select(
        F.col("id").alias(id_col)
    )
    return train.join(bad, id_col, "left_anti")


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id-hash bucket —
    unlike `DataFrame.sample`, the kept set is identical across runs,
    partitionings, and engines (md5 buckets), and is a SUBSET of any
    larger-fraction sample of the same table (nested samples for
    scaling-law runs).  Pure projection+filter, no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    cut = int(round(fraction * buckets))
    return df.filter(split_bucket(id_col, buckets) < cut)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. language rebalancing in
    a training mix): each stratum keeps its own fraction, decided by the
    same engine-portable id-hash bucket.  Strata absent from
    ``fractions`` keep ``default``.  No shuffle, reproducible, nested
    across fraction increases — the properties `sampleBy` does not
    guarantee."""
    for k, v in {**fractions, "default": default}.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} outside [0, 1]: {v}")
    b = split_bucket(id_col, buckets)
    cut = F.lit(int(round(default * buckets)))
    for name, frac in fractions.items():
        cut = F.when(F.col(strata_col) == name,
                     int(round(frac * buckets))).otherwise(cut)
    return df.filter(b < cut)


def passage_array_expr(arr: str, k: int, join_words: bool) -> str:
    """SQL expression slicing array column ``arr`` into ceil(size/k)
    non-overlapping k-element passages — a PURE PROJECTION (no shuffle,
    no window; passage index comes from the caller's posexplode).
    ``join_words=True`` renders each passage as a space-joined string
    (text dedup); False keeps the raw slices (token dedup).  Shared by
    corpus.passage_dedup and token_dedup.token_passage_dedup so the
    sequence bound and slice arithmetic live in exactly one place."""
    inner = f"slice({arr}, i * {k} + 1, {k})"
    if join_words:
        inner = f"array_join({inner}, ' ')"
    return (
        f"transform(sequence(0, cast(ceil(size({arr}) / {k}.0) AS INT) - 1),"
        f" i -> {inner})"
    )


def first_occurrence(pass_df: DataFrame, digest) -> DataFrame:
    """Skew-proof first-occurrence selection over exploded passages
    (columns must lead with (id, pidx) — the keep order): groupBy(digest)
    · min(struct(<all columns>)) — ONE aggregation with map-side partial
    combine, so a passage duplicated 10^9 times collapses to one row per
    map partition BEFORE the shuffle.  Deliberately NOT a row_number
    window over the digest (a window puts every occurrence of a hot
    passage in one partition — the skew this formulation avoids); the
    SQL-oracle row_number formulation is value-identical because struct
    comparison is lexicographic on (id, pidx).  Plan contract pinned by
    tests/test_plans.py (no Window, partial_min under the exchange)."""
    cols = pass_df.columns
    return (
        pass_df.groupBy(digest.alias("__digest"))
        .agg(F.min(F.struct(*cols)).alias("f"))
        .select(*[F.col(f"f.{c}").alias(c) for c in cols])
    )


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_words: int = 10,
) -> DataFrame:
    """Sub-document exact dedup: remove duplicated fixed-length word
    passages ACROSS the corpus, keeping each passage's first occurrence
    (lowest (id, passage_index)).  This is the chunk-granularity variant
    of exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better") — doc-level dedup
    (dedup.exact_duplicates / minhash) cannot remove a boilerplate
    paragraph pasted into thousands of otherwise-distinct pages; this
    operator does.  Returns one row per non-empty input doc:
    (id, n_passages, n_kept, text_deduped) with text_deduped the kept
    passages rejoined in document order ('' when every passage was a
    duplicate).

    Plan, sized for 10^12 docs:

    * passages are built by a PURE PROJECTION — transform(sequence(...))
      slicing the split word array into ceil(n/k) non-overlapping
      k-word windows — then posexplode: zero shuffle, and pidx comes
      from posexplode, not a window;
    * first-occurrence selection is groupBy(md5(ptext)) ·
      min(struct(id, pidx, ptext)) — ONE aggregation with map-side
      partial combine, so a passage duplicated 10^9 times collapses to
      one row per map partition BEFORE the shuffle.  No row_number
      window over the digest (a window would put all 10^9 occurrences
      of a hot passage in one partition — the skew this formulation
      exists to avoid); the SQL-oracle equivalent row_number()
      formulation is value-identical because struct comparison is
      lexicographic on (id, pidx);
    * reassembly is one groupBy(id) whose collect_list is bounded by
      passages-per-doc (document length), never corpus size.

    Two shuffles total (digest agg, per-doc reassembly) plus the
    id-keyed join back to per-doc passage totals (computed as a
    projection, ceil(size(wa)/k) — no extra scan or count job).
    """
    k = int(passage_words)
    docs, pass_df = exploded_text_passages(df, id_col, text_col, k)
    firsts = first_occurrence(pass_df, F.md5("ptext"))
    return reassemble_text_passages(docs, firsts, k, id_col)


def exploded_text_passages(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """(docs, passages): docs = non-empty rows as (id, wa=split words);
    passages = (id, pidx, ptext) via the zero-shuffle projection slices
    (passage_array_expr) + posexplode.  Shared by passage_dedup,
    incremental.passage_store and incremental.incremental_passage_dedup."""
    if k < 1:
        raise ValueError(f"passage_words must be >= 1, got {k}")
    docs = df.filter(
        F.col(text_col).isNotNull() & (F.col(text_col) != "")
    ).select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("wa")
    )
    pass_df = docs.select(
        "id",
        F.posexplode(
            F.expr(passage_array_expr("wa", k, join_words=True))
        ).alias("pidx", "ptext"),
    )
    return docs, pass_df


def reassemble_text_passages(
    docs: DataFrame, kept_passages: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Rebuild (id_col, n_passages, n_kept, text_deduped) from the
    surviving (id, pidx, ptext) rows: one per-doc aggregate bounded by
    document length (collect_list of a doc's own passages, never corpus
    size) joined back to the per-doc passage totals — which are a pure
    projection (ceil(size(wa)/k)), not a second count job.  Shared by
    passage_dedup and incremental.incremental_passage_dedup."""
    kept = kept_passages.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", "ptext"))),
                lambda s: s["ptext"],
            ),
            " ",
        ).alias("text_deduped"),
    )
    base = docs.select(
        "id",
        F.ceil(F.size("wa") / F.lit(float(k))).cast("long").alias("n_passages"),
    )
    return base.join(kept, "id", "left").select(
        F.col("id").alias(id_col),
        "n_passages",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
    )


def source_budget_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight_col: str,
    budgets: dict[str, float],
    default_budget: float | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Mix a training corpus to per-source weight budgets (chars/tokens)
    by THRESHOLD SAMPLING: each source keeps a deterministic id-hash
    fraction rate = min(1, budget / total_weight), so the expected kept
    weight hits the budget without ordering or ranking any rows.  This
    is the mixture-building step of web-scale pipelines (per-domain /
    per-source token quotas a la Dolma / RedPajama mixing); sources
    absent from ``budgets`` use ``default_budget`` (None = keep all).

    Scale shape, sized for 10^12 rows: ONE map-side-combinable
    aggregation produces the per-source totals (#sources rows — tiny),
    rates join back as a BROADCAST, and the keep decision is a pure
    projection+filter on the md5 bucket (split_bucket — engine-portable,
    reproducible, and nested: raising a budget only ever ADDS rows).
    No wide shuffle of the fact table, no per-source sort, no skew
    exposure — a 10^11-row mega-source costs the same one partial-agg
    pass as a tiny one.  For exact (not expected-value) budgets see
    source_budget_trim — the audit-scale path.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    for name, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {name!r} is negative: {b}")
    totals = df.groupBy(source_col).agg(F.sum(weight_col).alias("__total"))
    budget = F.lit(None).cast("double") if default_budget is None else F.lit(
        float(default_budget)
    )
    for name, b in budgets.items():
        budget = F.when(F.col(source_col) == name, float(b)).otherwise(budget)
    # NULL budget (no quota) keeps everything: cut = buckets.  So does a
    # NULL or non-positive total: a source whose weights are all NULL
    # has no computable rate, and budget/NULL would otherwise make cut
    # NULL — silently dropping the whole source.
    cut = F.when(
        budget.isNull() | F.col("__total").isNull() | (F.col("__total") <= 0),
        F.lit(buckets),
    ).otherwise(
        F.floor(F.least(F.lit(1.0), budget / F.col("__total")) * buckets)
    )
    rates = totals.select(
        F.col(source_col).alias("__mix_src"), cut.cast("long").alias("__cut")
    )
    # null-SAFE equi-join: rows with a NULL source must meet their own
    # NULL-key totals row (plain equality never matches NULL = NULL and
    # would silently drop them); they take default_budget like any
    # source not named in `budgets`
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__mix_src")),
        )
        .filter(split_bucket(id_col, buckets) < F.col("__cut"))
        .drop("__mix_src", "__cut")
    )


def temperature_source_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    tau: float = 0.5,
    weight_col: str | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-flattened source down-sampling — the multilingual-LM
    mixing rule (temperature/alpha sampling of mC4 / XLM-R, Xue et al.
    2021 arXiv:2010.11934, Conneau et al. 2020 arXiv:1911.02116 —
    public): expected kept mass per source ∝ total_s^τ, anchored so the
    SMALLEST source is kept whole and larger ones are thinned by
    ``rate_s = (min_total / total_s)^(1-τ)`` — τ=1 keeps everything
    (natural mix), τ→0 flattens toward uniform across sources.

    Mass is row count (``weight_col=None``) or an integer weight column
    (chars/tokens) summed EXACTLY per source.  The keep decision is the
    same deterministic md5-bucket threshold as ``source_budget_mix``
    (nested: raising τ only adds rows for every source, since rate is
    monotone in τ), NULL sources meet their own totals row via the
    null-safe join, and a source with NULL/non-positive total keeps all
    rows rather than silently vanishing.

    Engine-portability note (why the default is τ=0.5): rate =
    sqrt(min_total / total) is ONE correctly-rounded IEEE division and
    ONE correctly-rounded sqrt of exact BIGINTs — bit-identical in any
    engine, with NO cross-source float sum (the usual Σ p_t^τ
    normalizer is summation-order-dependent; anchoring at the min
    avoids it).  Other τ go through pow(), which engines round
    differently in the last ulp — fine for production, not for a
    hash-exact oracle.

    Scale shape: one map-side-combinable per-source aggregate (#sources
    rows), a 1-row min broadcast-crossed back, rates joined as a
    BROADCAST, keep decision a pure projection+filter — no wide
    shuffle, no sort, skew-free (the source_budget_mix plan).
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not (0.0 <= tau <= 1.0):
        raise ValueError(f"tau must be in [0, 1], got {tau}")
    mass = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    totals = df.groupBy(source_col).agg(mass.cast("long").alias("__total"))
    mn = totals.filter(F.col("__total") > 0).agg(
        F.min("__total").alias("__wmin")
    )
    ratio = F.col("__wmin").cast("double") / F.col("__total").cast("double")
    if tau == 0.5:
        rate = F.sqrt(ratio)
    elif tau == 1.0:
        rate = F.lit(1.0)
    else:
        rate = F.pow(ratio, 1.0 - tau)
    cut = F.when(
        F.col("__total").isNull()
        | (F.col("__total") <= 0)
        | F.col("__wmin").isNull(),
        F.lit(buckets),
    ).otherwise(F.floor(rate * buckets))
    rates = totals.crossJoin(F.broadcast(mn)).select(
        F.col(source_col).alias("__ts_src"), cut.cast("long").alias("__cut")
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__ts_src")),
        )
        .filter(split_bucket(id_col, buckets) < F.col("__cut"))
        .drop("__ts_src", "__cut")
    )


def source_budget_trim(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight_col: str,
    budget: float,
) -> DataFrame:
    """EXACT per-source budget trim: keep each source's documents in
    deterministic md5(id) order while the running weight total (cumsum
    INCLUDING the current row) stays <= ``budget`` — the kept set never
    exceeds the budget, unlike the expected-value guarantee of
    source_budget_mix.  The hash order makes the kept set a uniform
    sample that is reproducible across engines and runs, and nested:
    a larger budget keeps a strict superset.

    Scale note: the cumulative sum is a per-source window sort — the
    right tool at audit scale or with bounded per-source cardinality,
    but at 10^12 rows a mega-source serializes into one task's sort.
    At that scale use source_budget_mix (shuffle-free threshold
    sampling) or pre-bucket by source and trim per bucket.  Reference
    kin: the quota/threshold semantics of row_subtotals with a
    max-total constraint (Test/DataCheck.pm row_subtotals direction).
    """
    if budget < 0:
        raise ValueError(f"budget is negative: {budget}")
    w = _md5_order_cumsum_window(source_col, F.col(id_col))
    # NULL weight -> 0 (the reference's missing->0 subtotal convention,
    # Test/DataCheck.pm row_subtotals): without the coalesce a
    # NULL-weight row was kept or dropped depending on its md5 ORDER
    # position (first-in-source -> all-NULL frame -> NULL cum -> filtered;
    # later -> kept for free) — hash-order-dependent semantics.  As 0 it
    # is deterministically kept while the running total of the REAL
    # weights stays within budget.
    cum = F.sum(F.coalesce(F.col(weight_col), F.lit(0))).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    text_col: str | None = None,
    pairs: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    buckets: int = 100,
) -> DataFrame:
    """hash_split that can never leak duplicates across splits: every
    member of a duplicate cluster is assigned the split of its cluster
    REPRESENTATIVE (lowest id), so a document and its (near-)copies
    always land in the same split — the eval set stays honest even when
    the corpus carries boilerplate replicated across shards.  Plain
    per-doc hash splitting puts two byte-identical docs in train and
    test with probability 2·p·(1-p); this closes that leak by
    construction.

    Exactly one cluster source must be given:

    * ``text_col`` — exact-content clusters: the representative is
      min(id) over each md5(text) group, computed as an UNORDERED window
      aggregate (a streaming per-key min: a hot digest concentrates its
      copies in one task but pays O(1) per row — no row_number sort
      rank, no join back, one shuffle total);
    * ``pairs`` — arbitrary candidate pairs (MinHash/SimHash/semantic
      output): representatives come from connected_components
      (pointer-doubled min-label propagation, O(log diameter) rounds);
      docs in no pair are their own representative via one left join.

    The split decision reuses hash_split's md5-bucket boundaries on the
    representative id, so it inherits determinism, engine portability,
    and grow-only boundary migration.
    """
    if (text_col is None) == (pairs is None):
        raise ValueError("give exactly one of text_col or pairs")
    if text_col is not None:
        # NULL text is NOT duplicate content: md5(NULL) is NULL and
        # Window.partitionBy groups all NULL keys together, which would
        # fuse every NULL-text doc into one mega-cluster — a single
        # split for all of them (broken fractions) and a single hot
        # window task.  Key NULL-text rows by their own id instead
        # (distinct 'n:' / 't:' prefixes so an id string can never
        # collide with a content hash); empty-STRING docs stay clustered
        # — they really are byte-identical content.
        key = F.coalesce(
            F.concat(F.lit("t:"), content_hash(F.col(text_col))),
            F.concat(F.lit("n:"), F.col(id_col).cast("string")),
        )
        rep = F.min(id_col).over(Window.partitionBy(key))
        labeled = df.withColumn("__rep", rep)
    else:
        from ensembl_datacheck_spark.operators.clusters import (
            connected_components,
        )

        labels = connected_components(pairs, id_a, id_b).select(
            F.col("node").alias(id_col), F.col("component").alias("__comp")
        )
        labeled = df.join(labels, id_col, "left").withColumn(
            "__rep", F.coalesce("__comp", F.col(id_col))
        ).drop("__comp")
    return hash_split(labeled, "__rep", fractions, buckets).drop("__rep")


def upsample_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Repeat each source's rows a FRACTIONAL number of epochs — the
    upsampling half of training-mix construction ("2.5 epochs of
    wikipedia, 0.5 of commoncrawl").  Every row gains an ``epoch``
    column (0-based copy index): floor(e) full copies for everyone,
    plus one extra copy for the deterministic id-hash fraction frac(e)
    of rows — so expected row count is exactly e x input, the kept set
    is reproducible across runs/engines/partitionings, and raising an
    epoch count only ADDS copies (nested, like the samplers above).

    Scale shape: a PURE PROJECTION + row generator — the copy count is
    a literal when-chain on the source column plus one md5-bucket
    comparison, and the copies come from explode(sequence(0, n-1)).
    Zero shuffle, zero aggregation, no skew exposure; 10^12 rows cost
    one map pass regardless of the epoch mix.  Downstream global
    shuffling of the repeated stream is the training loader's job (or
    one repartition on a hash of (id, epoch)).
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    for name, e in {**epochs, "default": default_epochs}.items():
        if e < 0:
            raise ValueError(f"epochs for {name!r} is negative: {e}")

    def _parts(e: float) -> tuple[int, int]:
        whole = int(e)
        return whole, int(round((e - whole) * buckets))

    n_whole, n_cut = map(F.lit, _parts(default_epochs))
    for name, e in epochs.items():
        whole, cut = _parts(e)
        here = F.col(source_col) == name
        n_whole = F.when(here, whole).otherwise(n_whole)
        n_cut = F.when(here, cut).otherwise(n_cut)
    n_copies = n_whole + (split_bucket(id_col, buckets) < n_cut).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    seq_len: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Concat-packing placement metadata for LM pretraining: documents
    are concatenated in a deterministic order and sliced into
    fixed-``seq_len`` training sequences; this emits, per document,
    WHERE its tokens land — ``bucket`` (independent packing stream),
    ``bin`` (0-based training-sequence index within the bucket at which
    the document STARTS), and ``offset`` (token position within that
    bin).  A document with weight w starting at offset o occupies
    [o, o+w) of the bucket's concatenated stream, spilling into
    subsequent bins exactly as a training loader slicing the stream
    into seq_len windows would place it — so the loader needs no
    further coordination, just this table.

    Scale shape: documents first hash into ``n_buckets`` independent
    md5-bucket streams (a pure projection), then ONE per-bucket window
    cumulative sum in md5(id) order yields start positions; bin and
    offset are start // seq_len and start % seq_len — projections.
    One shuffle total, and the window sort is bounded by corpus/
    n_buckets per task: n_buckets is the scale knob (raise it with the
    corpus; buckets are md5-uniform so there is no skew).  Determinism:
    the same corpus packs identically across runs, partitionings, and
    engines, and each bucket's stream is gapless — sum(weights) ==
    final cum — which the tests assert.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bkt = split_bucket(id_col, n_buckets)
    w = _md5_order_cumsum_window(bkt, F.col(id_col))
    # NULL weight -> 0 (missing->0, as in source_budget_trim): the raw
    # column gave a NULL-weight document NULL bin/offset — an
    # unplaceable row a training loader would trip over — while its
    # neighbors already treated it as zero-width.  Coalesced, it gets a
    # real zero-width placement at the current offset.  Negative
    # weights are data corruption this operator cannot detect cheaply;
    # run the completeness/invariant checks first.
    wexpr = F.coalesce(F.col(weight_col), F.lit(0))
    start = (F.sum(wexpr).over(w) - wexpr).alias("__start")
    return (
        df.select("*", bkt.alias("bucket"), start)
        .withColumn("bin", F.floor(F.col("__start") / seq_len))
        .withColumn("offset", F.pmod(F.col("__start"), F.lit(seq_len)))
        .drop("__start")
    )


def chunk_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    chunk_len: int,
    stride: int | None = None,
) -> DataFrame:
    """Context-window chunking for LM training: split each document's
    token array into windows of ``chunk_len`` tokens starting every
    ``stride`` tokens (stride < chunk_len gives overlapping windows,
    the standard long-document treatment) — the complement of
    ``pack_sequences``, which concatenates SHORT documents up to the
    context length while this slices LONG ones down to it.

    Contract: a document with n tokens emits

    * 1 chunk if ``n <= chunk_len`` (the whole document, possibly
      short), else
    * ``ceil((n - chunk_len) / stride) + 1`` chunks starting at
      ``0, stride, 2*stride, ...`` — the minimal window set whose last
      window reaches the end of the document, so every token is in at
      least one chunk and no window is fully redundant.  The final
      chunk may be shorter than ``chunk_len``.

    One output row per chunk: the input row's columns (minus the token
    array) plus ``chunk_idx`` (0-based), ``chunk_tokens``, and
    ``n_chunk_tok``.  Rows with NULL or empty token arrays emit
    nothing (the completeness checks own those).  NULL elements inside
    an array pass through untouched (the domain check owns those).

    Scale shape: pure per-row projection + generate — ZERO shuffles,
    no UDF (``sequence`` + ``posexplode`` + ``slice`` are all
    codegen'd JVM expressions), so the plan is a single
    WholeStageCodegen span over the scan and throughput is bounded by
    parquet decode (plan-pinned in tests).  Output size is
    corpus_tokens/stride-proportional; partition count follows the
    input, so downstream writers inherit the input's parallelism with
    no re-shuffle.
    """
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be >= 1, got {chunk_len}")
    stride = chunk_len if stride is None else stride
    if not 1 <= stride <= chunk_len:
        raise ValueError(
            f"stride must be in [1, chunk_len={chunk_len}], got {stride}"
        )
    n = F.size(tokens_col)
    n_chunks = F.when(n <= chunk_len, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_len)) / F.lit(stride)).cast("int") + 1
    )
    passthrough = [c for c in df.columns if c != tokens_col]
    return (
        df.filter(F.col(tokens_col).isNotNull() & (n > 0))
        .select(
            *passthrough,
            F.col(tokens_col).alias("__toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_idx", "__i"
            ),
        )
        .select(
            *passthrough,
            "chunk_idx",
            F.slice(
                "__toks", F.col("chunk_idx") * stride + 1, chunk_len
            ).alias("chunk_tokens"),
        )
        .withColumn("n_chunk_tok", F.size("chunk_tokens"))
    )
