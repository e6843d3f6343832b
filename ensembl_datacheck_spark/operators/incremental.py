"""Incremental dedup: validate/deduplicate a NEW ingest batch against a
persisted store built from the corpus already accepted — without ever
rescanning the corpus.

At 10^12-row scale the corpus is never re-deduplicated wholesale; each
ingest batch (hours of crawl, one source drop) is checked against compact
store tables maintained alongside the corpus:

* an **exact store** of distinct content digests (one 32-char md5 per
  distinct content — ~10^4× smaller than the corpus text), and
* an **LSH band store** of (id, band-key) rows from the MinHash pass that
  admitted each document (n_bands small integers per doc).

The reference has the same shape in miniature: per-database checks rerun
only against changed databases, gated by update-time lineage
(DbCheck.pm:767-804 history file); here the "already validated" state is
a first-class table instead of a timestamp.

Scale shape of every join in this module: keyed by a uniform digest or
band key (never text), map-side combinable aggregations before any
shuffle, store side usable as a bucketed table (sources/io.write_bucketed)
so repeated daily ingests co-locate without reshuffling the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators.dedup import (
    content_hash,
    lsh_band_keys,
    minhash_signatures,
)


def exact_store(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct content digests of an accepted corpus: one `content_hash`
    column.  Map-side partial dedup before the single shuffle; the result
    is the compact table a pipeline persists (and appends to) between
    ingests."""
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash")).distinct()
    )


def flag_incremental_duplicates(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Annotate a new batch against an exact store: adds

    * ``dup_of_store`` — content already present in the accepted corpus;
    * ``dup_in_batch`` — an earlier row (lower id) in THIS batch has the
      same content (first occurrence stays False, so keeping
      ``~dup_of_store & ~dup_in_batch`` admits exactly one copy).

    Plan: digest projection on the batch; within-batch first-occurrence
    via one window over the digest (no join back); store membership via a
    left join on the digest — store rows are unique per digest, so the
    join cannot fan out.  Both shuffles are keyed by the uniform digest;
    with a digest-bucketed store table the store side ships zero bytes.
    """
    hashed = new_df.withColumn("__ch", content_hash(F.col(text_col)))
    w = Window.partitionBy("__ch").orderBy(F.col(id_col))
    # NULL-text rows are never duplicates of anything (SQL semantics:
    # NULL = NULL is not a match — the oracle's EXISTS/equi-join never
    # matches them; without the guard the window would group all NULL
    # digests together and flag every one after the first)
    marked = hashed.withColumn(
        "dup_in_batch",
        F.when(F.col("__ch").isNull(), F.lit(False)).otherwise(
            F.row_number().over(w) > 1
        ),
    )
    st = (
        store.select(F.col("content_hash").alias("__ch"))
        .distinct()
        .withColumn("__in_store", F.lit(True))
    )
    return (
        marked.join(st, "__ch", "left")
        .withColumn("dup_of_store", F.coalesce(F.col("__in_store"), F.lit(False)))
        .drop("__ch", "__in_store")
    )


def incremental_dedup_exact(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """The admit filter: rows of the new batch that survive exact dedup
    against both the store and the batch itself (lowest id wins within
    the batch).  The caller appends these rows to the corpus and their
    digests to the store (`exact_store(admitted)` unioned in)."""
    flagged = flag_incremental_duplicates(new_df, store, text_col, id_col)
    return flagged.filter(
        ~F.col("dup_of_store") & ~F.col("dup_in_batch")
    ).drop("dup_of_store", "dup_in_batch")


# ---------------------------------------------------------------------------
# near-dup tier: LSH band store
# ---------------------------------------------------------------------------


#: One cap discipline for every band-bucket bound in this module: the
#: build-time store cap, the maintenance probe's threshold, and the
#: opt-in legacy probe cap must agree or an "in-bound" store can still
#: blow up a probe join.
DEFAULT_CAP_PER_BUCKET = 20


def _cap_per_key(df: DataFrame, key: str, order_col: str, cap: int) -> DataFrame:
    """At most ``cap`` rows per ``key``, lowest ``order_col`` first —
    the shared cap discipline (one spillable sort-window)."""
    w = Window.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def band_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    cap_per_bucket: int | None = DEFAULT_CAP_PER_BUCKET,
) -> DataFrame:
    """(id, bk) LSH band membership of an accepted corpus — the near-dup
    analogue of `exact_store`.  n_bands rows per doc, each a small
    struct; persisted bucketed by `bk` so every future ingest probes it
    with a co-located join.

    The store is **capped at build time**: at most ``cap_per_bucket``
    representatives (lowest ids) per band key.  The cap is paid ONCE
    here — one spillable sort-window in the build — so the per-ingest
    probe (`incremental_lsh_candidates`) is a plain equi-join that never
    re-sorts the persisted store; at 10^12 stored docs a per-ingest
    window over the store would be a full store shuffle per daily drop.
    Representatives suffice to ROUTE a colliding new doc into the
    existing duplicate cluster — lossless when an overfull bucket is one
    duplicate cluster (the common degenerate case); for a MIXED overfull
    bucket it is a deliberate recall tradeoff (a new doc's true near-dup
    may rank past the cap and its retained representatives may all fail
    downstream similarity verification) — the remedy is more selective
    banding or a larger cap, same caveat as
    dedup.bucket_candidate_pairs.

    Append hygiene: each incremental append is capped per-batch, so a
    bucket's accumulated representative set can exceed the cap across
    many appends (union of per-batch caps, bounded by batches × cap,
    NOT by corpus size).  Periodic compaction — re-aggregating the store
    with the same cap — restores the per-bucket bound; it is a
    maintenance job over the compact store table, never over the corpus.
    ``cap_per_bucket=None`` keeps every member (bounded corpora only).
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, text_col, ngram, n_hashes)
    bands = sig.select(
        "id", F.explode(lsh_band_keys("sig", n_bands, rows_per_band)).alias("bk")
    )
    if cap_per_bucket is not None:
        bands = _cap_per_key(bands, "bk", "id", cap_per_bucket)
    return bands


def overfull_store_buckets(
    store_bands: DataFrame, cap_per_bucket: int = DEFAULT_CAP_PER_BUCKET
) -> DataFrame:
    """Maintenance probe for the `band_store` pre-capped contract: the
    band keys whose representative count exceeds ``cap_per_bucket``, as
    (bk, n_members).  Nothing in `incremental_lsh_candidates` enforces
    the cap at probe time (a per-ingest window over the store is exactly
    the full-store shuffle this module avoids) — so a store built with
    ``cap_per_bucket=None``, by pre-cap code, or grown past the bound via
    many appends reintroduces the join blow-up silently.  Run this as the
    compaction trigger: non-empty result → re-aggregate the store with
    `band_store`'s cap (one maintenance job over the COMPACT store table,
    never over the corpus)."""
    return (
        store_bands.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > cap_per_bucket)
    )


def incremental_lsh_candidates(
    new_df: DataFrame,
    store_bands: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    store_probe_cap: int | None = None,
) -> DataFrame:
    """Near-dup candidates of a new batch: (new_id, match_id, match_src)
    where match_src is 'store' (collides with an accepted doc's band) or
    'batch' (collides with an earlier doc of the same batch).

    Scale shape — the part that matters at 10^12 stored docs:

    * the batch is banded once (same signature plan as the full pass)
      and — being a batch, not the corpus — is banded UNCAPPED: every
      new doc probes the store on every band it lands in.  Capping the
      batch side would silently drop store probing for any new doc
      ranked past the cap in an overfull batch bucket (its true store
      near-dup would never surface); the cap exists to bound the
      PERSISTED store, and the batch is small by contract so the
      uncapped window costs one batch-sized sort;
    * store probing is ONE equi-join on `bk`.  The store arrives
      **pre-capped** (the `band_store` contract caps representatives per
      band key at build time), so the probe performs NO window, sort, or
      re-aggregation over the persisted store — the earlier design that
      ranked the store per ingest was a full store shuffle/sort per
      daily drop, exactly the cost this module exists to avoid.  A
      representative is enough to route the new doc into the existing
      duplicate cluster (see `band_store` for the mixed-overfull-bucket
      recall caveat).  The contract is NOT verified per probe: for a
      legacy/uncompacted store pass ``store_probe_cap`` (opt-in window on
      the store side, paying the full-store sort once) or run
      `overfull_store_buckets` as the compaction trigger;
    * within-batch pairs go through the same capped hub-spoke generator
      as the full-corpus pass (bucket_candidate_pairs), emitted with the
      smaller id as the match.

    With `store_bands` read from a table bucketed by bk
    (sources/io.write_bucketed), the probe join shuffles only the
    (tiny) batch side — the store contributes zero Exchange to the plan
    (pinned by tests/test_incremental.py plan assertion).
    """
    from ensembl_datacheck_spark.operators.dedup import bucket_candidate_pairs

    new_bands = band_store(
        new_df, id_col, text_col, ngram, n_hashes, n_bands, cap_per_bucket=None
    )

    probe_side = store_bands.select(F.col("id").alias("match_id"), "bk")
    if store_probe_cap is not None:
        probe_side = _cap_per_key(probe_side, "bk", "match_id", store_probe_cap)

    vs_store = (
        new_bands.join(probe_side, "bk")
        .select(
            F.col("id").alias("new_id"),
            "match_id",
            F.lit("store").alias("match_src"),
        )
        .distinct()
    )

    within = bucket_candidate_pairs(new_bands).select(
        F.col("id_b").alias("new_id"),
        F.col("id_a").alias("match_id"),
        F.lit("batch").alias("match_src"),
    )
    return vs_store.unionByName(within)


# ---------------------------------------------------------------------------
# sub-document tier: passage-digest store
# ---------------------------------------------------------------------------


def passage_store(df: DataFrame, text_col: str = "text",
                  passage_words: int = 10) -> DataFrame:
    """Distinct passage digests of an accepted corpus (one 32-char md5
    per DISTINCT k-word passage) — the sub-document analogue of
    `exact_store`.  The passage projection is zero-shuffle
    (corpus.passage_array_expr); distinct() partial-dedups map-side
    before its single shuffle.  Persist bucketed by passage_hash
    (sources/io.write_bucketed) so daily ingests probe it co-located."""
    from ensembl_datacheck_spark.operators.corpus import exploded_text_passages

    # exploded_text_passages needs an id column; ids are dropped from a
    # store build, so text_col doubles as the stand-in id
    _, pass_df = exploded_text_passages(df, text_col, text_col, passage_words)
    return pass_df.select(F.md5("ptext").alias("passage_hash")).distinct()


def incremental_passage_dedup(
    new_df: DataFrame,
    store: DataFrame,
    id_col: str,
    text_col: str,
    passage_words: int = 10,
) -> DataFrame:
    """Passage-level dedup of a NEW ingest batch against the accepted
    corpus's `passage_store`, without rescanning the corpus: a passage
    of the batch survives iff it is the batch's own first occurrence
    (lowest (id, pidx) — corpus.first_occurrence, the skew-proof
    min(struct) aggregation) AND its digest is absent from the store.
    Returns (id_col, n_passages, n_kept, text_deduped) per non-empty
    batch doc, same shape as corpus.passage_dedup.

    Scale shape: the batch side is batch-sized everywhere; the store is
    touched by ONE digest-keyed left-anti join (store rows are unique
    per digest, so no fan-out; a digest-bucketed store table ships zero
    bytes).  The caller appends `passage_store(admitted_text)` digests
    to the store after admission — append-only maintenance, the store
    is never rebuilt from the corpus.
    """
    from ensembl_datacheck_spark.operators.corpus import (
        exploded_text_passages,
        first_occurrence,
        reassemble_text_passages,
    )

    k = int(passage_words)
    docs, pass_df = exploded_text_passages(new_df, id_col, text_col, k)
    firsts = first_occurrence(pass_df, F.md5("ptext"))
    novel = firsts.withColumn("__d", F.md5("ptext")).join(
        store.select(F.col("passage_hash").alias("__d")).distinct(),
        "__d",
        "left_anti",
    ).drop("__d")
    return reassemble_text_passages(docs, novel, k, id_col)
