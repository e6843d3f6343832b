"""Deduplication operators for large-scale training-data pipelines.

Five tiers, all expressed as DataFrame plans that scale by shuffle-on-key
(no driver-side pairwise loops):

* exact            — content-hash groupBy (uniform shuffle on the digest)
* minhash + LSH    — shingle → minhash signature → banded bucket join;
                     candidate pairs verified with exact Jaccard
* simhash          — 64-bit sign-of-weighted-bit-sums, vectorized in an
                     Arrow pandas UDF; near-dups = identical band keys
* n-gram Jaccard   — exact set similarity via explode + shingle self-join
                     (integer intersect/union arithmetic — exact)
* embedding cosine — see operators/similarity.py (near-dup = cos > τ)

Everything except simhash is pure `pyspark.sql.functions` (JVM,
whole-stage codegen).  MinHash signatures: the production tier hashes
each shingle once to a full 64-bit xxhash64 and derives every
permutation as an independent seeded re-hash of that long
(_min_sig_agg64 — see its docstring for why a 31-bit affine family
fails at 10^6+ docs); the md5-portable oracle tier keeps the affine
family over md5-derived coefficients (small corpora by design).  All
deterministic across runs and executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# bounded signature cache (one live cached signature table per operator)
# ---------------------------------------------------------------------------

#: LSH operators cache their small (id, signature) table because it is
#: reused by the banding pass plus two join-backs.  A long-lived session
#: calling an operator repeatedly must not accumulate pinned storage, so
#: each operator keeps AT MOST ONE live cached table: the previous one is
#: unpersisted (non-blocking; in-flight jobs just recompute) when a new
#: call replaces it.
_SIG_CACHE: dict[str, DataFrame] = {}


def _cache_signatures(key: str, df: DataFrame) -> DataFrame:
    old = _SIG_CACHE.get(key)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass
    df = df.cache()
    _SIG_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_hash(col: Column) -> Column:
    """Stable content digest (md5 hex) — uniform shuffle key."""
    return F.md5(col.cast("string"))


def exact_duplicate_groups(
    df: DataFrame, text_col: str, id_col: str, max_members: int = 20
) -> DataFrame:
    """(content_hash, n_copies, doc_ids[:max_members]) for every
    duplicated text.

    The id list is rank-capped BEFORE the aggregation: a window
    ``row_number() <= max_members`` over the digest selects the lowest
    ids, and ``collect_list`` only ever buffers those — the degenerate
    corpus case (10^6 copies of one boilerplate doc) costs the spillable
    sort-based window, never a 10^6-element in-memory aggregation
    buffer.  (`slice` after `collect_list` bounds only the OUTPUT, not
    the buffer.)  The window's partition key is the digest, so the
    following groupBy reuses the same hash partitioning — one shuffle
    total.  Output is identical to the uncapped-buffer formulation.
    Reference kin: diagnostics capped at MAX_DIAG_ROWS=10
    (Test/DataCheck.pm:47) for the same transfer-bound reason."""
    # NULL text is NOT duplicate content (NULL = NULL is not a match —
    # the same contract incremental.py encodes); a NULL digest group
    # would otherwise report every NULL-text row as one duplicate family
    keyed = df.select(
        content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col)
    ).filter(F.col("content_hash").isNotNull())
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__rn") <= max_members, F.col(id_col))
                )
            ).alias("doc_ids"),
        )
        .filter(F.col("n_copies") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (lowest id) per distinct content.  Window
    row_number over the digest — one shuffle, no join back.

    NULL text is never duplicate content (incremental.py's contract:
    NULL = NULL is not a match), so NULL-text rows are all kept — keyed
    by their own id with distinct 't:'/'n:' prefixes so an id string can
    never collide with a real digest; Window.partitionBy would otherwise
    fuse every NULL digest into one partition and silently delete
    all-but-one NULL-text row."""
    digest = F.coalesce(
        F.concat(F.lit("t:"), content_hash(F.col(text_col))),
        F.concat(F.lit("n:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(digest).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ---------------------------------------------------------------------------


def words(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def word_ngrams_multiset(col: Column, n: int) -> Column:
    """ALL word n-grams in document order (occurrences preserved), built
    JVM-side: transform over an index sequence + slice + concat_ws.
    Consumers that need set semantics (MinHash/Jaccard shingles) use
    `word_ngrams`; occurrence counters (repetition signals) use this."""
    ws = words(col)
    # NULL text carries NO shingles (the row drops at the explode): the
    # otherwise-branch would map it to [""] — the same single shingle as
    # an empty-string doc — making every NULL-text doc a jaccard-1.0
    # "duplicate" of every empty one.  Empty-string docs keep their [""]
    # shingle: they really are byte-identical content.
    return F.when(ws.isNull(), F.array().cast("array<string>")).when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", ws)))


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-gram shingles (set semantics, the dedup-tier
    contract)."""
    return F.array_distinct(word_ngrams_multiset(col, n))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# Affine permutation family (a_j*h + b_j) mod p over 31-bit base hashes:
# ONE definition shared by the xxhash64 tier, the md5-portable tier, and
# the DuckDB oracle SQL generator — desynchronized copies of these
# coefficients would silently decouple an operator from its oracle.
MH_PRIME = (1 << 31) - 1  # base folded to 31 bits keeps a_j*h inside int64


def mh_coeff(j: int) -> tuple[int, int]:
    """Hash-derived affine coefficients.  NOT a linear progression: with
    a_{j+1} = a_j + c the permutations are pairwise correlated, and at
    10^6+ docs the minima of correlated permutations collide together —
    measured ~3e3 spurious band collisions over 2M docs (vs ~0 expected
    under independence) before this was derived per-j from md5."""
    import hashlib

    d = hashlib.md5(f"mh-coeff-{j}".encode()).digest()
    a = int.from_bytes(d[:8], "little") % (MH_PRIME - 1) + 1
    b = int.from_bytes(d[8:], "little") % MH_PRIME
    return (a, b)


MH_COEFFS = [mh_coeff(j) for j in range(8)]


def _min_sig_agg(sh: DataFrame, n_hashes: int) -> DataFrame:
    """(id, sig array<long>) from exploded (id, h) shingle hashes: one
    groupBy(id) with n_hashes plain `min` aggregates — all codegen,
    map-side partial aggregation, shuffle carries signature rows.
    String expressions (one SQL parse each) rather than nested Column
    builders: 64 builder trees cost hundreds of py4j round trips of
    driver latency per plan build."""
    aggs = []
    for j in range(n_hashes):
        a, b = mh_coeff(j)
        aggs.append(F.expr(f"min(pmod(h * {a} + {b}, {MH_PRIME})) AS mh{j}"))
    grouped = sh.groupBy("id").agg(*aggs)
    sig = "array(" + ", ".join(f"mh{j}" for j in range(n_hashes)) + ")"
    return grouped.selectExpr("id", f"{sig} AS sig")


def _min_sig_agg64(sh: DataFrame, n_hashes: int) -> DataFrame:
    """(id, sig array<long>) from exploded (id, g) shingles: one
    groupBy(id) with n_hashes `min(xxhash64(j, g))` aggregates — each
    signature entry is an INDEPENDENT seeded 64-bit hash, not an affine
    permutation of one folded 31-bit hash.  The 31-bit affine family
    (kept in `_min_sig_agg` for the md5-portable oracle tier) has a
    measurable large-corpus failure mode: when two unrelated docs share
    one folded base hash (birthday at ~10^6 docs × ~60 shingles), that
    shared value is the band minimum on BOTH docs with probability
    ~(1/113)² per band — ~4k spurious candidate pairs at 2M docs,
    reproduced in the token-dedup smoke.  Full-64-bit independent
    hashes push that probability below 1e-17.  All codegen, map-side
    partial aggregation."""
    aggs = [
        F.expr(f"min(xxhash64({j}, h64)) AS mh{j}") for j in range(n_hashes)
    ]
    # hash the shingle ONCE to a full 64-bit long, then derive each
    # permutation by re-hashing the 8-byte long with a seed column —
    # n_hashes fixed-width hashes instead of n_hashes variable-width
    # shingle hashes (2-4x cheaper on word n-grams / token windows)
    grouped = sh.select("id", F.xxhash64("g").alias("h64")).groupBy("id").agg(*aggs)
    sig = "array(" + ", ".join(f"mh{j}" for j in range(n_hashes)) + ")"
    return grouped.selectExpr("id", f"{sig} AS sig")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    n_hashes: int = 64,
) -> DataFrame:
    """(id, sig array<long>) via the aggregation plan: explode shingles →
    groupBy(id) with n_hashes seeded-xxhash64 `min` aggregates
    (_min_sig_agg64).  Everything stays inside whole-stage codegen (no
    LambdaVariables in the per-shingle hot path — nested HOF trees are
    not subexpression-eliminated and evaluate interpreted), and the
    shuffle carries map-side partially-aggregated signature rows, not
    shingles."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("g"),
    )
    return _min_sig_agg64(sh, n_hashes)


def lsh_band_keys(signature: str, n_bands: int, rows_per_band: int) -> Column:
    """Band the signature: key_i = (i, hash(sig[i*r : (i+1)*r])).  Docs
    sharing any band key are candidate pairs (standard MinHash-LSH
    banding; threshold ≈ (1/b)^(1/r)).  Built as ONE parsed SQL
    expression — n_bands nested builder trees would cost a py4j round
    trip per node at plan-build time.  Takes the signature column NAME
    (all callers pass one; a Column-object builder fallback was dead
    code kept behaviorally in sync by hand, so it was removed)."""
    if not isinstance(signature, str):
        raise TypeError(
            f"signature must be a column name (str), got {type(signature).__name__}"
        )
    sig = signature
    entries = ", ".join(
        f"named_struct('band', {b}, 'bucket', "
        f"xxhash64(concat_ws(',', transform(slice({sig}, {b * rows_per_band + 1}, "
        f"{rows_per_band}), x -> cast(x AS string)))))"
        for b in range(n_bands)
    )
    return F.expr(f"array({entries})")


def bucket_candidate_pairs(banded: DataFrame, cap: int = 100) -> DataFrame:
    """(id_a, id_b) candidate pairs from (bk, id) bucket membership.

    All-pairs among the first ``cap`` members per bucket (by id), PLUS a
    hub-spoke pair (bucket-min id → member) for EVERY member — so a
    degenerate bucket of 10k identical docs yields linear output and
    connected components still recover the full cluster through the hub,
    instead of silently dropping members 101+ (which would leave them
    un-deduplicated with no trace).  The member ranking is a window, not
    collect_list-then-slice: a huge bucket never materializes as one
    in-memory array.

    Recall tradeoff (deliberate): in an overfull MIXED bucket (> cap
    members that are NOT one duplicate cluster — e.g. too few LSH
    planes/bands for the corpus size), two similar members both ranked
    past ``cap`` are only reachable through hub pairs, and a downstream
    similarity threshold can reject both hub pairs while the direct pair
    would have passed.  That loss is the price of linear output; the
    uncapped alternative is quadratic in the hottest bucket, which at
    corpus scale is the job-killer.  If overfull buckets are frequent,
    the fix is more selective banding (more planes / more bands →
    smaller buckets), or a larger ``cap`` — not removing the cap."""
    wb = Window.partitionBy("bk")
    ranked = banded.withColumn("hub", F.min("id").over(wb)).withColumn(
        "rn", F.row_number().over(wb.orderBy("id"))
    )
    star = ranked.filter(F.col("id") != F.col("hub")).select(
        F.col("hub").alias("id_a"), F.col("id").alias("id_b")
    )
    capped = (
        ranked.filter(F.col("rn") <= cap)
        .groupBy("bk")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    allpairs = (
        capped.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.col("ids"),
                                lambda y: F.struct(
                                    x.alias("id_a"), y.alias("id_b")
                                ),
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )
    return allpairs.unionByName(star).distinct()


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from banded MinHash.

    Plan shape: one scan computing signatures → explode bands (fan-out
    n_bands) → self-join per (band, bucket) via groupBy-collect — the
    shuffle key is the band bucket, which is uniform unless many docs are
    near-identical (the pathological case is the answer itself).  Bucket
    member lists are capped to protect against degenerate buckets."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, text_col, ngram, n_hashes)
    banded = sig.select(
        "id", F.explode(lsh_band_keys("sig", n_bands, rows_per_band)).alias("bk")
    )
    return bucket_candidate_pairs(banded)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle (or restricted to
    ``candidates`` (id_a, id_b)).  Integer arithmetic throughout:
    intersection from the shingle self-join, union = |A| + |B| − |I|.

    Scale shape: explode to (shingle, id) — shuffle keyed by shingle.
    When ``candidates`` is None the self-join is frequency-capped:
    shingles appearing in more than ``max_df`` documents are dropped
    BEFORE the join (broadcast anti-join — the hot-shingle list is small
    by definition, ≤ |shingle rows| / max_df entries), so one stop-word
    shingle shared by 10^6 docs cannot emit ~10^12 pairs.  Both the
    intersection AND the per-doc sizes are computed on the filtered
    shingle universe, so ``jaccard`` remains a true Jaccard of the
    capped sets (self-consistent, not an undercounted numerator over a
    full-set denominator).  Pass ``max_df=None`` for the uncapped exact
    semantics (safe only on bounded corpora); with ``candidates`` the
    shingle set is pruned to candidate docs instead and no cap applies."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("shingle"),
    ).distinct()
    if candidates is None and max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    if candidates is not None:
        # prune shingles to candidate docs BEFORE the self-join — the
        # semi-join on (id_a, id_b) after the join cannot be pushed below
        # it by Catalyst, so without this the shingle self-join runs over
        # the whole corpus even for a handful of candidate pairs
        cand_ids = (
            candidates.select(F.col("id_a").alias("id"))
            .unionByName(candidates.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sh = sh.join(cand_ids, "id", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .withColumn("jaccard", F.col("n_inter") / F.col("n_union"))
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out.select("id_a", "id_b", "n_inter", "n_union", "jaccard")


# ---------------------------------------------------------------------------
# SimHash (Arrow-vectorized)
# ---------------------------------------------------------------------------


def _simhash64_fn(words_col: pd.Series) -> pd.Series:
    """64-bit SimHash per row from a word array, numpy-vectorized over the
    batch: hash each word (FNV-1a over bytes, vectorized per unique word),
    accumulate ±1 per bit, take signs.  No per-row Python loops over
    words — unique-word hashing is amortized across the batch."""
    # build vocabulary of the batch once
    uniq: dict[str, int] = {}
    rows: list[np.ndarray] = []
    for arr in words_col:
        if arr is None:
            rows.append(np.empty(0, dtype=np.int64))
            continue
        idx = np.empty(len(arr), dtype=np.int64)
        for j, w in enumerate(arr):
            h = uniq.get(w)
            if h is None:
                h = len(uniq)
                uniq[w] = h
            idx[j] = h
        rows.append(idx)
    if uniq:
        # vectorized 64-bit hash of the unique words (blake2b 8-byte)
        import hashlib

        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
                for w in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        ) * 2 - 1  # (n_uniq, 64) in {-1, +1}
    out = np.zeros(len(words_col), dtype=np.uint64)
    for i, idx in enumerate(rows):
        if len(idx):
            acc = bits[idx].sum(axis=0)  # (64,)
            out[i] = np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(
                np.uint64
            )[0]
    res = pd.Series(out.astype(np.int64))
    # NULL word array -> NULL signature, matching the portable tier
    # (which drops NULL-text docs at the explode): the zeros default
    # would give every NULL-text doc the SAME signature 0 and pair them
    # all as near-duplicates
    null_rows = [i for i, arr in enumerate(words_col) if arr is None]
    if null_rows:
        res = res.astype(object)
        res.iloc[null_rows] = None
    return res


def simhash64(col: Column) -> Column:
    """Lazy pandas-UDF wrapper (type parsing needs a live session)."""
    return pandas_udf(_simhash64_fn, "long")(col)


def simhash_band_bits(
    corpus_size: int,
    sig_bits: int = 64,
    ladder: tuple[int, ...] = (16, 32),
    collisions_per_doc: float = 1.0,
) -> int:
    """Scale-adaptive band width: the smallest ladder step whose expected
    BIRTHDAY collisions stay linear in the corpus.  Uniformly-hashed
    band values collide at ~n²/2^(bits+1) accidental pairs per band;
    summed over the sig_bits//bits bands this must stay
    <= collisions_per_doc·n.  A FIXED width is quadratic in corpus size
    — the legacy 16-bit default emits ~42M accidental candidate pairs at
    1M docs (measured, BENCH/DEDUP_1M.md); the break-even for 16-bit
    bands is n = 2^15 docs.  Wider bands trade recall: with 32-bit bands
    (two of them) a Hamming-1 difference is always caught, Hamming-k
    (k >= 2) only when every flipped bit lands in one half.  Beyond
    ~2^33 docs even the widest step saturates — pre-shard the corpus
    (e.g. dedup within source) at that scale."""
    for bits in ladder:
        n_bands = max(1, sig_bits // bits)
        expected = n_bands * corpus_size * (corpus_size - 1) / 2.0 / float(2**bits)
        if expected <= collisions_per_doc * corpus_size:
            return bits
    return ladder[-1]


def _resolve_band_bits(
    df: DataFrame,
    band_bits: int | None,
    corpus_size_hint: int | None,
    sig_bits: int,
    ladder: tuple[int, ...],
) -> int:
    """band_bits if given; else adaptive from the hint; else adaptive
    from a one-time COUNT of ``df``.

    Callers pass the CACHED signature table as ``df``, not the raw
    input: the count then doubles as the cache materialization, so the
    upstream plan (which may be an arbitrary derived pipeline — filters,
    UDF normalization, a JDBC read) executes exactly once per call even
    on the no-hint default path, instead of once for the count and again
    for the dedup job."""
    if band_bits is not None:
        return band_bits
    n = corpus_size_hint if corpus_size_hint is not None else df.count()
    return simhash_band_bits(int(n), sig_bits=sig_bits, ladder=ladder)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    band_bits: int | None = None,
    corpus_size_hint: int | None = None,
) -> DataFrame:
    """Near-dup candidates = docs sharing any of the 64/band_bits simhash
    bands (detects Hamming distance < 64/band_bits differences).  Returns
    (id_a, id_b, simhash_a, simhash_b) pairs.

    ``band_bits`` defaults to the scale-adaptive selection
    (simhash_band_bits) from ``corpus_size_hint`` — or, with no hint,
    from a one-time count of ``df`` — so default arguments stay
    linear-candidate-set at any corpus size instead of inheriting a
    width tuned for small corpora."""
    # signatures are reused three times (banding + two join-backs);
    # cache the (id, simhash) table — 16 bytes/doc, the standard LSH
    # signature-store pattern — instead of recomputing the UDF per use
    sh = _cache_signatures("simhash64", df.select(
        F.col(id_col).alias("id"),
        simhash64(words(F.col(text_col))).alias("simhash"),
    ).filter(F.col("simhash").isNotNull()))  # NULL text has no signature
    # resolve AFTER caching: the no-hint count runs on sh, warming the
    # same cache the banding reads — upstream executes exactly once
    band_bits = _resolve_band_bits(
        sh, band_bits, corpus_size_hint, sig_bits=64, ladder=(16, 32)
    )
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits).bitwiseAND(mask).alias("v"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    )
    # Capped hub-spoke pairing (shared with MinHash-LSH): a degenerate
    # band bucket of k identical docs emits O(k) rows, not k².
    pairs = bucket_candidate_pairs(banded)
    return (
        pairs.join(
            sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("simhash_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("simhash_b")),
            "id_b",
        )
        .select("id_a", "id_b", "simhash_a", "simhash_b")
    )


# ---------------------------------------------------------------------------
# Portable MinHash (oracle-verifiable tier)
# ---------------------------------------------------------------------------

# The portable tier hashes shingles with md5 (int(md5(g)[:8], 16)), so
# every value — including band keys — is reproducible by the DuckDB
# oracle (see entry_queries._minhash_oracle_sql, generated from the
# same MH_COEFFS).


def portable_minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs from banded portable MinHash signatures
    (8 hashes, `n_bands` bands of 8/n_bands rows): (id_a, id_b) sharing
    at least one band.  Same plan shape as minhash_lsh_candidates —
    explode band keys, shuffle keyed by (band, key), self-join — but
    every value is reproducible by the DuckDB oracle."""
    rows = len(MH_COEFFS) // n_bands
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("g"),
    ).select(
        "id", F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long").alias("h")
    )
    sig = _min_sig_agg(sh, len(MH_COEFFS))
    return _portable_band_pairs(sig, n_bands, rows)


def _portable_band_pairs(sig: DataFrame, n_bands: int, rows: int) -> DataFrame:
    """(id_a, id_b) pairs sharing any band of a portable (id, sig)
    signature table — band key = '_'-joined decimal signature entries
    (exactly what the DuckDB oracle rebuilds with array_to_string).
    Shared by the text and token portable MinHash tiers."""
    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col("sig")[b * rows + r].cast("string")
                                for r in range(rows)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col("id").alias("id_a"), "band", "key")
    b = bands.select(F.col("id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Portable SimHash (oracle-verifiable tier)
# ---------------------------------------------------------------------------

#: 60-bit simhash: per-word hash = first 15 hex chars of md5 (DuckDB can
#: reproduce via CAST('0x'||substring(md5(w),1,15) AS BIGINT)); 60 bits
#: keep every intermediate inside int64 on both engines.
PORTABLE_SIMHASH_BITS = 60


def _portable_word_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash) — md5-based 60-bit SimHash over word occurrences
    (occurrence-weighted, matching the Arrow tier's convention): explode
    words → 60 conditional-sum aggregates per doc (one shuffle, map-side
    partial agg, all codegen) → bit assembly.  Every step is exact
    integer arithmetic reproducible by a SQL oracle."""
    wh = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("w"),
    ).select("id", _portable_word_hash(F.col("w")).alias("h"))
    # string expressions, not Column builders: 60 nested builder trees
    # cost hundreds of py4j round trips per plan build (~1 s of driver
    # latency); one parse call per expression keeps plan construction
    # cheap.  ((h>>b)&1)*2-1 == the oracle's CASE WHEN bit=1 THEN 1
    # ELSE -1, and the boolean-cast shift == its CASE WHEN sum>0 THEN 2^b.
    aggs = [
        F.expr(f"sum(((h >> {b}) & 1) * 2 - 1) AS b{b}")
        for b in range(PORTABLE_SIMHASH_BITS)
    ]
    sums = wh.groupBy("id").agg(*aggs)
    assemble = " + ".join(
        f"(CAST(b{b} > 0 AS BIGINT) << {b})"
        for b in range(PORTABLE_SIMHASH_BITS)
    )
    return sums.selectExpr("id", f"({assemble}) AS simhash")


def portable_simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    band_bits: int | None = None,
    corpus_size_hint: int | None = None,
) -> DataFrame:
    """Near-dup candidates from the portable 60-bit SimHash: docs sharing
    any of the 60/band_bits bands, paired through the capped hub-spoke
    generator.  (id_a, id_b, simhash_a, simhash_b), oracle-verifiable
    value for value.  ``band_bits`` defaults to the scale-adaptive
    selection over the 60-bit divisor ladder (15/20/30 → 4/3/2 bands) —
    oracle callers pin it explicitly so SQL twins stay band-for-band
    reproducible."""
    # cache: the 60-aggregate signature subplan would otherwise run
    # three times (banding + two join-backs)
    sh = _cache_signatures(
        "portable_simhash", portable_simhash_signatures(df, id_col, text_col)
    )
    # resolve AFTER caching: the no-hint count runs on sh, warming the
    # same cache the banding reads — upstream executes exactly once
    band_bits = _resolve_band_bits(
        sh, band_bits, corpus_size_hint,
        sig_bits=PORTABLE_SIMHASH_BITS, ladder=(15, 20, 30),
    )
    n_bands = PORTABLE_SIMHASH_BITS // band_bits
    mask = (1 << band_bits) - 1
    banded = sh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(mask)
                        .alias("v"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    )
    pairs = bucket_candidate_pairs(banded)
    return (
        pairs.join(
            sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("simhash_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("simhash_b")),
            "id_b",
        )
        .select("id_a", "id_b", "simhash_a", "simhash_b")
    )
