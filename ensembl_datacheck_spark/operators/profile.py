"""One-scan shared fact-table profile for the aggregate check family.

The reference runs one SQL statement per check (DbCheck.pm's per-check
dba handle — every CompareBiotypeGroup / CheckTableSizes-style check
issues its own GROUP BY over the fact table).  The fused row scan
(operators/fused.py) already collapses the *row-predicate* checks into
one pass; this module does the same for the *aggregate* checks
(RowTotals, SourceDrift, NTokDrift, NTokQuantileDrift, SequencesStats,
SourcesUsed), which otherwise each issue an independent full scan of
the 10^12-row table — five redundant scans per suite run.

Design: ONE `groupBy(source, n_tok)` aggregation — the minimal
sufficient statistic for the whole family — NOT a grouping-sets /
CUBE plan.  Grouping sets expand every input row once per grouping set
(Spark's Expand operator: 4 sets = 4x the scanned rows through the
partial aggregate), whereas the composite-key cube is a single
map-side-combinable hash aggregation whose per-partition state is
bounded by |sources| x |n_tok domain| (~10 x 8192 here — NTokDomain
bounds n_tok to [1, 8192]).  Every family member is then a trivial
re-aggregation of the ~80k-row cube:

  * global row count / null counts / n_tok min-max  -> SequencesStats,
    RowTotals
  * per-source counts  (sum n over source)          -> SourceDrift,
    SourcesUsed (reverse FK: which sources appear)
  * per-bin counts     (sum n over floor(log2))     -> NTokDrift
  * per-value counts   (sum n over n_tok)           -> NTokQuantileDrift
    (its LIMIT-bounded driver collect guard is unchanged)

Skew: the composite (source, n_tok) key is strictly more uniform than
either key alone — a hot source spreads over its n_tok values, a hot
n_tok over sources — so the single shuffle this plan performs is safer
than the per-check shuffles it replaces.

Degenerate input: an unbounded/corrupt n_tok column makes the cube
large but it stays DISTRIBUTED (the materialization is a recomputable
persist(MEMORY_AND_DISK), never a driver collect); the only driver transfers
are the derived aggregates, and the quantile consumer keeps its
LIMIT-bounded cardinality guard.

The cube is memoized per Runner run via plans/runner.SharedComputations
(checks/core._shared_fact_profile): under --parallelism the first
aggregate check to ask runs the scan while its co-consumers block on
that key only; standalone run_check callers get a private instance and
pay one scan themselves — today's per-check cost, no sharing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: profile column names (the cube's contract with its consumers)
SRC, NTOK, N = "source", "n_tok", "n"


def fact_profile(
    df: DataFrame,
    source_col: str = "source",
    ntok_col: str = "n_tok",
    null_count_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(source, n_tok, n, <col>_nulls...) — one full-table scan, one
    map-side-combinable hash aggregation.  NULL source / n_tok rows form
    their own groups (group keys), so their counts are recoverable; the
    extra ``null_count_cols`` (non-key columns) ride as SUM(isNull)
    aggregates in the same pass."""
    aggs: list[Column] = [F.count(F.lit(1)).alias(N)]
    for c in null_count_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
    return df.groupBy(
        F.col(source_col).alias(SRC), F.col(ntok_col).alias(NTOK)
    ).agg(*aggs)


def profile_global(
    prof: DataFrame, null_count_cols: tuple[str, ...] = ("doc_id",)
) -> dict:
    """Single global stats row derived from the cube: n_rows, per-column
    null counts (key columns from their NULL groups, ride-along columns
    from their summed flags), n_tok min/max.  Empty table -> zeros/Nones
    (an aggregate over an empty cube still yields one row)."""
    aggs = [
        F.coalesce(F.sum(N), F.lit(0)).alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col(SRC).isNull(), F.col(N))), F.lit(0)
        ).alias(f"{SRC}__n_null"),
        F.coalesce(
            F.sum(F.when(F.col(NTOK).isNull(), F.col(N))), F.lit(0)
        ).alias(f"{NTOK}__n_null"),
        F.min(NTOK).alias(f"{NTOK}__min"),
        F.max(NTOK).alias(f"{NTOK}__max"),
    ]
    for c in null_count_cols:
        aggs.append(F.coalesce(F.sum(f"{c}_nulls"), F.lit(0)).alias(f"{c}__n_null"))
    return prof.agg(*aggs).collect()[0].asDict()


def profile_source_counts(prof: DataFrame) -> DataFrame:
    """(source, count) — identical to fact.groupBy(source).count()
    (NULL source kept as a group, exactly as groupBy would)."""
    return prof.groupBy(SRC).agg(F.sum(N).alias("count"))


def profile_ntok_hist(prof: DataFrame, bin_expr: Column, name: str = "bin") -> DataFrame:
    """(bin, count) histogram over NON-NULL n_tok — identical to
    drift.build_histogram(fact.filter(n_tok.isNotNull()), bin_expr).
    The NULL-group filter runs BEFORE binning: bin expressions like
    floor(log2(greatest(x, 1))) would otherwise fold NULL into bin 0
    (greatest skips NULLs)."""
    return (
        prof.filter(F.col(NTOK).isNotNull())
        .groupBy(bin_expr.alias(name))
        .agg(F.sum(N).alias("count"))
    )


def profile_ntok_counts(prof: DataFrame) -> DataFrame:
    """(n_tok, cnt) value-frequency rows over non-null n_tok — the
    NTokQuantileDrift exact-tier probe input (its LIMIT-bounded collect
    guard applies downstream, unchanged)."""
    return (
        prof.filter(F.col(NTOK).isNotNull())
        .groupBy(NTOK)
        .agg(F.sum(N).alias("cnt"))
    )
