"""Embedding-column hygiene: per-row violations and a one-row profile
for an ``array<float>`` vector column.

The validation-tier cousin of the token-payload checks
(SequencesCompleteness / TokenInvariants, checks/core.py) applied to
the OTHER payload this engine curates — the embedding table behind the
ANN / semantic-dedup operators (operators/similarity.py).  Reference
kin: the per-column null/blank sweeps (BlankNulls.pm:62-66) and the
per-row invariant machinery (Test/DataCheck.pm:283-365) — here the
"row invariant" is vector well-formedness: present, non-empty,
dimension-consistent, finite, non-degenerate.

A single malformed vector poisons every downstream consumer silently:
one NaN element makes every cosine against that row NaN (ranked last
or first depending on the sort's NULL/NaN ordering — either way
wrongly), a zero vector divides by zero in cosine normalization, and a
dimension mismatch crashes a batched matmul only when the mismatched
row finally lands in a batch — at 10^12 rows, hours into the job.
These checks fail FAST and name the rows.

Everything is JVM-side higher-order functions over the array — no
Python, no explode (the per-row flags are O(dim) codegen loops inside
one projection), no shuffle for the violation scan at all.  The
profile is one partial-aggregated pass plus an at-most-``n_dims``-row
argmax for the modal dimension.

All outputs are integer counts / flags (oracle-bit-exact); the only
floats compared anywhere are against the caller's own band bounds, on
squared norms summed in DOUBLE in array order (deterministic
left-fold in both Spark's ``aggregate`` and DuckDB's ``list_sum``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_violations", "embedding_profile"]

#: violation kinds, in severity order
VEC_NULL = "vec_null"
VEC_EMPTY = "vec_empty"
DIM_MISMATCH = "dim_mismatch"
HAS_NAN = "has_nan"
HAS_INF = "has_inf"
ZERO_VECTOR = "zero_vector"
NORM_OUT_OF_BAND = "norm_out_of_band"


def _sq_norm(vec):
    """Σ x² as a deterministic left-fold in array order, each element
    promoted to DOUBLE before the multiply — the same sequence of IEEE
    ops any engine's ordered list-fold performs, so band classification
    is reproducible bit-for-bit."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def embedding_violations(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
    norm_band: tuple[float, float] | None = None,
) -> DataFrame:
    """Violation rows for a vector column: ``(id, violation, dim)``,
    one row per (row, breached rule); clean rows emit nothing, so the
    result is violation-sized, never table-sized.

    Rules, in the order a row short-circuits them:

    * ``vec_null``    — column is NULL;
    * ``vec_empty``   — zero elements;
    * ``dim_mismatch``— ``size != expected_dim`` (only when
      ``expected_dim`` is given; corpus-level dimension consistency
      without a declared dim is ``embedding_profile().n_dims == 1``);
    * ``has_nan`` / ``has_inf`` — any non-finite element (NaN cosine
      poison / overflow escapes);
    * ``zero_vector`` — every element exactly 0.0 (cosine
      divide-by-zero; exact comparison, no epsilon — a denormal is NOT
      a zero vector);
    * ``norm_out_of_band`` — squared L2 norm outside
      ``[lo*lo, hi*hi]`` for ``norm_band=(lo, hi)`` (only when given;
      compared on SQUARED norms so no sqrt enters the plan).  NaN/Inf
      rows are excluded from the band rule — they already failed their
      own rule and a NaN comparison would silently drop or double-count
      them depending on the engine's NaN ordering.

    Scale: one projection + one ``filter``-HOF + ``explode`` of an
    at-most-7-element literal struct array — per-partition codegen, no
    shuffle, no Python.  At 10^12 rows this is a pure map over the
    scan, and with parquet the reader prunes to (id, vec) columns.
    """
    vec = F.col(vec_col)
    dim = F.size(vec).cast("long")
    has_nan = F.exists(vec, lambda x: F.isnan(x))
    has_inf = F.exists(
        vec, lambda x: (x == F.lit(float("inf"))) | (x == F.lit(float("-inf")))
    )
    finite = ~has_nan & ~has_inf

    rules = [
        (VEC_NULL, vec.isNull()),
        (VEC_EMPTY, vec.isNotNull() & (dim == 0)),
    ]
    if expected_dim is not None:
        rules.append(
            (DIM_MISMATCH, vec.isNotNull() & (dim > 0) & (dim != int(expected_dim)))
        )
    rules += [
        (HAS_NAN, vec.isNotNull() & has_nan),
        (HAS_INF, vec.isNotNull() & has_inf),
        (
            ZERO_VECTOR,
            vec.isNotNull()
            & (dim > 0)
            & finite
            & F.forall(vec, lambda x: x == F.lit(0.0)),
        ),
    ]
    if norm_band is not None:
        lo, hi = float(norm_band[0]), float(norm_band[1])
        sq = _sq_norm(vec)
        rules.append(
            (
                NORM_OUT_OF_BAND,
                vec.isNotNull()
                & (dim > 0)
                & finite
                & ((sq < lo * lo) | (sq > hi * hi)),
            )
        )

    flags = F.array(
        *[
            F.struct(F.lit(name).alias("violation"), cond.alias("active"))
            for name, cond in rules
        ]
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.when(vec.isNull(), F.lit(None).cast("long"))
            .otherwise(dim)
            .alias("dim"),
            F.filter(flags, lambda f: f["active"]).alias("__hits"),
        )
        .filter(F.size("__hits") > 0)
        .select("id", F.explode("__hits").alias("__hit"), "dim")
        .select("id", F.col("__hit")["violation"].alias("violation"), "dim")
    )


def embedding_profile(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """One-row corpus profile of the vector column — the aggregate face
    of the same rules (all BIGINT, oracle-bit-exact):

    * ``n_rows`` / ``n_null`` / ``n_empty`` — presence counts;
    * ``n_nan`` / ``n_inf`` / ``n_zero_vec`` — degenerate-payload rows;
    * ``n_dims``   — distinct dimensionalities among non-empty vectors
      (1 ⇔ the corpus is dimension-consistent);
    * ``modal_dim`` / ``modal_dim_rows`` — the plurality dimension and
      its row count (ties break to the SMALLEST dim, pinned so any
      engine agrees); NULL/0 when no non-empty vectors exist.

    Two aggregation stages, both vocabulary-of-dims-bounded after the
    map-side combine: a groupBy(dim) over the scan (≤ a handful of
    distinct dims in any sane corpus), then a single-row fold.  The
    flag counts ride the same first stage, so the table is read ONCE.
    """
    vec = F.col(vec_col)
    dim = F.size(vec).cast("long")
    has_nan = F.exists(vec, lambda x: F.isnan(x))
    has_inf = F.exists(
        vec, lambda x: (x == F.lit(float("inf"))) | (x == F.lit(float("-inf")))
    )
    per_dim = (
        df.select(
            # NULL vec -> dim NULL (its own bucket); empty -> 0
            F.when(vec.isNull(), F.lit(None).cast("long"))
            .otherwise(dim)
            .alias("__dim"),
            F.when(vec.isNull(), 1).otherwise(0).alias("__null"),
            F.when(vec.isNotNull() & (dim == 0), 1).otherwise(0).alias("__empty"),
            F.when(vec.isNotNull() & has_nan, 1).otherwise(0).alias("__nan"),
            F.when(vec.isNotNull() & has_inf, 1).otherwise(0).alias("__inf"),
            F.when(
                vec.isNotNull()
                & (dim > 0)
                & ~has_nan
                & ~has_inf
                & F.forall(vec, lambda x: x == F.lit(0.0)),
                1,
            )
            .otherwise(0)
            .alias("__zero"),
        )
        .groupBy("__dim")
        .agg(
            F.count(F.lit(1)).alias("__rows"),
            F.sum("__null").alias("__null"),
            F.sum("__empty").alias("__empty"),
            F.sum("__nan").alias("__nan"),
            F.sum("__inf").alias("__inf"),
            F.sum("__zero").alias("__zero"),
        )
    )
    real = F.col("__dim").isNotNull() & (F.col("__dim") > 0)
    # modal dim via an ordered struct-max: (rows, -dim) lexicographic —
    # ties on rows resolve to the smallest dim in every engine
    modal = F.max(
        F.when(
            real,
            F.struct(
                F.col("__rows").alias("r"), (-F.col("__dim")).alias("nd")
            ),
        )
    )
    zero = F.lit(0)
    return per_dim.agg(
        F.coalesce(F.sum("__rows"), zero).cast("long").alias("n_rows"),
        F.coalesce(F.sum("__null"), zero).cast("long").alias("n_null"),
        F.coalesce(F.sum("__empty"), zero).cast("long").alias("n_empty"),
        F.coalesce(F.sum("__nan"), zero).cast("long").alias("n_nan"),
        F.coalesce(F.sum("__inf"), zero).cast("long").alias("n_inf"),
        F.coalesce(F.sum("__zero"), zero).cast("long").alias("n_zero_vec"),
        F.count_distinct(F.when(real, F.col("__dim"))).cast("long").alias(
            "n_dims"
        ),
        modal.alias("__modal"),
    ).select(
        "n_rows",
        "n_null",
        "n_empty",
        "n_nan",
        "n_inf",
        "n_zero_vec",
        "n_dims",
        (-F.col("__modal")["nd"]).cast("long").alias("modal_dim"),
        F.col("__modal")["r"].cast("long").alias("modal_dim_rows"),
    )
