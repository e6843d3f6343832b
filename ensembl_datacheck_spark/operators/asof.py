"""As-of (most-recent-match) join — an operator Spark's join surface
lacks, built as a composition of existing DataFrame ops (union + one
sorted window pass), per the custom-operator policy: no UDF, no
iteration.

For every left row, attach the latest right row of the same `by` key
whose timestamp is ≤ (or <, when ``strict``) the left timestamp,
optionally within a `tolerance` horizon — the standard
training-pipeline primitive for joining events to the most recent
snapshot/label (and the reference's closest kin is the ordered
adjacent-row scan, ExonBounds.pm:124-169, S13).

Plan shape & scale: both inputs shuffle ONCE on the `by` key, the
window sorts within each key partition, and the match is a running
`last(ignorenulls)` — equivalent work to a sort-merge join, no
per-left-row probing, no range-explosion.  Skewed keys are the same
hazard as any keyed window (salt upstream if one user owns the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = False,
    tolerance: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join.  Unmatched left rows keep nulls (left-outer
    semantics).  Right-side ties on (key, ts) are resolved by the
    largest right-value struct (deterministic); pre-deduplicate the
    right side if a different rule is needed.

    tolerance: SQL interval body, e.g. ``"1 hour"`` — matches older
    than left_ts − tolerance are nulled out.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(by) | {right_ts}
    ]
    # at equal timestamps a non-strict join sees the right row (right
    # sorts first), a strict join does not (right sorts last)
    l_side, r_side = (1, 0) if not strict else (0, 1)

    lv = F.struct(*[F.col(c) for c in left.columns])
    rv = F.struct(
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    lv_type = left.select(lv.alias("v")).schema[0].dataType
    rv_type = right.select(rv.alias("v")).schema[0].dataType

    l2 = left.select(
        *by,
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(l_side).alias("__side"),
        lv.alias("__lv"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    # a NULL right timestamp would sort first (Spark asc = NULLS FIRST)
    # and masquerade as an "earliest" match; likewise Spark windows group
    # NULL partition keys together, so a NULL-`by`-key right row would
    # match NULL-key left rows — but the oracle (DuckDB ASOF JOIN with an
    # equi-condition, pandas merge_asof) never matches NULL on either the
    # key or the timestamp.  Drop such right rows up front.
    r_clean = right.filter(F.col(right_ts).isNotNull())
    for k in by:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    r2 = r_clean.select(
        *by,
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(lv_type).alias("__lv"),
        rv.alias("__rv"),
    )
    # deterministic tie-break among right rows sharing a timestamp: order
    # by the ORDERABLE subset of the right struct's fields — a MapType
    # field anywhere in __rv used to fail window analysis outright
    # ('expression cannot be used in order specification') even though
    # the caller never asked for map-based tie-breaking.  With all fields
    # orderable this equals ordering by __rv itself (struct comparison is
    # field-by-field in declaration order).
    def _orderable(dt):
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    ord_fields = [f.name for f in rv_type.fields if _orderable(f.dataType)]
    tie = (
        F.struct(*[F.col(f"__rv.{f}") for f in ord_fields])
        if ord_fields
        else F.lit(0)
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t"), F.col("__side"), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__lv").isNotNull())
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.__rts")
                >= F.col("__t") - F.expr(f"INTERVAL {tolerance}"),
                F.col("__m"),
            ),
        )
    taken = set(left.columns)
    out_cols = [F.col(f"__lv.{c}").alias(c) for c in left.columns]
    for c in right_cols:
        name = c if c not in taken else f"{c}{suffix}"
        out_cols.append(F.col(f"__m.{c}").alias(name))
    return matched.select(*out_cols)
